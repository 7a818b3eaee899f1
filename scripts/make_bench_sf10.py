#!/usr/bin/env python3
"""Assemble BENCH_sf10.json from three ScaleProbe legs (r11 — the r9/r10
version was hand-assembled; this makes the 100x probe regeneration
mechanical so it cannot silently go stale again).

Usage: make_bench_sf10.py <probe_sf01.json> <probe_sf1.json> <probe_sf10.json> <round> [out]

Carries highlights/adjudications/r7_carried_probes forward from the
existing artifact; recomputes totals, per-leg maps (short ids), and the
vs_prev note inputs.
"""
import sys, json, datetime


def short(name):
    return name.split("_")[0]


def main():
    p01, p1, p10 = (json.load(open(p)) for p in sys.argv[1:4])
    rnd = int(sys.argv[4])
    out_path = sys.argv[5] if len(sys.argv) > 5 else "BENCH_sf10.json"
    prev = json.load(open(out_path))
    legs = {
        "sf0.1": {short(k): v for k, v in p01["queries"].items()},
        "sf1": {short(k): v for k, v in p1["queries"].items()},
        "sf10": {short(k): v for k, v in p10["queries"].items()},
    }
    # Two probe queries sharing a short-id prefix would silently collapse
    # into one legs_sec entry, corrupting every total (ADVICE r11).
    for leg_name, probe in (("sf0.1", p01), ("sf1", p1), ("sf10", p10)):
        assert len(legs[leg_name]) == len(probe["queries"]), \
            f"short-id collision in {leg_name} leg: {sorted(probe['queries'])}"
    t01 = sum(legs["sf0.1"].values())
    t1 = sum(legs["sf1"].values())
    t10 = sum(legs["sf10"].values())
    totals = {
        "sf0.1_sec": round(t01, 2),
        "sf1_sec": round(t1, 2),
        "sf10_sec": round(t10, 2),
        "ratio_per_10x_leg": round((t10 / t01) ** 0.5, 2),
        "ratio_100x": round(t10 / t01, 2),
    }
    prev_round = prev.get("round")
    prev_totals = prev.get("totals", {})
    out = {
        "round": rnd,
        "date": datetime.date.today().isoformat(),
        "factor": 100,
        "method": prev["method"].replace(f"at r{prev_round} HEAD", f"at r{rnd} HEAD"),
        # (stale-stamp guard below, after `out` is built)
        "probe_queries": len(legs["sf0.1"]),
        "totals": totals,
        f"vs_r{prev_round}": {
            "note": (f"same protocol at r{prev_round} HEAD measured ratio_100x "
                     f"{prev_totals.get('ratio_100x')} (sf10 {prev_totals.get('sf10_sec')}s); "
                     f"this r{rnd} rerun lands at {totals['ratio_100x']} "
                     f"(sf10 {totals['sf10_sec']}s)")
        },
        "legs_sec": legs,
        "ratios_100x": {
            k: round(legs["sf10"][k] / legs["sf0.1"][k], 1)
            for k in sorted(legs["sf0.1"]) if legs["sf0.1"][k] > 0.001 and k in legs["sf10"]
        },
        "highlights": prev.get("highlights", {}),
        "adjudications": prev.get("adjudications", {}),
        "r7_carried_probes": prev.get("r7_carried_probes", {}),
    }
    # The replace() above silently no-ops if the stored method string
    # drifted from the "at rN HEAD" phrasing, leaving a stale round stamp
    # in a freshly regenerated artifact (ADVICE r11).
    if prev_round != rnd:
        assert out["method"] != prev["method"], \
            f"method string kept r{prev_round} stamp: {prev['method']!r}"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {totals}")


if __name__ == "__main__":
    main()

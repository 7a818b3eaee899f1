#!/usr/bin/env python3
"""Merge two BENCH_DETAIL.json legs (sf0.1 + /tmp/sf1) into BENCH_sf1.json.

Usage: merge_bench.py <detail_sf01.json> <detail_sf1.json> <round> <out.json>

Short query ids, per-query 10x ratios, watch_items for ratios > 3 (carry
adjudications forward from the existing BENCH_sf1.json when the query is
already adjudicated there).
"""
import sys, json, os, datetime


def short(name):
    return name.split("_")[0]


def main():
    a_path, b_path, rnd, out_path = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa = {short(k): v for k, v in a["queries"].items() if v >= 0}
    qb = {short(k): v for k, v in b["queries"].items() if v >= 0}
    common = sorted(set(qa) & set(qb))
    ratios = {k: round(qb[k] / qa[k], 2) if qa[k] > 0.001 else None for k in common}
    prev_adj = {}
    if os.path.exists(out_path):
        try:
            for w in json.load(open(out_path)).get("watch_items", []):
                if w.get("adjudication"):
                    prev_adj[w["query"]] = w["adjudication"]
        except Exception:
            pass
    watch = [
        {"query": k, "ratio": ratios[k], "sf0.1_sec": qa[k], "sf1_sec": qb[k],
         "adjudication": prev_adj.get(k, "")}
        for k in common if ratios[k] is not None and ratios[k] > 3.0
    ]
    watch.sort(key=lambda w: -w["ratio"])
    out = {
        "round": int(rnd),
        "date": datetime.date.today().isoformat(),
        "factor": 10,
        "method": ("graft.tools.ScaleUp perturbed 10x replica of sf0.1 in /tmp/sf1; "
                   "graft.Bench min-of-3 after warmup, local[32], both legs "
                   "back-to-back in one quiet session; contention gate incl. the "
                   "absolute chunk-throughput canary (BENCH_CANARY.json)"),
        "totals": {
            "sf0.1_sec": round(sum(qa.values()), 3),
            "sf1_sec": round(sum(qb.values()), 3),
            "ratio_at_10x_data": round(sum(qb.values()) / max(sum(qa.values()), 1e-9), 2),
            "queries": len(common),
        },
        "env": {"sf0.1": a.get("env"), "sf1": b.get("env")},
        "sf0.1": qa, "sf1": qb, "ratios": ratios,
        "watch_items": watch,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {out['totals']}  watch={len(watch)}")
    for leg, env in (("sf0.1", a.get("env")), ("sf1", b.get("env"))):
        if env and env.get("contended"):
            print(f"WARNING: {leg} leg measured CONTENDED — rerun quiet", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Format an oracle_sweep.py result into a CORRECTNESS_sf{N}.json gate.

Usage: make_gate_json.py <sweepJson> <outJson> <round> <noteFile> [exclusionsJson] [adjudicatedJson]

The sweep carries per-query PASS/FAIL/TIMEOUT with rows and seconds; this
script adds the gate envelope (note, round, date, documented exclusions,
adjudicated mismatches) so regeneration is mechanical each round instead of
hand-assembled (r9, VERDICT r8 tasks 1/5). TIMEOUTs are kept as explicit
rows (pass=false, status=timeout) — a timed-out oracle is a coverage gap,
not a silent drop.
"""
import sys, json, datetime

def main():
    sweep_path, out_path, rnd, note_path = sys.argv[1:5]
    exclusions = json.loads(open(sys.argv[5]).read()) if len(sys.argv) > 5 else {}
    adjudicated = json.loads(open(sys.argv[6]).read()) if len(sys.argv) > 6 else {}
    sweep = json.load(open(sweep_path))
    results = {}
    failed = 0
    for name, r in sorted(sweep["results"].items()):
        if r["status"] == "PASS":
            results[name] = {"pass": True, "rows": r.get("rows"), "sec": r.get("sec")}
        else:
            ok = name in adjudicated
            if not ok:
                failed += 1
            results[name] = {"pass": ok, "status": r["status"].lower(),
                             "sec": r.get("sec")}
            if ok:
                results[name]["adjudicated"] = True
            detail = r.get("detail")
            if detail and not ok:
                results[name]["detail"] = detail[:500]
    gate = {
        "_note": open(note_path).read().strip(),
        "round": int(rnd),
        "date": datetime.date.today().isoformat(),
        "sf_dir": sweep["sf_dir"],
        "gate": "scripts/oracle_sweep.py -> oracle_check_strict.py (exact compare, per-query isolation)",
        "timeout_sec": sweep["timeout_sec"],
        "checked": len(results),
        "passed": sum(1 for v in results.values() if v["pass"]),
        "failed": failed,
        "adjudicated": adjudicated,
        "excluded": exclusions,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(gate, f, indent=1)
    print(f"{out_path}: {gate['passed']}/{gate['checked']} pass, "
          f"{failed} fail, excluded groups: {list(exclusions)}")

if __name__ == "__main__":
    main()

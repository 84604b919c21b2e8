#!/usr/bin/env python3
"""End-of-round closing check: bench_out.json vs BASELINE.md's actual rows.

Usage: python3 tools/flagcheck.py [--partial] [--cost NEW.json OLD.json]
       [bench_out.json ...] [BASELINE.md]

With --cost, the H18 per-query scan/shuffle ledgers (CostReport output,
one JSON line per query) are diffed round-over-round and structural
growth is flagged alongside the timing clauses; --cost alone (no bench
artifacts) runs just the ledger diff.

Several bench artifacts combine per-query as min-of-mins (the protocol
compares min-vs-min over >= 2 full runs); a trailing .md argument
overrides the baseline file. Artifacts must be the Bench-written
bench_out.json shape (with "queries"/"queries_min"); the driver's
BENCH_r*.json wrappers truncate the JSON line and are rejected with a
clear error. All artifacts must come from the same sf directory — mixing
scale factors would let a small-sf probe mask a real regression.

Round-9 verdict ("What's wrong" #1): the closing check claimed "zero
plan-attached flags" while BASELINE.md's own min-vs-min rule flagged two
queries — the comparison wasn't reading the baseline rows. This tool IS
that comparison, mechanically:

 - parses every markdown table row in BASELINE.md for (query, min) pairs;
   a query appearing in a LATER table supersedes its earlier row (the
   documented adjudication/supersession flow appends tables);
 - applies the two-clause rule verbatim: sub-second baselines are judged
   by ABSOLUTE delta (> 0.3 s), >= 1 s baselines by min-ratio (> 1.3x);
 - prints one verdict line per query (OK / FLAG / NEW / MISSING) and
   exits nonzero on any FLAG — or on MISSING coverage, because a subset
   run must not close a round (pass --partial for deliberate isolation
   runs, e.g. SPARK_GRAFT_BENCH_ONLY adjudications).

A FLAG here means: run the isolated-rerun protocol (SPARK_GRAFT_BENCH_ONLY)
and either clear it (episodic spike, clause 1 — record the adjudication in
PROGRESS.jsonl) or supersede the BASELINE.md row with the measured, named
cause. The round is not closeable with an unadjudicated FLAG.
"""
import json, re, sys

args = sys.argv[1:]
partial = "--partial" in args
args = [a for a in args if a != "--partial"]

# --cost NEW.json OLD.json — the H18 structural clause (round-17 verdict
# #3): wall-time noise on a loaded host can hide a plan regression that
# doubles scan volume, but the ledger's scan/shuffle counters are
# DETERMINISTIC for a fixed plan + sf, so a round-over-round diff of the
# committed cost_closing_r*.json artifacts catches what min-of-pair
# timing can't. Flags growth in scan_bytes / shuffle_bytes / scan_rows /
# shuffle_rows past ratio 1.5 with an absolute floor (1 MiB / 100k rows)
# so toy-sized jitter never trips it. result_rows changes are reported
# as info only — the hash gate owns semantics.
def cost_diff(new_path, old_path):
    def load(p):
        out = {}
        for line in open(p):
            line = line.strip()
            if line.startswith("{"):
                c = json.loads(line)
                out[c["query"]] = c
        return out
    new, old = load(new_path), load(old_path)
    flags = []
    for q in sorted(new):
        if q not in old:
            print(f"{q:32s} COST NEW (no prior ledger row)")
            continue
        flagged = False
        for key, floor in (("scan_bytes", 1 << 20), ("shuffle_bytes", 1 << 20),
                           ("scan_rows", 100_000), ("shuffle_rows", 100_000)):
            a, b = old[q].get(key, 0), new[q].get(key, 0)
            if b > a * 1.5 and b - a > floor:
                flagged = True
                print(f"{q:32s} COST FLAG {key} {a} -> {b} "
                      f"({b / max(a, 1):.2f}x) -> plan regressed")
        if flagged:
            flags.append(q)  # once per query, however many counters moved
        if new[q].get("result_rows") != old[q].get("result_rows"):
            print(f"{q:32s} COST INFO result_rows "
                  f"{old[q].get('result_rows')} -> {new[q].get('result_rows')}")
    for q in sorted(set(old) - set(new)):
        print(f"{q:32s} COST MISSING (in prior ledger, not in new)")
    return flags

cost_flags = []
if "--cost" in args:
    i = args.index("--cost")
    if len(args) < i + 3:
        sys.exit("--cost needs two operands: NEW.json OLD.json")
    cost_new, cost_old = args[i + 1], args[i + 2]
    args = args[:i] + args[i + 3:]
    cost_flags = cost_diff(cost_new, cost_old)
    # cost-only invocation: no bench artifacts left (a trailing
    # BASELINE.md alone is not a bench artifact — without this check it
    # silently fell through to a stale ./bench_out.json)
    if not [a for a in args if not a.endswith(".md")]:
        print(f"\ncost diff: {len(cost_flags)} flagged")
        sys.exit(1 if cost_flags else 0)

base_path = "BASELINE.md"
if args and args[-1].endswith(".md"):
    base_path = args.pop()
bench_paths = args or ["bench_out.json"]

NAME = re.compile(r"^[a-z][a-z0-9_]+$")
baseline = {}
for line in open(base_path):
    line = line.strip()
    if not (line.startswith("|") and line.endswith("|")):
        continue
    cells = [c.strip() for c in line.strip("|").split("|")]
    for a, b in zip(cells, cells[1:]):
        if NAME.match(a):
            try:
                baseline[a] = float(b)  # later tables supersede earlier rows
            except ValueError:
                pass

mins, sfs = {}, set()
for bp in bench_paths:
    bench = json.load(open(bp))
    # REQUIRE queries_min: the full bench_out.json always carries it,
    # while the compact stdout line (round 17) and the driver's
    # BENCH_r*.json wrappers don't — a fallback to "queries" would
    # silently accept a compact line whose map holds rounded MEDIANS of
    # only the top-40 queries and omits failures entirely
    per_q = bench.get("queries_min")
    if per_q is None:
        sys.exit(f"{bp}: no 'queries_min' key — not a full Bench "
                 "bench_out.json artifact (compact stdout lines and the "
                 "driver's BENCH_r*.json wrappers are not closeable "
                 "evidence; keep copies of bench_out.json)")
    sfs.add(bench.get("sf", "?"))
    for q, v in per_q.items():
        # a failed query (-1) must stay flagged even if another run passed
        prev = mins.get(q)
        mins[q] = min(prev, v) if prev is not None and prev >= 0 and v >= 0 \
            else (v if prev is None else -1.0)
if len(sfs) > 1:
    sys.exit(f"artifacts mix scale factors {sorted(sfs)} — min-of-mins "
             "across sf would mask regressions; compare one sf at a time")

flags, new, missing = [], [], []
print(f"sf basis: {next(iter(sfs))}")
print(f"{'query':32s} {'base':>6s} {'min':>6s}  verdict")
for q in sorted(set(mins) | set(baseline)):
    if q not in mins:
        missing.append(q)
        print(f"{q:32s} {baseline[q]:6.2f} {'-':>6s}  MISSING (in baseline, not benched)")
        continue
    m = mins[q]
    if m < 0:
        flags.append(q)
        print(f"{q:32s} {baseline.get(q, float('nan')):6.2f} {'FAIL':>6s}  FLAG (query failed)")
        continue
    if q not in baseline:
        new.append(q)
        print(f"{q:32s} {'-':>6s} {m:6.2f}  NEW (first min becomes the reference)")
        continue
    b = baseline[q]
    if b < 1.0:
        bad, why = m - b > 0.3, f"abs +{m - b:.2f}s"
    else:
        bad, why = m / b > 1.3, f"ratio {m / b:.2f}x"
    if bad:
        flags.append(q)
        print(f"{q:32s} {b:6.2f} {m:6.2f}  FLAG ({why}) -> isolate or supersede")
    else:
        print(f"{q:32s} {b:6.2f} {m:6.2f}  OK ({why})")

print(f"\n{len(mins)} benched, {len(flags)} flagged, {len(new)} new, "
      f"{len(missing)} missing"
      + (f", {len(cost_flags)} cost-flagged" if cost_flags else ""))
if flags:
    print("FLAGGED: " + ", ".join(flags))
if cost_flags:
    print("COST-FLAGGED: " + ", ".join(cost_flags))
if missing and not partial:
    print("MISSING coverage — a subset run cannot close a round "
          "(pass --partial for isolation runs)")
sys.exit(1 if flags or cost_flags or (missing and not partial) else 0)

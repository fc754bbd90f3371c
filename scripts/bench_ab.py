#!/usr/bin/env python3
"""Paired A/B bench analysis — the attributable-delta protocol.

Two modes:

1. In-session (same HEAD): `SPARK_GRAFT_BENCH_AB=1 sbt "runMain
   graft.Bench"` alternates labeled passes A,B,A,B,... in ONE JVM and
   writes bench_ab.json. Run `bench_ab.py bench_ab.json` to print the
   report. Same HEAD by construction, so every out-of-band query IS
   measured environment noise — the calibration artifact.

2. Cross-checkout (two HEADs): alternate single-pass invocations
   between two working trees —
       for i in 1 2 3; do
         (cd tree_a && SPARK_GRAFT_BENCH_PASSES=1 \
            SPARK_GRAFT_BENCH_OUT=/tmp/a$i.json sbt "runMain graft.Bench")
         (cd tree_b && SPARK_GRAFT_BENCH_PASSES=1 \
            SPARK_GRAFT_BENCH_OUT=/tmp/b$i.json sbt "runMain graft.Bench")
       done
       bench_ab.py --a /tmp/a1.json /tmp/a2.json /tmp/a3.json \
                   --b /tmp/b1.json /tmp/b2.json /tmp/b3.json
   The time-interleaving makes external CPU-contention drift hit both
   sides near-symmetrically, so a per-query delta is attributable to
   the code, not the hour it ran in.

A query is flagged only when side B's median falls outside side A's
observed band widened 10% (min*0.90, max*1.10) — the bench_compare.py
regression bar applied pairwise.
"""
import json
import sys


def load_line(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def report(per, rounds, sf):
    flagged = []
    for name in sorted(per):
        a, b = per[name]["a"], per[name]["b"]
        if any(v < 0 for v in a + b):
            flagged.append((name, "FAILED pass"))
            continue
        am = sorted(a)[len(a) // 2]
        bm = sorted(b)[len(b) // 2]
        if not (min(a) * 0.90 <= bm <= max(a) * 1.10):
            flagged.append(
                (name, f"B median {bm:.2f}s outside A band "
                       f"[{min(a):.2f}, {max(a):.2f}] (A median {am:.2f}s)"))
    # a query failed on EITHER side leaves BOTH totals — else the two
    # totals sum different query sets and the headline delta is skewed
    ok = [n for n in per
          if all(x >= 0 for x in per[n]["a"] + per[n]["b"])]
    atot = sum(sorted(per[n]["a"])[len(per[n]["a"]) // 2] for n in ok)
    btot = sum(sorted(per[n]["b"])[len(per[n]["b"]) // 2] for n in ok)
    # the totals cover the both-sides-ok subset — say so, or a reader
    # assumes the stated N (the silent-truncation pattern)
    print(f"A/B over {len(per)} queries ({len(ok)} paired into totals), "
          f"{rounds} rounds/side, sf={sf}")
    dtot = f"{(btot - atot) / atot * 100:+.1f}%" if atot > 0 else "n/a"
    print(f"side-A median total {atot:.1f}s  side-B {btot:.1f}s  ({dtot})")
    if flagged:
        print(f"\nOUT OF BAND ({len(flagged)}):")
        for n, why in flagged:
            print(f"  {n}: {why}")
    else:
        print("\nall queries inside the paired noise band")
    return len(flagged)


def main():
    args = sys.argv[1:]
    if "--a" in args:
        if "--b" not in args:
            sys.exit("usage: bench_ab.py --a A1.json [A2...] --b B1.json "
                     "[B2...]  (or: bench_ab.py bench_ab.json)")
        ia, ib = args.index("--a"), args.index("--b")
        if ia > ib:  # slicing [ia+1:ib] would silently produce wrong lists
            ia, ib = ib, ia
            a_files, b_files = args[ib + 1:], args[ia + 1:ib]
        else:
            a_files, b_files = args[ia + 1:ib], args[ib + 1:]
        if not a_files or not b_files:
            sys.exit("bench_ab.py: --a and --b each need at least one file")
        a_runs = [load_line(p)["queries"] for p in a_files]
        b_runs = [load_line(p)["queries"] for p in b_files]
        shared = set(a_runs[0])
        for r in a_runs + b_runs:
            shared &= set(r)
        per = {n: {"a": [r[n] for r in a_runs],
                   "b": [r[n] for r in b_runs]} for n in shared}
        sys.exit(1 if report(per, len(a_runs),
                             load_line(a_files[0]).get("sf", "?")) else 0)
    # in-session artifact
    d = load_line(args[0])
    per = {n: {"a": q["a"], "b": q["b"]} for n, q in d["queries"].items()}
    sys.exit(1 if report(per, d.get("rounds", 0), d.get("sf", "?")) else 0)


if __name__ == "__main__":
    main()

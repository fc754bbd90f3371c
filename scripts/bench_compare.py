#!/usr/bin/env python3
"""Round-over-round bench comparison that respects recorded variance.

Usage: python3 scripts/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json

Each detail file is a Bench full line (bench_out.json / BENCH_DETAIL_r*.json).
A query is flagged as a REGRESSION only when its new median exceeds the
old run's recorded max (its observed noise band) by >10% — median-vs-max
across bands, not single-shot-vs-single-shot, which round 11 showed is
unfalsifiable under bursty external CPU contention. Old files from
rounds <12 carry no "spread" map; for those the old median itself is the
band and the threshold loosens to 1.5x (the historical run-to-run noise).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oldq, newq = old.get("queries", {}), new.get("queries", {})
    olds = old.get("spread", {})
    news = new.get("spread", {})
    shared = sorted(set(oldq) & set(newq))
    regressions, improvements = [], []
    for q in shared:
        om, nm = oldq[q], newq[q]
        if om < 0 or nm < 0:
            continue
        band_hi = olds.get(q, {}).get("max", -1.0)
        if band_hi > 0:
            bar = band_hi * 1.10
        else:
            bar = om * 1.5
        if nm > bar:
            regressions.append((q, om, band_hi, nm))
        elif nm < om * 0.8:
            improvements.append((q, om, nm))
    ot = sum(v for v in (oldq[q] for q in shared) if v > 0)
    nt = sum(v for v in (newq[q] for q in shared) if v > 0)
    delta = f"({(nt - ot) / ot * 100:+.1f}%)" if ot > 0 else "(delta n/a)"
    print(f"shared queries: {len(shared)}  old total {ot:.1f}s  "
          f"new total {nt:.1f}s  {delta}")
    print(f"new-only queries: {sorted(set(newq) - set(oldq))}")
    if regressions:
        print(f"\nREGRESSIONS beyond recorded spread ({len(regressions)}):")
        for q, om, hi, nm in regressions:
            band = f"band<={hi:.2f}" if hi > 0 else "no band"
            print(f"  {q}: old median {om:.2f}s ({band}) -> new {nm:.2f}s")
    else:
        print("\nno regressions beyond recorded spread")
    if improvements:
        print(f"improved >20% ({len(improvements)}): " + ", ".join(
            f"{q} {om:.2f}->{nm:.2f}s" for q, om, nm in improvements))
    # spread sanity: widest noise bands in the new run
    wide = sorted(((q, s) for q, s in news.items()
                   if s.get("min", 0) > 0), key=lambda t: t[1]["max"] - t[1]["min"],
                  reverse=True)[:5]
    if wide:
        print("widest new noise bands: " + ", ".join(
            f"{q} [{s['min']:.2f},{s['max']:.2f}]" for q, s in wide))


if __name__ == "__main__":
    main()

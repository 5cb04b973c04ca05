#!/usr/bin/env python3
"""Per-query drift comparison between two bench artifacts.

The bench JSON truncates its `queries` map to the ~50 slowest, so the
comparison runs over the INTERSECTION of reported queries — exactly the
expensive tail where drift matters. Prints the overlap's per-query
ratios, the median ratio (the ambient-vs-regression discriminator: a
near-uniform shift is ambient, isolated outliers are regressions), and
every gate beyond the threshold.

Usage: bench_compare.py OLD.json NEW.json [ratio_threshold]
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no overlapping queries")
        return
    ratios = {k: nq[k] / oq[k] for k in common if oq[k] > 0}
    med = statistics.median(ratios.values())
    print(f"old total={old['value']}s load={old.get('load_avg')} | "
          f"new total={new['value']}s load={new.get('load_avg')}")
    print(f"overlap={len(ratios)} median_ratio={med:.3f}")
    outliers = {k: r for k, r in ratios.items() if r > thr * med}
    print(f"gates >{thr}x the median shift ({len(outliers)}):")
    for k, r in sorted(outliers.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x, "
              f"{r / med:.2f}x vs median)")
    improved = {k: r for k, r in ratios.items() if r < med / thr}
    print(f"gates improved >{thr}x vs the median shift ({len(improved)}):")
    for k, r in sorted(improved.items(), key=lambda kv: kv[1])[:10]:
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Pooled-floor cross-round bench compare (dev tool).

Usage: bench_compare.py NEW_JSON... -- OLD_JSON...

For each query present in both pools, takes the min (floor) across each
pool's runs and prints ratio stats (new/old) plus the worst regressors.
"""
import sys, json


def pool(paths):
    floors = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                src = d.get("floors") or d.get("queries") or {}
                for q, v in src.items():
                    if v is None:
                        continue
                    floors[q] = min(floors.get(q, float("inf")), v)
    return floors


def main():
    argv = sys.argv[1:]
    sep = argv.index("--")
    new, old = pool(argv[:sep]), pool(argv[sep + 1:])
    common = sorted(set(new) & set(old))
    ratios = sorted(((new[q] / old[q], q) for q in common if old[q] > 0))
    n = len(ratios)
    if n == 0:
        print("no common queries with nonzero old floors "
              f"(new={len(new)} old={len(old)} common={len(common)})")
        return
    med = ratios[n // 2][0] if n % 2 else (
        ratios[n // 2 - 1][0] + ratios[n // 2][0]) / 2
    print(f"common={n} median={med:.3f} "
          f"p90={ratios[int(n * 0.9)][0]:.3f} max={ratios[-1][0]:.3f}")
    print(f"new_total={sum(new[q] for q in common):.1f}s "
          f"old_total={sum(old[q] for q in common):.1f}s")
    print("worst:")
    for r, q in ratios[-8:][::-1]:
        print(f"  {q}: {r:.2f}x ({old[q]:.2f}s -> {new[q]:.2f}s)")
    print("best:")
    for r, q in ratios[:5]:
        print(f"  {q}: {r:.2f}x ({old[q]:.2f}s -> {new[q]:.2f}s)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines: per-query ratio table + medians.

Usage: compare_bench.py <base.json> <new.json> [--top N]

Built for scaling analysis (e.g. sf1 vs sf10: ratio == how the query's
wall time grew at 10x data) but works for any A/B (box drift, before/after
a plan change). Queries only in one file are listed separately.
(Driver-side tooling only — never imported by the engine.)
"""
import json, statistics, sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                d = json.loads(line)
                return d.get("value"), d["queries"]
    raise SystemExit(f"no bench JSON line in {path}")


def main(base_path, new_path, top):
    btot, base = load(base_path)
    ntot, new = load(new_path)
    common = sorted(set(base) & set(new))
    rows = [(q, base[q], new[q], new[q] / base[q] if base[q] > 0 else float("inf"))
            for q in common]
    rows.sort(key=lambda r: -r[3])
    print(f"total: {btot} -> {ntot} ({ntot/btot:.2f}x), "
          f"{len(common)} common queries, "
          f"median ratio {statistics.median(r[3] for r in rows):.2f}x")
    print(f"{'query':<28} {'base':>8} {'new':>8} {'ratio':>7}")
    for q, b, n, r in rows[:top]:
        print(f"{q:<28} {b:>8.2f} {n:>8.2f} {r:>6.2f}x")
    only_b = sorted(set(base) - set(new))
    only_n = sorted(set(new) - set(base))
    if only_b:
        print("only in base:", ",".join(only_b))
    if only_n:
        print("only in new:", ",".join(only_n))


if __name__ == "__main__":
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 1000
    main(sys.argv[1], sys.argv[2], top)

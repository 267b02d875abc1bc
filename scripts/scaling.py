#!/usr/bin/env python3
"""Per-query scaling table: two Bench JSON lines (small SF, big SF) ->
markdown table sorted by ratio, flagging super-linear queries.

Usage: python3 scripts/scaling.py <bench_small.json> <bench_big.json> <scale_mult>

Fixture-backed queries (media decode, web-ingest parsing, graph
fixtures) are sf-independent by construction; their ratio should be
~1x and they are listed separately.
"""
import json
import sys


def load(p):
    with open(p) as f:
        txt = f.read()
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no bench JSON with queries in {p}")


def main():
    small, big, mult = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    qs, qb = small["queries"], big["queries"]
    # quadratic-by-contract correctness baselines (tagged by Bench):
    # their super-linear growth is definitional, so the gate skips them
    baselines = set(small.get("baselines", [])) | set(big.get("baselines", []))
    rows = []
    for k in sorted(qs):
        if k in qb and qs[k] > 0:
            rows.append((k, qs[k], qb[k], qb[k] / qs[k]))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {small['sf'].split('/')[-1]} s | {big['sf'].split('/')[-1]} s | ratio |")
    print("| --- | --- | --- | --- |")
    for k, a, b, r in rows:
        tag = " (baseline)" if k in baselines else ""
        flag = " **> mult**" if r > mult and k not in baselines else ""
        print(f"| {k} | {a:.2f} | {b:.2f} | {r:.1f}x{tag}{flag} |")
    sup = [k for k, a, b, r in rows if r > mult and k not in baselines]
    sup_base = [k for k, a, b, r in rows if r > mult and k in baselines]
    print()
    print(f"total: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value']/small['value']:.1f}x at {mult:.0f}x data); "
          f"super-linear (> {mult:.0f}x): {sup if sup else 'none'}"
          + (f"; baselines over mult (excluded from gate): {sup_base}" if sup_base else ""))


if __name__ == "__main__":
    main()

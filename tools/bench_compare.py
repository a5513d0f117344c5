#!/usr/bin/env python3
"""Like-for-like bench comparison between two BENCH_DETAIL files.

Reported per query = min(run1, run2), matching graft.Bench's headline.
Usage: bench_compare.py OLD.json NEW.json
"""
import json, sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
def rep(d, k):
    rs = [r for r in d[k]["runs"] if r >= 0]
    return min(rs) if rs else None
# queries whose every recorded run failed (rep None) can't be compared —
# drop them from both sides instead of TypeError-ing the sums
common = sorted(k for k in set(old) & set(new)
                if rep(old, k) is not None and rep(new, k) is not None)
ot = sum(rep(old, k) for k in common)
nt = sum(rep(new, k) for k in common)
print(f"common {len(common)}: old {ot:.1f}s new {nt:.1f}s ratio {nt/ot:.3f}")
added = sorted(k for k in set(new) - set(old) if rep(new, k) is not None)
at = sum(rep(new, k) for k in added)
print(f"added {len(added)}: {at:.1f}s total")
for k in added:
    print(f"  {k}: {rep(new,k):.2f}")
movers = sorted(common, key=lambda k: rep(new,k)-rep(old,k))
print("top regressions (new-old):")
for k in movers[-8:][::-1]:
    print(f"  {k}: {rep(old,k):.2f} -> {rep(new,k):.2f}")
print("top improvements:")
for k in movers[:8]:
    print(f"  {k}: {rep(old,k):.2f} -> {rep(new,k):.2f}")

#!/usr/bin/env python3
"""Round-over-round bench diff.

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 1.3]

Reads two bench detail files (the one-line JSON Bench.scala writes to
BENCH_DETAIL.json / BENCH_DETAIL_rNN.json: {"value": total_sec,
"queries": {name: sec, ...}, ...}) and prints, without needing a judge
rerun:
  - totals and the common-query-set totals (comparable across rounds
    even when the query inventory grew),
  - queries added / removed between the two rounds,
  - every common query whose ratio new/old exceeds the threshold,
    sorted worst-first (regressions), and the top improvements.

Exit code 1 if any common query regressed beyond the threshold AND
slowed by more than 0.25 s absolute (tiny queries jitter by multiples
on a contended host; a 0.05->0.12 s swing is noise, not a regression).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries") or {}
    if not q:
        sys.exit(f"{path}: no per-query 'queries' map (truncated headline file? "
                 "use a BENCH_DETAIL file)")
    return d, q


def main(argv):
    thr = 1.3
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                thr = float(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    (dold, qold), (dnew, qnew) = load(args[0]), load(args[1])

    common = sorted(set(qold) & set(qnew))
    added = sorted(set(qnew) - set(qold))
    removed = sorted(set(qold) - set(qnew))
    ct_old = sum(qold[k] for k in common)
    ct_new = sum(qnew[k] for k in common)

    print(f"old: {args[0]}  total={dold.get('value', 0):.1f}s  n={len(qold)}")
    print(f"new: {args[1]}  total={dnew.get('value', 0):.1f}s  n={len(qnew)}")
    print(f"common set ({len(common)} queries): {ct_old:.1f}s -> {ct_new:.1f}s "
          f"({ct_new / ct_old:.2f}x)" if ct_old else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    deltas = [(qnew[k] / qold[k], qold[k], qnew[k], k)
              for k in common if qold[k] > 0]
    regressions = [d for d in deltas if d[0] > thr and d[2] - d[1] > 0.25]
    improvements = sorted(d for d in deltas if d[0] < 1 / thr)[:10]

    if regressions:
        print(f"\nregressions (> {thr}x and > 0.25s absolute):")
        for r, o, n, k in sorted(regressions, reverse=True):
            print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    else:
        print(f"\nno regressions beyond {thr}x + 0.25s")
    if improvements:
        print("top improvements:")
        for r, o, n, k in improvements:
            print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

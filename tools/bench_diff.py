#!/usr/bin/env python3
"""Round-over-round bench diff, noise-aware.

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 1.3]

Reads two bench detail files (the one-line JSON Bench.scala writes to
BENCH_DETAIL.json / BENCH_DETAIL_rNN.json: {"value": total_sec,
"queries": {name: sec, ...}, ...}) and prints, without needing a judge
rerun:
  - totals and the common-query-set totals (comparable across rounds
    even when the query inventory grew),
  - the NOISE FLOOR: the common-set median per-query ratio. A loaded
    host smears every query by a roughly uniform factor; the median
    captures that smear so only queries ABOVE it get flagged. When
    both files carry a "calibration" array (per-pass wall time of a
    fixed CPU-bound job), its ratio is printed alongside as an
    independent host-load marker.
  - queries added / removed between the two rounds,
  - every common query whose FLOOR-NORMALIZED ratio (raw ratio /
    noise floor) exceeds the threshold, sorted worst-first
    (regressions), and the top improvements (also floor-normalized,
    so a fast host doesn't fake improvements).

Exit code 1 if any common query regressed beyond the threshold after
floor normalization AND slowed by more than 0.25 s absolute (tiny
queries jitter by multiples on a contended host; a 0.05->0.12 s swing
is noise, not a regression).
"""
import json
import statistics
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

    # Noise floor: uniform host smear shows up as the median per-query
    # ratio. Restrict to queries >= 0.2 s in the old round — sub-0.2 s
    # queries are dominated by per-job scheduling jitter and would
    # drag the median around.
    ratios = [qnew[k] / qold[k] for k in common
              if qold[k] >= 0.2 and qnew[k] > 0]
    floor = statistics.median(ratios) if ratios else 1.0
    cal_note = ""
    cal_old, cal_new = dold.get("calibration"), dnew.get("calibration")
    cr = None
    if cal_old and cal_new:
        cr = min(cal_new) / min(cal_old)
        cal_note = f"; calibration ratio {cr:.2f}x (independent host marker)"
    print(f"noise floor: median common-set ratio {floor:.2f}x over "
          f"{len(ratios)} queries >= 0.2s{cal_note}")
    # A uniform smear is only NOISE if the host itself moved: when the
    # calibration marker says the host speed is unchanged but the
    # median query ratio drifted, the smear is a REAL code-level
    # regression (or improvement) and must not be normalized away —
    # gate against the calibration ratio instead of the median.
    if cr is not None and floor / cr > 1.15:
        print(f"  !! median ratio {floor:.2f}x is NOT explained by host "
              f"speed ({cr:.2f}x): treating the smear as a real uniform "
              f"regression — normalizing by {cr:.2f} instead")
        floor = cr
    elif floor > 1.15 or floor < 0.87:
        print(f"  -> host speed differs between runs; per-query ratios below "
              f"are divided by {floor:.2f} before flagging")

    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    # floor-normalized deltas: ratio/floor answers "did THIS query move
    # relative to the round's uniform smear?"
    deltas = [(qnew[k] / qold[k] / floor, qnew[k] / qold[k],
               qold[k], qnew[k], k)
              for k in common if qold[k] > 0]
    regressions = [d for d in deltas if d[0] > thr and d[3] - d[2] > 0.25]
    improvements = sorted(d for d in deltas if d[0] < 1 / thr)[:10]

    if regressions:
        print(f"\nregressions (> {thr}x after /{floor:.2f} floor, "
              f"> 0.25s absolute):")
        for nr, r, o, n, k in sorted(regressions, reverse=True):
            print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x raw, "
                  f"{nr:.2f}x vs floor)")
    else:
        print(f"\nno regressions beyond {thr}x (floor-normalized) + 0.25s")
    if improvements:
        print("top improvements (floor-normalized):")
        for nr, r, o, n, k in improvements:
            print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x raw, "
                  f"{nr:.2f}x vs floor)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

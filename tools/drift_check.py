#!/usr/bin/env python3
"""Mechanical host-drift verdict between two bench detail files.

Usage: tools/drift_check.py OLD.json NEW.json

Two rounds in a row (r10->r11, r11->r12 risk) were spent manually
adjudicating whether a uniform round-over-round bench smear was host
contention or a code regression. This script makes that adjudication
mechanical from evidence the bench run itself records:

  - the per-query ratio distribution over the common query set
    (median = the smear; IQR = how uniform it is),
  - the calibration markers (fixed CPU-bound job, one per pass +
    book-ends): an independent same-JVM host-speed measurement,
  - the /proc/loadavg samples (1m column) at the same points: what
    the rest of the host was doing during each pass.

Verdict logic (printed as one machine-greppable line):
  STABLE      median ratio within 15% of 1.0 - nothing to adjudicate.
  HOST_DRIFT  the median smear is explained by the calibration ratio
              (median/cal within 15%): same bytes, slower host. The
              per-query comparison should be floor-normalized
              (tools/bench_diff.py does this automatically).
  CODE_SHIFT  the smear is NOT explained by host speed: treat as a
              real uniform regression/improvement and investigate.
  CONFLICT    the two markers point in OPPOSITE directions (the
              r10->r11 case: calibration 0.53x while queries smeared
              1.27x - the embarrassingly-parallel calibration job and
              shuffle-bound queries can react differently to the same
              co-tenant). No automatic verdict is safe; run the
              archive-commit A/B (rebuild the old round's commit on
              today's host, SWEEP_r11.md protocol).
  MIXED       the ratio distribution is not uniform (IQR > 0.4): a
              subset of queries moved on their own - look at
              bench_diff's flagged list, not the median.

Exit code is 0 for STABLE/HOST_DRIFT, 1 for CODE_SHIFT/MIXED (so a
round script can gate on it). The human-readable evidence block below
the verdict line is what SWEEP_r{N}.md should quote.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if not d.get("queries"):
        sys.exit(f"{path}: no per-query 'queries' map")
    return d


def main(argv):
    if len(argv) != 2:
        sys.exit(__doc__)
    old, new = load(argv[0]), load(argv[1])
    qold, qnew = old["queries"], new["queries"]
    common = sorted(set(qold) & set(qnew))
    ratios = sorted(qnew[k] / qold[k] for k in common
                    if qold[k] >= 0.2 and qnew[k] > 0)
    if len(ratios) < 5:
        sys.exit("fewer than 5 comparable queries >= 0.2s - no verdict")
    med = statistics.median(ratios)
    q1 = ratios[len(ratios) // 4]
    q3 = ratios[3 * len(ratios) // 4]
    iqr = q3 - q1

    cal_old, cal_new = old.get("calibration"), new.get("calibration")
    cal = min(cal_new) / min(cal_old) if cal_old and cal_new else None
    # pass-spread of the calibration marker within each run: contention
    # ARRIVING mid-run shows as spread even when the mins agree
    def spread(c):
        return max(c) / min(c) if c else None
    la_old, la_new = old.get("loadavg"), new.get("loadavg")
    def la1(ls):
        return [x[0] for x in ls if x] if ls else None

    if abs(med - 1.0) <= 0.15:
        verdict = "STABLE"
    elif iqr > 0.4:
        verdict = "MIXED"
    elif cal is not None and abs(med / cal - 1.0) <= 0.15:
        verdict = "HOST_DRIFT"
    elif cal is not None and (med - 1.0) * (cal - 1.0) < 0:
        verdict = "CONFLICT"
    else:
        verdict = "CODE_SHIFT"

    print(f"DRIFT_VERDICT {verdict} median={med:.2f}x iqr={iqr:.2f} "
          f"cal={'%.2f' % cal + 'x' if cal is not None else 'n/a'} "
          f"n={len(ratios)}")
    print(f"  common queries >= 0.2s: {len(ratios)}; "
          f"ratio quartiles {q1:.2f}/{med:.2f}/{q3:.2f}")
    if cal is not None:
        print(f"  calibration min {min(cal_old):.3f}s -> {min(cal_new):.3f}s "
              f"({cal:.2f}x); pass spread old {spread(cal_old):.2f}x "
              f"new {spread(cal_new):.2f}x")
    for name, ls in (("old", la1(la_old)), ("new", la1(la_new))):
        if ls:
            print(f"  loadavg(1m) {name}: " +
                  " ".join(f"{x:.1f}" for x in ls))
    if verdict == "HOST_DRIFT":
        print("  -> same bytes, slower host; compare with "
              "tools/bench_diff.py (floor-normalizes automatically)")
    elif verdict == "CODE_SHIFT":
        print("  -> smear NOT explained by host speed: investigate as a "
              "real uniform change")
    elif verdict == "CONFLICT":
        print("  -> markers disagree (parallel calibration vs shuffle-"
              "bound queries): no automatic verdict - rebuild the old "
              "round's commit on this host and A/B (SWEEP_r11.md "
              "protocol)")
    elif verdict == "MIXED":
        print("  -> non-uniform movement: read bench_diff's per-query "
              "flags, the median is not the story")
    return 0 if verdict in ("STABLE", "HOST_DRIFT") else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

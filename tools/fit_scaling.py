#!/usr/bin/env python3
"""Fit per-query scaling exponents from a ScalingBench artifact.

For each query, fits log(sec) ~ a + b*log(sf) by least squares over
the measured scale factors and prints a markdown table with the time
exponent, the tail exponent (slope between the two LARGEST scale
factors, where the fixed per-query job floor is most amortized — the
cleanest superlinearity signal), the output-rows exponent (same fit
over the recorded cardinalities), and the sf-range timings.  An
exponent b means runtime grows as sf^b: b <= ~1.1 is
linear-or-better, and a super-linear TIME exponent paired with a
similar ROWS exponent is data-driven output growth, not plan
superlinearity.  NOTE the whole-range fit UNDERestimates the
asymptotic exponent when small-sf points sit on the constant job
floor — read the tail exponent for scale behavior.

Usage: fit_scaling.py BENCH_SCALING.json [more.json ...]
Multiple artifacts (e.g. one per scale factor from separate JVMs)
are merged on (query, sf) before fitting.
"""
import json
import math
import sys


def fit(xs, ys):
    """OLS slope of log(y) on log(x); None if degenerate."""
    pts = [(math.log(x), math.log(y)) for x, y in zip(xs, ys) if x > 0 and y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxx = sum((p[0] - mx) ** 2 for p in pts)
    if sxx == 0:
        return None
    return sum((p[0] - mx) * (p[1] - my) for p in pts) / sxx


def main():
    data = {"sfs": [], "queries": {}}
    for path in sys.argv[1:]:
        part = json.load(open(path))
        for s in part["sfs"]:
            if s not in data["sfs"]:
                data["sfs"].append(s)
        for q, per in part["queries"].items():
            data["queries"].setdefault(q, {}).update(per)
    data["sfs"].sort(key=float)
    sfs = [float(s) for s in data["sfs"]]
    rows_out = []
    for q, per in sorted(data["queries"].items()):
        secs = [per.get(s, {}).get("sec", -1.0) for s in data["sfs"]]
        cards = [per.get(s, {}).get("rows", -1) for s in data["sfs"]]
        sbytes = [per.get(s, {}).get("shuffleBytes", -1) for s in data["sfs"]]
        b_time = fit(sfs, secs)
        b_rows = fit(sfs, [float(c) for c in cards])
        b_bytes = fit(sfs, [float(b) for b in sbytes])
        b_tail = (fit(sfs[-2:], secs[-2:])
                  if len(sfs) >= 2 and min(secs[-2:]) > 0 else None)
        rows_out.append((q, secs, cards, sbytes, b_time, b_tail, b_rows, b_bytes))

    def f(v):
        return "n/a" if v is None else f"{v:.2f}"

    hdr_sfs = " | ".join(f"t(sf{s:g})" for s in sfs)
    print(f"| query | {hdr_sfs} | time exp | tail exp | rows exp "
          f"| bytes exp | shufMB(sf{sfs[-1]:g}) | rows(sf{sfs[-1]:g}) |")
    print("|---" * (len(sfs) + 7) + "|")
    for q, secs, cards, sbytes, b_time, b_tail, b_rows, b_bytes in sorted(
            rows_out, key=lambda r: -(r[5] if r[5] is not None else -9)):
        ts = " | ".join(f"{s:.2f}" for s in secs)
        mb = "n/a" if sbytes[-1] < 0 else f"{sbytes[-1] / 1e6:.1f}"
        print(f"| {q} | {ts} | {f(b_time)} | {f(b_tail)} | {f(b_rows)} "
              f"| {f(b_bytes)} | {mb} | {cards[-1]} |")


if __name__ == "__main__":
    main()

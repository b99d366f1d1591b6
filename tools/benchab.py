#!/usr/bin/env python3
"""Assemble a BENCH_AB round log from two Bench JSON lines and COMPUTE
the comparison trailer — the formula is pinned here (min-of-pair vs
min-of-pair, median over shared queries) so the round notes can't
hand-pick a flattering denominator (the r16 lesson: "1.021" was the
ratio against one prior run alone; the symmetric number was 1.099).

Usage:
  python3 tools/benchab.py A.json B.json [PRIOR_BENCH_AB.log] > BENCH_AB_rN.log

A.json/B.json each hold one Bench stdout JSON line
({"metric":"total",...,"queries":{...}}). The optional prior log is a
previous round's BENCH_AB file; its first two JSON lines are taken as
that round's A/B pair.
"""
import json
import statistics
import sys


def bench_line(path):
    for line in open(path):
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def bench_pair(path):
    out = []
    for line in open(path):
        line = line.strip()
        if line.startswith('{"metric"'):
            out.append(json.loads(line))
        if len(out) == 2:
            return out
    raise SystemExit(f"expected two bench JSON lines in {path}, got {len(out)}")


def min_of_pair(a, b):
    qa, qb = a["queries"], b["queries"]
    assert set(qa) == set(qb), "A/B query sets differ"
    return {q: min(qa[q], qb[q]) for q in qa}


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    a = bench_line(sys.argv[1])
    b = bench_line(sys.argv[2])
    cur = min_of_pair(a, b)
    print("A:")
    print(json.dumps(a, separators=(",", ":")))
    print()
    print("B:")
    print(json.dumps(b, separators=(",", ":")))
    print()
    print("## computed trailer (tools/benchab.py — do not hand-edit numbers)")
    print(f"# queries={len(cur)} totalA={a['value']:.1f}s totalB={b['value']:.1f}s "
          f"best_of_pair_total={sum(cur.values()):.1f}s")

    def calib(run):
        t = run.get("telemetry", {})
        vals = [t[k] for k in ("calib_start_ms", "calib_end_ms") if k in t]
        return min(vals) if vals else None

    # fixed-work host-speed anchor (r18+): identical CPU work each run,
    # so the ratio of calib times between rounds IS the host-speed
    # drift — divide it out before reading the query median as engine
    cal = [c for c in (calib(a), calib(b)) if c is not None]
    if cal:
        print(f"# host calib (fixed work, min of runs): {min(cal):.0f} ms")
    if len(sys.argv) > 3:
        pa, pb = bench_pair(sys.argv[3])
        prior = min_of_pair(pa, pb)
        shared = sorted(set(cur) & set(prior))
        ratios = {q: cur[q] / prior[q] for q in shared}
        med = statistics.median(ratios.values())
        up = sorted((q for q in shared if ratios[q] > 1.2),
                    key=lambda q: -ratios[q])
        down = sorted((q for q in shared if ratios[q] < 1 / 1.2),
                      key=lambda q: ratios[q])
        new = sorted(set(cur) - set(prior))
        gone = sorted(set(prior) - set(cur))
        print(f"# vs prior ({sys.argv[3]}): shared={len(shared)} "
              f"median_min_vs_min_ratio={med:.3f} "
              f"gt1.2x={len(up)} lt0.83x={len(down)}")
        print(f"# shared-query best-of-pair totals: "
              f"prior={sum(prior[q] for q in shared):.1f}s "
              f"current={sum(cur[q] for q in shared):.1f}s")
        pcal = [c for c in (calib(pa), calib(pb)) if c is not None]
        if cal and pcal:
            print(f"# host-speed ratio via calib: {min(cal) / min(pcal):.3f} "
                  "(normalize the query median by this before reading it as engine)")
        if new:
            print("# new queries: " + " ".join(
                f"{q}={cur[q]:.2f}s" for q in new))
        if gone:
            print("# removed queries: " + " ".join(gone))
        if up:
            print("# biggest regressions (min-vs-min): " + " ".join(
                f"{q}={ratios[q]:.2f}x" for q in up[:8]))
        if down:
            print("# biggest improvements (min-vs-min): " + " ".join(
                f"{q}={ratios[q]:.2f}x" for q in down[:8]))


if __name__ == "__main__":
    main()

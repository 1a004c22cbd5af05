#!/usr/bin/env python3
"""Assemble a BENCH_sf1_r{N}.json scaling record from two graft.Bench
file records (bench_out.json format) taken at sf0.1 and at the 10x
ScaleUp dataset, on the same commit/machine.

Usage: assemble_sf1.py <bench_sf0.1.json> <bench_sf1.json> <out.json> [note]
"""
import json
import sys


def main() -> None:
    base, scaled, out = sys.argv[1], sys.argv[2], sys.argv[3]
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    b = json.load(open(base))
    s = json.load(open(scaled))
    qb, qs = b["queries_all"], s["queries_all"]
    shared = sorted(set(qb) & set(qs))
    # guard degenerate records: a 0.000 best time (sub-ms after rounding)
    # would ZeroDivisionError, and a truncated/hand-edited record can have
    # queries_all without samples — surface both as named data, not a crash
    rec = {
        "note": note,
        "sf0_1": {q: qb[q] for q in shared},
        "sf1": {q: qs[q] for q in shared},
        "ratio_sf1_over_sf0_1": {
            q: (round(float(qs[q]) / float(qb[q]), 2)
                if float(qb[q]) > 0 else None)
            for q in shared},
        "samples_sf0_1": {q: b.get("samples", {}).get(q, []) for q in shared},
        "samples_sf1": {q: s.get("samples", {}).get(q, []) for q in shared},
        "errors_sf1": s.get("summary", {}).get("errors", {}),
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    worst = sorted(
        ((q, r) for q, r in rec["ratio_sf1_over_sf0_1"].items() if r is not None),
        key=lambda kv: -kv[1])
    print(f"{len(shared)} shared queries -> {out}")
    for q, r in worst[:5]:
        print(f"  ratio {r:5.2f}  {q}")


if __name__ == "__main__":
    main()

"""Assemble BENCH_MODES_r{N}.json: the per-mode / per-stage benchmark
artifact (host string kernels at 10 kB single-call + steady-state and at
10 MB, device rows at both 64 and 128 steps per host sync — PROF_r03
methodology: the axon tunnel costs ~28 ms fixed per sync).

Run: python scripts/bench_modes.py [--round N]
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    args = ap.parse_args()

    from rust_seq2kminmers_tpu.bench_suite import device_cases, host_cases

    rows = []
    for size in (10_000, 10 << 20):
        for rec in host_cases(size):
            print(json.dumps(rec), flush=True)
            rows.append(rec)
    for steps in (64, 128, 256):
        for rec in device_cases(32 << 20, steps):
            print(json.dumps(rec), flush=True)
            rows.append(rec)

    out = {
        "round": args.round,
        "note": (
            "host rows at 10 kB and 10 MB, three methodologies per "
            "kernel: single-call median (what one Python API call "
            "costs), Python steady-state loop, and *_native_loop — the "
            "kernel iterated with the clock read inside the C++ "
            "extension (criterion's exact zero-FFI setup, reference "
            "benches/bench.rs:36-49).  Device rows at 64/128/256 "
            "steps/sync (the tunnel's ~28 ms RTT amortizes; 256 is "
            "within ~1% of the sync-free asymptote).  r5 host delta: "
            "the int64-position encode_rle at 10 MB runs ~4x faster "
            "after the malloc-arena fix (PROF_r05 section 2); at the "
            "reference's own 10 kB criterion size the in-native rows "
            "show the kernels at 33/4.8/10 GB/s "
            "(hpc/encode_rle/encode_rle_simd) vs the reference's "
            "published ~4 GB/s."
        ),
        "rows": rows,
    }
    path = REPO / f"BENCH_MODES_r{args.round:02d}.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

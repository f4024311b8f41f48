"""Fresh-seed on-chip differential burn-in: the PRODUCTION path
(kminmers_list -> bucketed batch -> fused Pallas kernel, Mosaic-lowered
on the real TPU) vs the numpy oracle, on randomly drawn configs and
sequences whose seeds are NOT the fixed ones the test suite uses.

The committed suites pin fixed seeds for reproducibility
(tests/test_fidelity_sweep.py derives them from the combo repr); this
script draws a new session seed each run (printed for replay via
--seed) so every invocation exercises fresh random inputs on the chip.
Alphabets include N runs, lowercase, non-ACGTN garbage and homopolymer
bombs — the same families as the sweep (reference semantics:
src/nthash_hpc.rs:253-263, src/hpc.rs:14, src/nthash_avx512_32.rs:178-193).

Run: python scripts/burnin_onchip.py [--configs N] [--seqs M] [--seed S]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def gen_seq(rng, kind, l, n):
    if kind == "acgt":
        return "".join(rng.choice(list("ACGT"), size=n))
    if kind == "acgtn":
        return "".join(rng.choice(list("ACGTN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    if kind == "case":
        return "".join(rng.choice(list("ACGTacgtNn"), size=n))
    if kind == "garbage":
        pool = list("ACGTacgtNnXY@z*-")
        return "".join(rng.choice(pool, size=n))
    # homopolymer bombs: runs of geometric length
    out = []
    while sum(map(len, out)) < n:
        c = rng.choice(list("ACGTN"))
        out.append(c * int(rng.geometric(0.25)))
    return "".join(out)[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=12)
    ap.add_argument("--seqs", type=int, default=6)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument(
        "--variant", default=None, choices=["nthash1", "nthash2"],
        help="pin the hash variant for non-SIMD configs (targeted coverage)",
    )
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int.from_bytes(
        __import__("os").urandom(4), "little"
    )
    print(f"session seed: {seed}  (replay with --seed {seed})")
    rng = np.random.default_rng(seed)

    from rust_seq2kminmers_tpu import KSizeTooBig, kminmers_list

    kinds = ["acgt", "acgtn", "case", "garbage", "homo"]
    checked = 0
    kminmers_total = 0
    t0 = time.time()
    for c in range(args.configs):
        mode = str(
            rng.choice(
                ["regular", "hpc"]
                if args.variant == "nthash2"
                else ["regular", "simd", "hpc", "hpcsimd"]
            )
        )
        if mode in ("simd", "hpcsimd"):
            width, variant = 32, "nthash1"
            l = int(rng.integers(2, 32))
        else:
            variant = args.variant or str(
                rng.choice(["nthash1", "nthash1", "nthash2"])
            )
            width = 32 if variant == "nthash2" else int(rng.choice([16, 32, 64]))
            l = int(rng.integers(2, 64)) if variant == "nthash2" else int(
                rng.integers(2, 32 if mode == "regular" else 100)
            )
        k = int(rng.integers(2, 9))
        d = float(rng.choice([0.01, 0.05, 0.1]))
        label = f"[{c}] {mode}/{variant}/u{width} l={l} k={k} d={d}"
        for s in range(args.seqs):
            kind = kinds[s % len(kinds)]
            n = int(rng.integers(max(l + 1, 64), 6000))
            seq = gen_seq(rng, kind, l, n)
            try:
                got = kminmers_list(
                    seq, l, k, d, mode, hash_width=width, variant=variant
                )
            except KSizeTooBig:
                continue
            want = kminmers_list(
                seq, l, k, d, mode, backend="oracle",
                hash_width=width, variant=variant,
            )
            gt = [(r.hash, r.start, r.end, r.offset, r.rev) for r in got]
            wt = [(r.hash, r.start, r.end, r.offset, r.rev) for r in want]
            assert gt == wt, (label, kind, n, len(gt), len(wt))
            checked += 1
            kminmers_total += len(gt)
        print(f"{label}: ok ({args.seqs} seqs)", flush=True)
    import jax

    print(
        f"BURN-IN PASS: {checked} sequences across {args.configs} fresh "
        f"random configs, {kminmers_total} k-min-mers record-exact vs "
        f"oracle on {jax.devices()[0]} in {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()

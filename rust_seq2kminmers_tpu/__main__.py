"""CLI driver mirroring the reference binary (reference src/main.rs).

No args: demo over a hardcoded string — prints HPC forms and the k-min-mers
in all four modes (reference src/main.rs:13-47, which uses l=28, k=5,
d=0.1).

With args `<file.fasta|fastq> [nb_threads]`: enumerate k-min-mers for every
record (l=31, k=5, d=0.01, Regular — reference src/main.rs:53-60), print
count and wall-clock.  The batch path runs on the TPU pipeline; nb_threads
controls the native reader's packer threads.
"""

from __future__ import annotations

import sys
import time

import numpy as np

DEMO_SEQ = (
    "AACTGCACTGCACTGCACTGCACACTGCACTGCACTGCACTGCACACTGCACTGCACTG"
    "ACTGCACTGCACTGCACTGCACTGCCTGC"
)


def demo():
    from .api import kminmers_list
    from .hpc_strings import encode_rle, hpc

    seq = DEMO_SEQ
    print(f"seq:    {seq!r}")
    print(f"HPC:    {hpc(seq)!r}")
    print(f"encode_rle:{encode_rle(seq)!r}")
    print(
        "Demonstrating how to construct k-min-mers (l=28, k=5, d=0.1) "
        f"out of a test sequence: {seq}"
    )
    for mode in ["regular", "simd", "hpc", "hpcsimd"]:
        print(f"mode: {mode}")
        for km in kminmers_list(seq, 28, 5, 0.1, mode):
            print(
                f"kminmer: KminmerHash {{ hash: {km.hash}, start: {km.start},"
                f" end: {km.end}, offset: {km.offset}, rev: {km.rev} }}"
            )


def run_file(filename: str, nb_threads: int):
    import jax
    import jax.numpy as jnp

    from .constants import XCODE_PAD, family_of_mode
    from .io.fasta import FastaFile
    from .ops.pipeline import PipelineSpec, kminmer_pipeline

    l, k, d = 31, 5, 0.01
    print(
        f"Enumerating k-min-mers for the input file {filename} "
        f"({nb_threads} packer threads, device {jax.devices()[0]})"
    )
    t0 = time.perf_counter()
    total = 0
    nbases = 0
    with FastaFile(filename) as f:
        max_len = f.max_seq_len()
        # pad to a multiple of 1024 to bound recompiles across files
        pad = max(1024, (max_len + 1023) // 1024 * 1024)
        spec = PipelineSpec(
            l=l, k=k, density=d, mode="regular",
            max_minimizers=min(pad, int(pad * d * 4) + 256),
        )
        fn = jax.jit(lambda c, n: kminmer_pipeline(c, n, spec))
        batch = 64
        fam = family_of_mode(spec.mode)
        for codes, lengths, _first in f.batches(batch, pad, nb_threads, fam):
            if codes.shape[0] < batch:  # pad last batch to the static shape
                padrows = batch - codes.shape[0]
                codes = np.concatenate(
                    [codes, np.full((padrows, pad), XCODE_PAD, codes.dtype)]
                )
                lengths = np.concatenate(
                    [lengths, np.zeros(padrows, np.int64)]
                )
            out = fn(jnp.asarray(codes), jnp.asarray(lengths.astype(np.int32)))
            total += int(np.asarray(out.n_kminmers).sum())
            nbases += int(lengths.sum())
    dt = time.perf_counter() - t0
    print(
        f"FASTA to kminmers in {dt:.3f}s: {total} k-min-mers from "
        f"{nbases} bases ({nbases / dt / 1e9:.3f} GB/s)."
    )


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        demo()
    else:
        import os

        if not os.path.exists(argv[0]):
            print(f"error: input file not found: {argv[0]}", file=sys.stderr)
            return 2
        nb_threads = int(argv[1]) if len(argv) > 1 else 0
        run_file(argv[0], nb_threads)
    return 0


if __name__ == "__main__":
    sys.exit(main())

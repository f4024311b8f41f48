"""Benchmark: HPC+NtHash k-min-mer throughput on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric mirrors the reference's criterion setup (throughput in
bytes/s over the full KminmersIterator pipeline, reference
benches/bench.rs:95-124) but at production batch sizes.  vs_baseline is
measured against the reference's published best single-thread number for
the same HpcSimd pipeline stage chain (~1 GB/s SIMD NtHash bound,
README.md:23 — the full-pipeline bound; HPC-alone runs at ~4 GB/s).
"""

import json
import sys
import time

import numpy as np

REFERENCE_GBPS = 1.0  # reference SIMD full-pipeline per-thread throughput


def main():
    import jax
    import jax.numpy as jnp

    from rust_seq2kminmers_tpu.constants import CODE_PAD
    from rust_seq2kminmers_tpu.ops.pipeline import (
        PipelineSpec,
        kminmer_pipeline,
    )

    # Production-shaped workload: batch of long reads (HiFi-like),
    # l=31, k=5, d=0.01 (reference src/main.rs:53-60 config).
    B, L = 32, 1 << 20  # 32 reads x 1 Mbp = 32 MB per step
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = np.full(B, L, dtype=np.int32)
    spec = PipelineSpec(
        l=31, k=5, density=0.01, mode="hpcsimd",
        max_minimizers=int(L * 0.02) + 256,
    )

    fn = jax.jit(lambda c, n: kminmer_pipeline(c, n, spec))
    cj = jnp.asarray(codes)
    nj = jnp.asarray(lengths)

    # warmup / compile
    out = fn(cj, nj)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(cj, nj)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    nbytes = B * L
    gbps = nbytes / dt / 1e9
    total_kminmers = int(np.asarray(out.n_kminmers).sum())
    result = {
        "metric": "hpc_nthash_kminmers_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / REFERENCE_GBPS, 3),
        "detail": {
            "mode": "hpcsimd",
            "l": 31,
            "k": 5,
            "density": 0.01,
            "batch": [B, L],
            "step_ms": round(dt * 1e3, 2),
            "kminmers_per_s": int(total_kminmers / dt),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

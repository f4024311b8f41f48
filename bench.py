"""Benchmark: HPC+NtHash k-min-mer throughput on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric mirrors the reference's criterion setup (throughput in
bytes/s over the full KminmersIterator pipeline, reference
benches/bench.rs:95-124) but at production batch sizes.  vs_baseline is
measured against the reference's published best single-thread number for
the same HpcSimd pipeline stage chain (~1 GB/s SIMD NtHash bound,
README.md:23 — the full-pipeline bound; HPC-alone runs at ~4 GB/s).

Timing methodology: on this environment `jax.block_until_ready` through the
axon tunnel can return before device execution finishes, so every timed
iteration host-materializes a checksum that depends on all pipeline outputs
(int() forces a real device->host transfer of the finished value).  Inputs
rotate across distinct device buffers so no dispatch-level caching can
short-circuit the work.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_GBPS = 1.0  # reference SIMD full-pipeline per-thread throughput


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from rust_seq2kminmers_tpu.ops.pipeline import (
        PipelineSpec,
        kminmer_pipeline,
    )

    # Production-shaped workload: batch of long reads (HiFi-like),
    # l=31, k=5, d=0.01 (reference src/main.rs:53-60 config).
    B, L = 32, 1 << 20  # 32 reads x 1 Mbp = 32 MB per step
    rng = np.random.default_rng(0)
    lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
    spec = PipelineSpec(
        l=31, k=5, density=0.01, mode="hpcsimd",
        max_minimizers=int(L * 0.02) + 256,
    )

    @jax.jit
    def step(c, n):
        out = kminmer_pipeline(c, n, spec)
        # Checksum over every output so nothing can be dead-code-eliminated
        # and the host wait covers the full computation.
        chk = (
            out.n_kminmers.sum()
            + out.hash_lo.astype(jnp.uint32).sum().astype(jnp.int32)
            + out.hash_hi.astype(jnp.uint32).sum().astype(jnp.int32)
            + out.min_hash.sum().astype(jnp.int32)
            + out.start.sum()
            + out.end.sum()
        )
        return chk, out.n_kminmers

    bufs = [
        jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.uint8))
        for _ in range(4)
    ]

    # warmup / compile
    chk, nk = step(bufs[0], lengths)
    int(chk)

    iters = 10
    times = []
    total_kminmers = 0
    for i in range(iters):
        t0 = time.perf_counter()
        chk, nk = step(bufs[i % len(bufs)], lengths)
        int(chk)  # host-materialize: the only trustworthy sync point
        times.append(time.perf_counter() - t0)
    total_kminmers = int(np.asarray(nk).sum())
    dt = float(np.median(times))

    nbytes = B * L
    gbps = nbytes / dt / 1e9
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

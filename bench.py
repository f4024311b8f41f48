"""Benchmark: HPC+NtHash k-min-mer throughput on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric mirrors the reference's criterion setup (throughput in
bytes/s over the full KminmersIterator pipeline, reference
benches/bench.rs:95-124) but at production batch sizes: 32 reads x 1 Mbp,
l=31, k=5, d=0.01, hpcsimd (the reference's fastest mode).  vs_baseline is
the ratio against the BASELINE.json north-star target (4 GB/s/chip for the
full HPC+NtHash pipeline); the reference's own published per-thread numbers
are ~1 GB/s SIMD NtHash / ~4 GB/s HPC-only (README.md:23).

Timing methodology: the axon tunnel to the chip has ~30 ms fixed RTT per
host sync and `block_until_ready` can return early, so per-step host
timing measures the tunnel, not the chip.  Instead each measured unit is a
jitted lax.scan of STEPS full pipeline invocations whose outputs all feed
a checksum that is materialized on host once per unit — one RTT amortized
over STEPS steps of real device work.  Inputs come from a pool of POOL
distinct pre-generated batches resident in HBM, indexed per step (cycling;
XLA cannot fold or cache the pipeline across iterations since the operand
is a data-dependent dynamic slice), so input preparation costs nothing
inside the measured region — matching the reference's criterion setup,
which also hashes a pre-materialized string (benches/bench.rs:20-34).
"""

import json
import os
import sys
import time

import numpy as np

# vs_baseline denominator: the BASELINE.json north-star target of
# >= 4 GB/s/chip for the full HPC+NtHash pipeline (the reference's own
# published per-thread numbers are ~1 GB/s SIMD NtHash / ~4 GB/s HPC-only,
# reference README.md:23 — the 4.0 target is the stricter bar).
TARGET_GBPS = 4.0


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

    B, L = 32, 1 << 20  # 32 reads x 1 Mbp = 32 MB per step
    # 256 steps per host sync: the measured rate is within ~1% of the
    # sync-free asymptote (128/256/512 steps -> 6.17/6.30/6.37 GB/s on
    # TPU v5 lite; the residual is the tunnel's ~28 ms RTT / STEPS).
    STEPS = 256
    POOL = 16
    lengths = jnp.asarray(np.full(B, L, dtype=np.int32))
    spec = PipelineSpec(
        l=31, k=5, density=0.01, mode="hpcsimd",
        max_minimizers=int(L * 0.02) + 256,
    )

    from rust_seq2kminmers_tpu.ops.hpc import with_keep_bits_device

    def gen_pool(key):
        bits = jax.random.bits(key, (POOL, B, L // 4), jnp.uint32)
        c = jnp.stack([(bits >> (2 * i)) & 3 for i in range(4)], axis=-1)
        return with_keep_bits_device(
            c.reshape(POOL, B, L).astype(jnp.uint8)
        )

    pool = jax.block_until_ready(jax.jit(gen_pool)(jax.random.PRNGKey(7)))

    def chk_of(out):
        return (
            out.n_kminmers.sum()
            + jax.lax.bitcast_convert_type(out.hash_lo, jnp.int32).sum()
            + jax.lax.bitcast_convert_type(out.hash_hi, jnp.int32).sum()
            + jax.lax.bitcast_convert_type(out.min_hash, jnp.int32).sum()
            + out.start.sum()
            + out.end.sum()
        )

    @jax.jit
    def unit(pool, salt):
        def body(carry, i):
            acc, nk = carry
            codes = jax.lax.dynamic_index_in_dim(
                pool, (i + salt) % POOL, axis=0, keepdims=False
            )
            out = kminmer_pipeline(codes, lengths, spec)
            return (acc + chk_of(out), nk + out.n_kminmers.sum()), None

        (acc, nk), _ = jax.lax.scan(
            body,
            (jnp.int32(0), jnp.int32(0)),
            jnp.arange(STEPS, dtype=jnp.int32),
        )
        return acc, nk

    # warmup / compile
    acc, nk = unit(pool, jnp.int32(0))
    int(acc)

    reps = 3
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        acc, nk = unit(pool, jnp.int32(i))
        int(acc)  # single host sync per unit
        times.append(time.perf_counter() - t0)
    total_kminmers = int(np.asarray(nk))
    dt = float(np.median(times)) / STEPS

    nbytes = B * L
    gbps = nbytes / dt / 1e9
    result = {
        "metric": "hpc_nthash_kminmers_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / TARGET_GBPS, 3),
        "detail": {
            "mode": "hpcsimd",
            "l": 31,
            "k": 5,
            "density": 0.01,
            "batch": [B, L],
            "steps_per_sync": STEPS,
            "step_ms": round(dt * 1e3, 2),
            "kminmers_per_s": int(total_kminmers / (dt * STEPS)),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

"""Quantify the data-parallel scaling claim (BASELINE.md north star:
>= 90% reads/s scaling from 1 chip to >= 2 hosts).

Multi-chip hardware is not available in this environment, so the claim is
bounded from two directions that ARE measurable:

  (a) measured sharding overhead: the shard_map data-parallel step
      (parallel/driver.py make_dp_pipeline, counts-only all-gather) on a
      1-device mesh on the REAL chip vs the raw jitted pipeline on the
      same shapes.  Everything shard_map adds — partitioning, the
      all-gather, offset math — is in the diff; on N chips the per-chip
      work is identical and only the all-gather's payload grows (N x 4
      bytes/read).
  (b) analytic communication budget: the only cross-device traffic in the
      design is the per-read k-min-mer count all-gather (4 bytes/read over
      ICI) against ~1 MB/read of device input, so communication is a
      ~4e-6 fraction of the moved bytes; even at a conservative 10 GB/s
      effective ICI all-gather bandwidth the collective costs microseconds
      against a multi-millisecond step.

Replaces the reference's thread-pool scaling story (src/main.rs:65-79),
which likewise shares nothing between workers until the final count.

Writes MULTICHIP_SCALING_r03.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rust_seq2kminmers_tpu.ops.pipeline import PipelineSpec, kminmer_pipeline
from rust_seq2kminmers_tpu.parallel.driver import make_dp_pipeline

B, L = 32, 1 << 20
STEPS = 16
MODE = "hpcsimd"


def timed(unit, *args):
    int(jax.block_until_ready(unit(*args)))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        int(jax.block_until_ready(unit(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / STEPS


def main():
    from rust_seq2kminmers_tpu.constants import with_keep_bits

    rng = np.random.default_rng(0)
    codes = jnp.asarray(with_keep_bits(rng.integers(0, 4, size=(B, L))))
    lengths = jnp.asarray(np.full(B, L, np.int32))
    m_cap = int(L * 0.02) + 256
    spec = PipelineSpec(l=31, k=5, density=0.01, mode=MODE, max_minimizers=m_cap)

    # (a) raw pipeline vs 1-device-mesh shard_map step, scan-amortized
    # (one host sync per STEPS on-device iterations; the axon tunnel RTT
    # never enters the measurement).
    @jax.jit
    def raw_unit(codes, lengths):
        def body(acc, i):
            out = kminmer_pipeline(jnp.roll(codes, i, axis=1), lengths, spec)
            return acc + out.n_kminmers.sum() + out.start.sum(), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    dp_step = make_dp_pipeline(spec, mesh)

    @jax.jit
    def dp_unit(codes, lengths):
        def body(acc, i):
            out = dp_step(jnp.roll(codes, i, axis=1), lengths)
            return (
                acc
                + out.total
                + out.batch.start.sum()
                + out.global_offset.sum(),
                None,
            )

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    with mesh:
        t_dp = timed(dp_unit, codes, lengths)
    t_raw = timed(raw_unit, codes, lengths)
    overhead_pct = (t_dp - t_raw) / t_raw * 100.0

    # (b) analytic collective budget per step, as deployed on N chips:
    # all-gather payload = B reads x 4 bytes x (N-1)/N received per chip.
    comm_bytes_per_read = 4
    input_bytes_per_read = L
    ici_gb_s = 10.0  # conservative effective all-gather bandwidth
    n_chips = 8
    t_collective_s = (B * comm_bytes_per_read * (n_chips - 1) / n_chips) / (
        ici_gb_s * 1e9
    )
    eff = t_raw / (t_raw + t_collective_s) * 100.0

    rec = {
        "mode": MODE,
        "batch": [B, L],
        "steps": STEPS,
        "raw_pipeline_ms_per_step": round(t_raw * 1e3, 3),
        "dp_shardmap_mesh1_ms_per_step": round(t_dp * 1e3, 3),
        "measured_sharding_overhead_pct": round(overhead_pct, 2),
        "comm_bytes_per_read": comm_bytes_per_read,
        "input_bytes_per_read": input_bytes_per_read,
        "comm_fraction_of_moved_bytes": comm_bytes_per_read / input_bytes_per_read,
        "analytic_collective_s_at_8_chips": t_collective_s,
        "analytic_scaling_efficiency_pct_at_8_chips": round(eff, 4),
        "note": (
            "1 real chip; shard_map partitioning + counts all-gather + "
            "offset math measured directly as dp-vs-raw delta, collective "
            "growth with N bounded analytically (4 B/read vs 1 MB/read "
            "input). Multi-host input is disjoint files (parallel/"
            "multihost.py), so the DCN path carries zero pipeline bytes."
        ),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec, indent=1))
    Path("MULTICHIP_SCALING_r03.json").write_text(json.dumps(rec, indent=1) + "\n")


if __name__ == "__main__":
    main()

"""Quantify the scaling claims for BOTH parallel axes (BASELINE.md north
star: >= 90% reads/s scaling from 1 chip to >= 2 hosts; VERDICT r3 #5:
budget the seq-axis collectives like the DP ones).

Multi-chip hardware is not available in this environment, so each claim is
bounded from two directions that ARE measurable:

  (a) measured sharding overhead on a 1-device mesh on the REAL chip vs
      the raw jitted pipeline on the same shapes — everything the sharded
      program adds beyond the collective payloads (partitioning, carry
      computation, pending reconstruction, splice compaction, offset
      math) is in the diff;
  (b) analytic communication budget at N devices: payload bytes per read
      per collective round, against the measured per-shard compute time
      and a stated ICI bandwidth.

Data-parallel axis ('data'): the only cross-device traffic is the per-read
k-min-mer count all-gather — 4 B/read vs ~1 MB/read of device input.

Sequence axis ('seq', parallel/seqshard.py): two rounds per step —
  round 1: carry hand-off all-gather of (count, last-l packed tail,
           validity) = (l + 2) * 4 B per read per shard;
  round 2: survivor-stream all-gather of the per-shard compacted
           (start, end, hash) columns = m_cap * ncols * 4 B per read
           TOTAL (independent of S: per-shard segments are m_cap/S), of
           which each chip receives (S-1)/S.  m_cap carries the ~4x
           density-safety capacity factor (PipelineSpec.capacity_for), so
           round 2 is the dominant term and scales with density * L.

Replaces the reference's thread-pool scaling story (src/main.rs:65-79),
which likewise shares nothing between workers until the final count.

Writes MULTICHIP_SCALING_r04.json.
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
from rust_seq2kminmers_tpu.parallel.seqshard import make_seq_pipeline

B, L = 32, 1 << 20
STEPS = 16
MODE = "hpcsimd"
ICI_GB_S = 25.0  # conservative effective all-gather bandwidth per chip
N_CHIPS = 8


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

    # ---- raw pipeline baseline, scan-amortized (one host sync per STEPS
    # on-device iterations; the axon tunnel RTT never enters).
    @jax.jit
    def raw_unit(codes, lengths):
        def body(acc, i):
            out = kminmer_pipeline(jnp.roll(codes, i, axis=1), lengths, spec)
            return acc + out.n_kminmers.sum() + out.start.sum(), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    t_raw = timed(raw_unit, codes, lengths)

    # ---- (DP-a) 1-device-mesh shard_map step
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
    dp_overhead_pct = (t_dp - t_raw) / t_raw * 100.0

    # ---- (SEQ-a) 1-device data x seq mesh through the seq-sharded fused
    # step: the carry computation, pending reconstruction, splice
    # compaction and (degenerate) collectives are all in the diff vs raw.
    smesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "seq"))
    # seqshard requires max_minimizers unset -> capacity_for(L); match m_cap
    sspec = PipelineSpec(l=31, k=5, density=0.01, mode=MODE)
    seq_step = make_seq_pipeline(sspec, smesh)

    @jax.jit
    def seq_unit(codes, lengths):
        def body(acc, i):
            out = seq_step(jnp.roll(codes, i, axis=1), lengths)
            return acc + out.n_kminmers.sum() + out.start.sum(), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    with smesh:
        t_seq = timed(seq_unit, codes, lengths)
    seq_overhead_pct = (t_seq - t_raw) / t_raw * 100.0

    # Tight-capacity variant: the round-2 gather payload scales with the
    # configured capacity, which users bound via spec.max_minimizers —
    # 1.5x the expected density instead of capacity_for's ~4x safety
    # (overflow stays detectable via n_minimizers_raw).
    tight_cap = int(L * 0.01 * 1.5) + 128
    tspec = PipelineSpec(
        l=31, k=5, density=0.01, mode=MODE, max_minimizers=tight_cap
    )
    tight_step = make_seq_pipeline(tspec, smesh)

    @jax.jit
    def tight_unit(codes, lengths):
        def body(acc, i):
            out = tight_step(jnp.roll(codes, i, axis=1), lengths)
            return acc + out.n_kminmers.sum() + out.start.sum(), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    with smesh:
        t_seq_tight = timed(tight_unit, codes, lengths)

    # ---- (DP-b) analytic DP collective budget at N chips
    dp_comm_bytes = B * 4 * (N_CHIPS - 1) / N_CHIPS
    t_dp_coll = dp_comm_bytes / (ICI_GB_S * 1e9)
    dp_eff = t_raw / (t_raw + t_dp_coll) * 100.0

    # ---- (SEQ-b) analytic seq-axis budget at S chips for ONE read of L
    # bases: per-shard compute scales 1/S; collective payloads as derived
    # in the module docstring.  Rates from the measured single-chip step.
    l = 31
    S = N_CHIPS
    m_cap_seq = sspec.capacity_for(L)
    ncols = 3  # start, end, hash (4 when hash_width=64)
    per_chip_bytes_r1 = B * S * (l + 2) * 4 * (S - 1) / S
    per_chip_bytes_r2 = B * m_cap_seq * ncols * 4 * (S - 1) / S
    t_comm_seq = (per_chip_bytes_r1 + per_chip_bytes_r2) / (ICI_GB_S * 1e9)
    t_comp_shard = t_seq / S  # per-shard scan shrinks with S
    seq_eff = t_comp_shard / (t_comp_shard + t_comm_seq) * 100.0
    # capacity factor: actual survivors vs gathered capacity slots
    expected_minimizers = L * 0.01
    cap_factor = m_cap_seq / expected_minimizers
    # tight-capacity variant (max_minimizers = 1.5x expected density)
    t_comm_tight = (
        B * S * (l + 2) * 4 + B * tight_cap * ncols * 4
    ) * (S - 1) / S / (ICI_GB_S * 1e9)
    seq_eff_tight = (
        (t_seq_tight / S) / (t_seq_tight / S + t_comm_tight) * 100.0
    )

    rec = {
        "mode": MODE,
        "batch": [B, L],
        "steps_per_sync": STEPS,
        "raw_pipeline_ms_per_step": round(t_raw * 1e3, 3),
        "data_axis": {
            "dp_shardmap_mesh1_ms_per_step": round(t_dp * 1e3, 3),
            "measured_sharding_overhead_pct": round(dp_overhead_pct, 2),
            "comm_bytes_per_read": 4,
            "input_bytes_per_read": L,
            "analytic_collective_s_at_8_chips": t_dp_coll,
            "analytic_scaling_efficiency_pct_at_8_chips": round(dp_eff, 4),
        },
        "seq_axis": {
            "seqshard_mesh1x1_ms_per_step": round(t_seq * 1e3, 3),
            "measured_sharding_overhead_pct": round(seq_overhead_pct, 2),
            "round1_bytes_per_read_at_8_shards": int(S * (l + 2) * 4),
            "round2_bytes_per_read": int(m_cap_seq * ncols * 4),
            "round2_capacity_factor": round(cap_factor, 2),
            "analytic_comm_s_per_step_at_8_shards": t_comm_seq,
            "analytic_scaling_efficiency_pct_at_8_shards": round(seq_eff, 2),
            "tight_capacity_variant": {
                "max_minimizers": tight_cap,
                "capacity_factor": round(
                    tight_cap / expected_minimizers, 2
                ),
                "seqshard_mesh1x1_ms_per_step": round(t_seq_tight * 1e3, 3),
                "analytic_scaling_efficiency_pct_at_8_shards": round(
                    seq_eff_tight, 2
                ),
            },
            "note": (
                "round 2 gathers capacity-padded survivor segments "
                "(factor ~4 over expected density); efficiency at 8 "
                "shards is bounded by that gather, not the carry "
                "hand-off — long-read workloads (larger L at fixed "
                "density) and tighter per-shard capacities both raise "
                "it. Seq-sharding is a LATENCY optimization for single "
                "long reads; throughput workloads should prefer the "
                "data axis, whose collective is 4 B/read."
            ),
        },
        "ici_gb_s_assumed": ICI_GB_S,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec, indent=1))
    Path(__file__).resolve().parents[1].joinpath(
        "MULTICHIP_SCALING_r04.json"
    ).write_text(json.dumps(rec, indent=1) + "\n")


if __name__ == "__main__":
    main()

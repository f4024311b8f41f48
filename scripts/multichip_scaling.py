"""Quantify the scaling claims for BOTH parallel axes (BASELINE.md north
star: >= 90% reads/s scaling from 1 chip to >= 2 hosts; VERDICT r4 #1:
push the seq axis to >= 90% analytic at 8 shards).

Multi-chip hardware is not available in this environment, so each claim is
bounded from two directions that ARE measurable:

  (a) measured sharding overhead on a 1-device mesh on the REAL chip vs
      the raw jitted pipeline on the same shapes — everything the sharded
      program adds beyond the collective payloads (partitioning, carry
      computation, pending/halo reconstruction, offset math) is in the
      diff;
  (b) analytic communication budget at N devices: payload bytes per read
      per collective round, against the measured per-shard compute time
      and a stated ICI bandwidth.

Data-parallel axis ('data'): the only cross-device traffic is the per-read
k-min-mer count all-gather — 4 B/read vs ~1 MB/read of device input.

Sequence axis ('seq', parallel/seqshard.py, r5 halo design): two tiny
rounds per step, BOTH independent of sequence length and density —
  round 1: base-space carry hand-off all-gather of (count, last-l packed
           tail, validity) = (l + 2) * 4 B per read per shard;
  round 2: minimizer-space halo all-gather of (count + each shard's
           last-(k-1) survivor (start, hash[, hash_hi]) tails + tail
           validity) = ((k-1) * ncols + 2) * 4 B per read per shard.
The multi-MB survivor streams never move: outputs stay sharded over 'seq'
as ordered stream segments (r4's round-2 survivor all-gather — m_cap *
12 B/read with a 4x capacity-padding factor, the 68%-efficiency bound in
MULTICHIP_SCALING_r04 — is gone).

Replaces the reference's thread-pool scaling story (src/main.rs:65-79),
which likewise shares nothing between workers until the final count.

Writes MULTICHIP_SCALING_r05.json.
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
STEPS = 64  # steps per host sync (axon tunnel RTT must not enter)
ICI_GB_S = 25.0  # conservative effective all-gather bandwidth per chip
N_CHIPS = 8
L_PARAM, K_PARAM = 31, 5


def timed(unit, *args):
    int(jax.block_until_ready(unit(*args)))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        int(jax.block_until_ready(unit(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / STEPS


def scan_unit(step_fn, reduce_fn):
    @jax.jit
    def unit(codes, lengths):
        def body(acc, i):
            out = step_fn(jnp.roll(codes, i, axis=1), lengths)
            return acc + reduce_fn(out), None

        acc, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32)
        )
        return acc

    return unit


def main():
    from rust_seq2kminmers_tpu.constants import with_keep_bits

    rng = np.random.default_rng(0)
    codes = jnp.asarray(with_keep_bits(rng.integers(0, 4, size=(B, L))))
    lengths = jnp.asarray(np.full(B, L, np.int32))
    m_cap = int(L * 0.02) + 256

    dp_spec = PipelineSpec(
        l=L_PARAM, k=K_PARAM, density=0.01, mode="hpcsimd",
        max_minimizers=m_cap,
    )

    # ---- raw pipeline baseline (hpcsimd), scan-amortized.
    raw_unit = scan_unit(
        lambda c, ln: kminmer_pipeline(c, ln, dp_spec),
        lambda out: out.n_kminmers.sum() + out.start.sum(),
    )
    t_raw = timed(raw_unit, codes, lengths)

    # ---- (DP-a) 1-device-mesh shard_map step
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    dp_step = make_dp_pipeline(dp_spec, mesh)
    dp_unit = scan_unit(
        dp_step,
        lambda out: out.total + out.batch.start.sum()
        + out.global_offset.sum(),
    )
    with mesh:
        t_dp = timed(dp_unit, codes, lengths)
    dp_overhead_pct = (t_dp - t_raw) / t_raw * 100.0

    # ---- (DP-b) analytic DP collective budget at N chips
    dp_comm_bytes = B * 4 * (N_CHIPS - 1) / N_CHIPS
    t_dp_coll = dp_comm_bytes / (ICI_GB_S * 1e9)
    dp_eff = t_raw / (t_raw + t_dp_coll) * 100.0

    # ---- SEQ axis, both an HPC and a non-HPC mode: 1-device data x seq
    # mesh through the seq-sharded fused step (carry computation, pending
    # + halo reconstruction and degenerate collectives all in the diff vs
    # raw), then the analytic halo budget at 8 shards.
    smesh = Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "seq")
    )
    S = N_CHIPS
    seq_rows = {}
    for mode in ("hpcsimd", "regular"):
        sspec = PipelineSpec(
            l=L_PARAM, k=K_PARAM, density=0.01, mode=mode
        )
        raw_m = scan_unit(
            lambda c, ln, sp=sspec: kminmer_pipeline(c, ln, sp),
            lambda out: out.n_kminmers.sum() + out.start.sum(),
        )
        t_raw_m = timed(raw_m, codes, lengths)
        seq_step = make_seq_pipeline(sspec, smesh)
        seq_unit = scan_unit(
            seq_step,
            lambda out: out.n_kminmers_seg.sum() + out.start.sum(),
        )
        with smesh:
            t_seq = timed(seq_unit, codes, lengths)
        # analytic halo budget at S shards for B reads of L bases:
        # per-shard compute scales 1/S; payloads per module docstring.
        ncols = 3 if sspec.hash_width == 64 else 2  # start, hash[, hi]
        r1 = B * S * (L_PARAM + 2) * 4 * (S - 1) / S
        r2 = B * S * ((K_PARAM - 1) * ncols + 2) * 4 * (S - 1) / S
        t_comm = (r1 + r2) / (ICI_GB_S * 1e9)
        t_comp_shard = t_seq / S
        eff = t_comp_shard / (t_comp_shard + t_comm) * 100.0
        seq_rows[mode] = {
            "raw_pipeline_ms_per_step": round(t_raw_m * 1e3, 3),
            "seqshard_mesh1x1_ms_per_step": round(t_seq * 1e3, 3),
            "measured_sharding_overhead_pct": round(
                (t_seq - t_raw_m) / t_raw_m * 100.0, 2
            ),
            "round1_bytes_per_read_at_8_shards": int(S * (L_PARAM + 2) * 4),
            "round2_halo_bytes_per_read_at_8_shards": int(
                S * ((K_PARAM - 1) * ncols + 2) * 4
            ),
            "analytic_comm_s_per_step_at_8_shards": t_comm,
            "analytic_scaling_efficiency_pct_at_8_shards": round(eff, 3),
        }

    rec = {
        "batch": [B, L],
        "l_k_density": [L_PARAM, K_PARAM, 0.01],
        "steps_per_sync": STEPS,
        "raw_pipeline_ms_per_step_hpcsimd": round(t_raw * 1e3, 3),
        "data_axis": {
            "mode": "hpcsimd",
            "dp_shardmap_mesh1_ms_per_step": round(t_dp * 1e3, 3),
            "measured_sharding_overhead_pct": round(dp_overhead_pct, 2),
            "comm_bytes_per_read": 4,
            "input_bytes_per_read": L,
            "analytic_collective_s_at_8_chips": t_dp_coll,
            "analytic_scaling_efficiency_pct_at_8_chips": round(dp_eff, 4),
        },
        "seq_axis": seq_rows,
        "seq_axis_note": (
            "r5 halo design: per-shard survivor segments stay resident "
            "(outputs sharded over 'seq', stitched host-side); the only "
            "collectives are the O(l) base-space carry hand-off and the "
            "O(k) minimizer-space halo, both independent of sequence "
            "length and density. r4's round-2 survivor all-gather "
            "(504828 B/read, 4x capacity padding, 68% analytic "
            "efficiency) is eliminated, not shrunk."
        ),
        "ici_gb_s_assumed": ICI_GB_S,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec, indent=1))
    Path(__file__).resolve().parents[1].joinpath(
        "MULTICHIP_SCALING_r05.json"
    ).write_text(json.dumps(rec, indent=1) + "\n")


if __name__ == "__main__":
    main()

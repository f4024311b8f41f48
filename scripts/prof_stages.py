"""Stage-level TPU profiler using the bench.py scan methodology (one host
sync per STEPS on-device iterations — the axon tunnel RTT is ~30 ms, so
per-call timing is meaningless)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from rust_seq2kminmers_tpu.ops.pipeline import PipelineSpec, kminmer_pipeline
from rust_seq2kminmers_tpu.ops.pallas.assemble_kernel import (
    assemble_kminmers_pallas,
)
from rust_seq2kminmers_tpu.ops.pallas.fused_scan import (
    fused_minimizer_scan,
    slots_for_density,
)
from rust_seq2kminmers_tpu.ops.pallas.slot_compact import slot_compact
from rust_seq2kminmers_tpu.ops.hpc import hpc_keep_mask

B, L = 32, 1 << 20
STEPS = 16


def scan_time(make_step, name):
    """make_step(i32 step index) -> scalar checksum."""

    @jax.jit
    def unit():
        def body(acc, i):
            return acc + make_step(i), None

        acc, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32)
        )
        return acc

    int(unit())  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(unit())
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / STEPS * 1e3
    gbps = B * L / (float(np.median(times)) / STEPS) / 1e9
    print(f"{name:34s} {ms:8.3f} ms/step   {gbps:7.2f} GB/s")
    return ms


def main():
    rng = np.random.default_rng(0)
    from rust_seq2kminmers_tpu.constants import with_keep_bits

    codes = jnp.asarray(with_keep_bits(rng.integers(0, 4, size=(B, L))))
    lengths = jnp.asarray(np.full(B, L, np.int32))
    limit = (lengths - 31).astype(jnp.int32)
    m_cap = int(L * 0.02) + 256
    spec = PipelineSpec(
        l=31, k=5, density=0.01, mode="hpcsimd", max_minimizers=m_cap
    )
    nslots = slots_for_density(0.01)

    def vary(i):
        return jnp.roll(codes, i, axis=1)

    def full(i):
        out = kminmer_pipeline(vary(i), lengths, spec)
        return out.n_kminmers.sum() + out.start.sum()

    scan_time(full, "full hpcsimd pipeline")

    def keepmask(i):
        return hpc_keep_mask(vary(i), lengths).sum(axis=-1).astype(jnp.int32).sum()

    scan_time(keepmask, "hpc_keep_mask prepass")

    def scan_only(i):
        st, en, hs, rc = fused_minimizer_scan(
            vary(i), lengths, limit, 31, int(spec.bound), True, True, False,
            emit_end=True, nslots=nslots,
        )
        return rc.sum() + st[:, :, 0].sum()

    scan_time(scan_only, "fused scan (hpc)")

    # fixed slot arrays, vary mask cheaply by xor on counts
    st, en, hs, counts = jax.block_until_ready(
        fused_minimizer_scan(
            codes, lengths, limit, 31, int(spec.bound), True, True, False,
            emit_end=True, nslots=nslots,
        )
    )
    _, SB, _ = st.shape
    NT = counts.shape[1]
    RO = SB // NT
    sv = (
        jnp.arange(RO * 128, dtype=jnp.int32)[None, None, :]
        < jnp.minimum(counts[:, :, 0], RO * 128)[..., None]
    ).reshape(B, SB * 128)
    cols = [st.reshape(B, SB * 128), en.reshape(B, SB * 128), hs.reshape(B, SB * 128)]

    def slotc(i):
        packed, n = slot_compact(sv, [cols[0] + i, cols[1], cols[2]], m_cap)
        return n.sum() + packed[0][:, 0].sum()

    scan_time(slotc, "slot_compact (3 cols)")

    mh = jnp.asarray(
        rng.integers(0, 2**31, size=(B, -(-m_cap // 128) * 128)).astype(np.int32)
    ).view(jnp.uint32)

    def asm(i):
        (hi, lo), rev = assemble_kminmers_pallas(mh + i.astype(jnp.uint32), 5)
        return (
            jax.lax.bitcast_convert_type(hi, jnp.int32).sum()
            + jax.lax.bitcast_convert_type(lo, jnp.int32).sum()
        )

    scan_time(asm, "assemble (m_cap)")


if __name__ == "__main__":
    main()

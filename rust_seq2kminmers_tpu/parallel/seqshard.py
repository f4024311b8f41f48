"""Sequence-parallel (SPMD) fused pipeline: shard ONE read's bases over the
'seq' mesh axis and run the fused Pallas kernel on every shard in parallel.

The reference processes each sequence serially (one thread, one AVX-512
lane-block at a time, src/nthash_avx512_32.rs); its block hand-off algebra
(lane-15 carry + variable rotate, :404-425) is what makes the scan
resumable mid-stream.  This module is that hand-off lifted to the mesh:

  1. Each shard computes, locally and in parallel, its kept-stream length
     and its last-l kept (position, code) elements (for non-HPC modes these
     are trivially the chunk length and the last l raw codes).
  2. One all-gather over 'seq' exchanges those tiny carries (l packed
     int32 per read per shard — ~1 KB, vs the multi-MB base stream which
     never moves).  Each shard reconstructs its global base rank
     (exclusive prefix of the counts) and its pending prefix (the last l
     global stream elements before it, spliced across as many predecessor
     shards as needed — a shard inside a mega-homopolymer run may
     contribute 0).
  3. Every shard runs the SAME fused kernel as the single-chip path with
     the carry injected (fused_scan.py base0/pend0); the emission masks
     guarantee each window is emitted by exactly one shard.
  4. Shards compact their survivors locally; a second all-gather moves only
     the ~density-sized compacted minimizer streams, spliced in order into
     the [B, m_cap] stream every shard holds replicated; assembly then
     matches the unsharded pipeline exactly.

Collectives ride ICI ('seq' is the minor mesh axis); communication per read
is O(l + density * L / S) int32 — asymptotically negligible vs the O(L/S)
local scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.compact import I32, compact
from ..ops.pipeline import KminmerBatch, PipelineSpec, _phase2_compact

try:  # jax >= 0.8
    from jax import shard_map

    _SMAP_KW = {"check_vma": False}
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map

    _SMAP_KW = {"check_rep": False}

U32 = jnp.uint32
LANES = 128
P0 = 8 * LANES  # pending-prefix flat size (fused_scan.py layout)


def _pick_block_rows(c: int) -> int:
    """Largest supported block height that tiles the local chunk exactly —
    mid-stream padding would inject fake bases between shards."""
    rows = c // LANES
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    raise ValueError(
        f"local seq chunk {c} must be a multiple of 1024 bases"
    )


def _local_tail(codes, local_len, l, s, c, do_hpc, method="bsearch"):
    """Per-shard carry stats: kept-stream count + the shard's last
    min(count, l) kept elements as packed ((global_pos << 3) | code),
    left-aligned in an l-slot buffer."""
    Bl, C = codes.shape
    ci = codes.astype(I32)
    gpos0 = s * c
    pos_i = jax.lax.broadcasted_iota(I32, (Bl, C), dimension=1)
    if do_hpc:
        keep = ((ci & 8) != 0) & (pos_i < local_len[:, None])
        cnt = keep.sum(axis=1).astype(I32)
        packed = ((gpos0 + pos_i) << 3) | (ci & 7)
        # last-l kept = first-l kept of the flipped stream; compact
        # left-packs them so tail[:, i] is the (i+1)-th element FROM THE
        # END (reversed order — _build_pending flips once at the end).
        comp, _ = compact(
            jnp.flip(keep, axis=1),
            [jnp.flip(packed, axis=1)],
            l,
            [I32(0)],
            method=method,
        )
        tail = comp[0]
        v = jnp.minimum(cnt, l)
    else:
        # every padded position is a stream element (matching the kernel's
        # non-HPC semantics); the tail is simply the last l columns.
        cnt = jnp.full((Bl,), C, dtype=I32)
        seg = ci[:, C - l :]
        gp = gpos0 + C - l + jax.lax.broadcasted_iota(
            I32, (Bl, l), dimension=1
        )
        tail_fwd = (gp << 3) | (seg & 7)
        tail = jnp.flip(tail_fwd, axis=1)  # reversed order, like above
        v = jnp.full((Bl,), l, dtype=I32)
    return cnt, tail, v


def _build_pending(all_tail, all_v, s, my_off, l):
    """Reconstruct the pending prefix for shard s from every predecessor's
    reversed tail buffer: the last l global stream elements before this
    shard, right-aligned and packed into the kernel's [8, 128] layout with
    positions rebased to this shard's origin."""
    S, Bl, _ = all_tail.shape
    # Walk shards in REVERSE order (s-1, s-2, ...): their reversed tails
    # concatenated give the global stream's last elements nearest-first.
    order = jnp.arange(S - 1, -1, -1, dtype=I32)
    rev_tails = all_tail[order].transpose(1, 0, 2).reshape(Bl, S * l)
    # validity per (shard j, slot i): shard j contributes its first v_j
    # reversed-slots, and only shards j < s count.
    slot_i = jnp.arange(l, dtype=I32)[None, None, :]
    vmask = (order[None, :, None] < s) & (
        slot_i < all_v[order].transpose(1, 0)[:, :, None]
    )
    vmask = vmask.reshape(Bl, S * l)
    comp, p_raw = compact(
        vmask, [rev_tails], l, [I32(0)], method="bsearch"
    )
    near_first = comp[0]  # [Bl, l]: element j = (j+1)-th before the shard
    # Rebase positions to this shard's origin: packed layout makes that a
    # subtraction of (offset << 3) on valid slots only.
    pv = jnp.minimum(p_raw, l)[:, None]
    iv = jnp.arange(l, dtype=I32)[None, :]
    near_first = jnp.where(
        iv < pv, near_first - (my_off << 3), 0
    )
    # Right-align into the flat [P0] pending layout: flat[P0-1-j] = the
    # (j+1)-th element before the shard.
    padded = jnp.pad(near_first, ((0, 0), (0, P0 - l)))
    pend_flat = jnp.flip(padded, axis=1)
    return pend_flat.reshape(-1, 8, LANES)


def _seq_sharded_body(codes, lengths, *, spec: PipelineSpec, S: int,
                      m_cap: int, interpret: bool):
    from ..ops.pallas.fused_scan import fused_minimizer_scan
    from ..ops.pipeline import default_rows_out as _dro

    l, k = spec.l, spec.k
    Bl, C = codes.shape
    s = jax.lax.axis_index("seq").astype(I32)
    local_len = jnp.clip(lengths - s * C, 0, C).astype(I32)

    # bsearch's take_along_axis gathers cost O(m) serial element loads on
    # TPU — fine for the l-sized tail/pending compactions, ruinous at
    # m_cap scale (measured ~190 ms/step at m_cap 42k).  Big compactions
    # go through the streaming Pallas kernel when Mosaic is available.
    big_method = "bsearch" if interpret else "pallas"
    cnt, tail, v = _local_tail(
        codes, local_len, l, s, C, spec.is_hpc, method=big_method
    )
    all_cnt = jax.lax.all_gather(cnt, "seq")  # [S, Bl]
    all_tail = jax.lax.all_gather(tail, "seq")  # [S, Bl, l]
    all_v = jax.lax.all_gather(v, "seq")  # [S, Bl]
    shard_ids = jnp.arange(S, dtype=I32)[:, None]
    base = jnp.sum(
        jnp.where(shard_ids < s, all_cnt, 0), axis=0
    ).astype(I32)
    pend0 = _build_pending(all_tail, all_v, s, s * C, l)

    if spec.is_hpc:
        limit = jnp.where(lengths > l, jnp.int32(1 << 30), -1).astype(I32)
    else:
        limit = jnp.where(lengths > l, lengths - l, -1).astype(I32)

    block_rows = _pick_block_rows(C)
    from ..ops.long_read import _nslots

    nslots = _nslots(spec)
    rows_out = (
        spec.rows_out if spec.rows_out is not None
        else _dro(spec.density, block_rows)
    )
    emit_end = spec.is_hpc
    st, en, hs, counts = fused_minimizer_scan(
        codes,
        local_len,
        limit,
        l,
        int(spec.bound),
        spec.strict_threshold,
        spec.is_hpc,
        spec.mode == "hpc",
        emit_end=emit_end,
        nslots=nslots,
        block_rows=block_rows,
        interpret=interpret,
        variant=spec.variant,
        rows_out=rows_out,
        base0=base,
        pend0=pend0,
        hash_width=spec.hash_width,
    )
    m_cap_s = max(-(-m_cap // S), k)
    mst, men, mhs, n_min_s, n_raw_s = _phase2_compact(
        st, en, hs, counts, m_cap_s, emit_end, l, interpret
    )
    wide = spec.hash_width == 64
    hcols_s = list(mhs) if wide else [mhs]  # [hi, lo] | [h]
    # Rebase this shard's survivor positions to global coordinates.
    iv = jnp.arange(m_cap_s, dtype=I32)[None, :]
    ok = iv < n_min_s[:, None]
    mst = jnp.where(ok, mst + s * C, 0)
    men = jnp.where(ok, men + s * C, 0)
    hcols_s = [jnp.where(ok, c, 0) for c in hcols_s]

    # Splice the per-shard compacted streams in shard order (second tiny
    # collective: ~density-sized, vs the base stream that never moves).
    def _g(x):
        return jax.lax.all_gather(x, "seq").transpose(1, 0, 2).reshape(
            Bl, -1
        )

    g_st = _g(mst)
    g_en = _g(men)
    g_hs = [_g(c) for c in hcols_s]
    g_n = jax.lax.all_gather(n_min_s, "seq")  # [S, Bl]
    g_raw = jax.lax.all_gather(n_raw_s, "seq")
    seg_valid = (
        jnp.arange(m_cap_s, dtype=I32)[None, None, :]
        < g_n.transpose(1, 0)[:, :, None]
    ).reshape(Bl, -1)
    packed, n_tot = compact(
        seg_valid, [g_st, g_en] + g_hs, m_cap,
        [I32(0)] * (2 + len(g_hs)), method=big_method,
    )
    min_start, min_end, *h_packed = packed
    n_raw = g_raw.sum(axis=0).astype(I32)
    n_min = jnp.minimum(n_tot, m_cap).astype(I32)
    valid = jnp.arange(m_cap, dtype=I32)[None, :] < n_min[:, None]
    min_hash = jnp.where(
        valid, jax.lax.bitcast_convert_type(h_packed[-1], U32), U32(0)
    )
    min_hash_hi = (
        jnp.where(
            valid, jax.lax.bitcast_convert_type(h_packed[0], U32), U32(0)
        )
        if wide
        else jnp.zeros_like(min_hash)
    )

    if wide:  # identity MixHash, pair window hash (src/lib.rs:171-177)
        from ..ops.assemble import assemble_kminmers_mixed

        (kh_hi, kh_lo), rev = assemble_kminmers_mixed(
            (min_hash_hi, min_hash), k
        )
    elif spec.hash_width == 16:
        from ..ops.assemble import assemble_kminmers_mixed
        from ..ops.u64 import mix64_murmur_from_u16

        (kh_hi, kh_lo), rev = assemble_kminmers_mixed(
            mix64_murmur_from_u16(min_hash), k
        )
    else:
        from ..ops.pallas.assemble_kernel import assemble_kminmers_pallas

        (kh_hi, kh_lo), rev = assemble_kminmers_pallas(
            min_hash, k, interpret=interpret
        )
    mk = m_cap - k + 1
    n_km = jnp.maximum(n_min - (k - 1), 0)
    w = jnp.arange(mk, dtype=I32)[None, :]
    km_valid = w < n_km[:, None]
    zero32 = jnp.zeros((), dtype=U32)
    return KminmerBatch(
        hash_hi=jnp.where(km_valid, kh_hi, zero32),
        hash_lo=jnp.where(km_valid, kh_lo, zero32),
        start=jnp.where(km_valid, min_start[:, :mk], 0),
        end=jnp.where(km_valid, min_end[:, k - 1 :], 0),
        rev=km_valid & rev,
        n_kminmers=n_km,
        min_hash=min_hash,
        min_hash_hi=min_hash_hi,
        min_start=min_start,
        min_end=min_end,
        n_minimizers=n_min,
        n_minimizers_raw=n_raw,
    )


def make_seq_pipeline(spec: PipelineSpec, mesh: Mesh):
    """Returns a jitted fn(codes[B, L], lengths[B]) -> KminmerBatch with
    codes sharded P('data', 'seq'): reads data-parallel over 'data', each
    read's bases sequence-parallel over 'seq' THROUGH the fused kernel.

    L must be divisible by mesh.shape['seq'] * 1024 (each shard's chunk
    must tile into whole kernel blocks); every per-read output is
    replicated over 'seq' and sharded over 'data'.  Supports every fused
    hash width (u16/u32/u64).  Overflow is reported, not retried: callers
    check n_minimizers_raw vs n_minimizers like kminmers_batch.
    """
    if spec.hash_width not in (16, 32, 64):
        raise ValueError("sequence-sharded path needs hash_width 16/32/64")
    S = mesh.shape["seq"]
    interpret = jax.devices()[0].platform != "tpu"

    def run(codes, lengths):
        B, L = codes.shape
        if L % (S * 1024):
            raise ValueError(
                f"padded length {L} must be a multiple of {S * 1024} "
                f"(seq={S} shards x 1024-base kernel blocks)"
            )
        m_cap = spec.capacity_for(L)
        body = partial(
            _seq_sharded_body,
            spec=spec,
            S=S,
            m_cap=m_cap,
            interpret=interpret,
        )
        rep2 = P("data", None)
        rep1 = P("data")
        smapped = shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data", "seq"), P("data")),
            out_specs=KminmerBatch(
                *([rep2] * 5 + [rep1] + [rep2] * 4 + [rep1] * 2)
            ),
            **_SMAP_KW,
        )
        return smapped(codes, lengths.astype(I32))

    return jax.jit(run)

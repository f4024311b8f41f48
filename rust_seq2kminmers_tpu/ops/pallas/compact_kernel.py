"""Pallas TPU kernel: ordered masked stream compaction ("compressstoreu").

The TPU-native equivalent of the reference's AVX-512 masked compress-stores
(src/hpc.rs:104-108 and src/nthash_avx512_32.rs:139-140), generalized to
whole reads: given mask[B, N] and K value columns, left-pack the selected
elements of each row, preserving order, into out[B, M] plus a count[B].

Why a kernel: XLA's scatter and minor-dim gather are orders of magnitude
slower than dense ops on TPU (measured ~318 ms / ~1.5 s per pass at
[64, 1M] on v5e), while this kernel streams the data once.

Algorithm (per 8x128 row-group, inner fori_loop over groups of a large
[R, 128] block, sequential grid over blocks):
  1. per-128-lane-row ranks via a Hillis-Steele prefix sum (7 masked rolls);
  2. lane-local compaction: move every selected element left by
     offset = lane - rank, decomposed bit-by-bit into 7 rounds of
     conditional lane-rolls (monotone offsets guarantee no collisions);
  3. all rows are rotated right (cyclically) by their destination fill
     f_s = (cnt + prefix_counts) % 128 — 7 rounds of row-predicated rolls;
     a cyclic rotate makes the wrapped lanes exactly the spill for the
     next output row;
  4. sequential merge: row s blends into out[r_s] above lane f_s and writes
     its full rotated image to out[r_s + 1] (spill; any garbage lands
     beyond the running tail and is overwritten by later writes or masked
     by the final count);
  5. the running count lives in SMEM and persists across the sequential
     grid steps (TPU grid iterations execute in order on a core).

All dynamic indexing is on the sublane (row) axis, which Mosaic supports;
dynamic lane addressing is never needed.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

SUBLANES = 8  # rows per group; group = 8*128 elements
LANES = 128
GROUP = SUBLANES * LANES


def _lane_iota(s):
    return jax.lax.broadcasted_iota(I32, (s, LANES), dimension=1)


def _row_prefix_sum_inclusive(m):
    """Inclusive prefix sum along lanes of [S, 128] int32 (7 masked rolls)."""
    ps = m
    li = _lane_iota(m.shape[0])
    for j in range(7):
        sh = 1 << j
        rolled = pltpu.roll(ps, sh, 1)
        ps = ps + jnp.where(li >= sh, rolled, 0)
    return ps


def _compact_group(mask_g, cols_g, cnt, out_refs, mr):
    """Compact one [8, 128] group given running count cnt; write merged rows
    into out_refs at absolute row offsets; return the new running count."""
    S = SUBLANES
    li = _lane_iota(S)
    m = mask_g

    ps = _row_prefix_sum_inclusive(m)  # inclusive rank within row
    c_row = ps[:, LANES - 1 :]  # [S, 1] survivors per row

    # --- lane-local compaction (offsets < 128) ---
    sel = m > 0
    off = jnp.where(sel, li - (ps - 1), -1)  # move-left distance, -1 invalid
    cols = list(cols_g)
    for j in range(7):
        sh = 1 << j
        off_in = pltpu.roll(off, LANES - sh, 1)  # off_in[i] = off[i+sh]
        valid_in = (li < LANES - sh) & (off_in >= 0) & ((off_in & sh) != 0)
        keep = (off >= 0) & ((off & sh) == 0)
        new_cols = []
        for c in cols:
            c_in = pltpu.roll(c, LANES - sh, 1)
            new_cols.append(jnp.where(valid_in, c_in, c))
        cols = new_cols
        off = jnp.where(valid_in, off_in - sh, jnp.where(keep, off, -1))

    # --- per-row destination fill and output row ---
    # [S, 1] exclusive row prefix (cumsum is not lowerable; unrolled
    # Hillis-Steele over the sublane axis)
    incl = c_row
    si = jax.lax.broadcasted_iota(I32, c_row.shape, dimension=0)
    sh = 1
    while sh < S:
        incl = incl + jnp.where(si >= sh, pltpu.roll(incl, sh, 0), 0)
        sh <<= 1
    excl = incl - c_row
    dest = cnt + excl  # absolute start position of row s's survivors
    f_vec = dest % LANES  # [S, 1]
    r_vec = dest // LANES

    # --- cyclic right-rotate each row by its own f_s (7 predicated rolls) ---
    for j in range(7):
        sh = 1 << j
        pred = (f_vec & sh) != 0  # [S, 1] row predicate
        cols = [jnp.where(pred, pltpu.roll(c, sh, 1), c) for c in cols]

    blend = li >= f_vec  # [S, 128]: lanes belonging to the new row image

    # --- sequential merge into the output tail ---
    for s in range(S):
        rv = jnp.minimum(r_vec[s, 0], mr - 2)
        for c, oref in zip(cols, out_refs):
            cur = oref[0, pl.ds(rv, 1), :]  # (1, 128) current tail row
            row0 = jnp.where(blend[s : s + 1], c[s : s + 1], cur)
            oref[0, pl.ds(rv, 1), :] = row0
            oref[0, pl.ds(rv + 1, 1), :] = c[s : s + 1]

    return dest[S - 1, 0] + c_row[S - 1, 0]


def _compact_kernel(smask_ref, *refs, k_cols: int, mr: int, groups: int):
    # refs layout: k_cols input col refs, then k_cols out refs, count_ref,
    # then scratch: cnt_smem
    col_refs = refs[:k_cols]
    out_refs = refs[k_cols : 2 * k_cols]
    count_ref = refs[2 * k_cols]
    cnt_smem = refs[2 * k_cols + 1]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cnt_smem[0] = 0

    # NOTE: statically unrolled — a lax.fori_loop body with loop-carried
    # dynamic store addresses hangs at runtime on this Mosaic version.
    total = cnt_smem[0]
    for g in range(groups):
        row0 = g * SUBLANES
        mask_g = smask_ref[0, pl.ds(row0, SUBLANES), :]
        cols_g = [r[0, pl.ds(row0, SUBLANES), :] for r in col_refs]
        total = _compact_group(mask_g, cols_g, total, out_refs, mr)
    cnt_smem[0] = total
    count_ref[0] = jnp.full((SUBLANES, LANES), total, dtype=I32)


@functools.partial(
    jax.jit, static_argnames=("m", "block_rows", "interpret")
)
def masked_compact(
    mask: jnp.ndarray,
    cols: Sequence[jnp.ndarray],
    m: int,
    block_rows: int = 256,
    interpret: bool = False,
) -> Tuple[list, jnp.ndarray]:
    """Left-pack selected elements of each row (ordered, exact).

    mask: bool/int [B, N]; cols: K arrays [B, N] of 32-bit dtype (or uint8,
    widened); N must be a multiple of 1024.  Returns
    (list of [B, M'] arrays with M' = ceil(m/128)*128; entries beyond the
    returned count are garbage and must be masked by the caller, raw
    count int32[B]).
    """
    B, N = mask.shape
    if N % GROUP:
        raise ValueError(f"N={N} must be a multiple of {GROUP}")
    rows = N // LANES
    br = min(block_rows, rows)
    while rows % br:
        br //= 2
    nt = rows // br
    groups = br // SUBLANES
    mr = -(-m // LANES) + SUBLANES + 2  # capacity rows + slack
    k_cols = len(cols)

    mask3 = mask.astype(I32).reshape(B, rows, LANES)
    cols3 = []
    orig_dtypes = []
    for c in cols:
        orig_dtypes.append(c.dtype)
        if c.dtype == jnp.uint8:
            c = c.astype(I32)
        elif c.dtype != I32:
            c = jax.lax.bitcast_convert_type(c, I32)
        cols3.append(c.reshape(B, rows, LANES))

    tile_spec = pl.BlockSpec(
        (1, br, LANES),
        lambda b, t: (b, t, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, mr, LANES), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec(
        (1, SUBLANES, LANES), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, mr, LANES), I32) for _ in range(k_cols)
    ) + (jax.ShapeDtypeStruct((B, SUBLANES, LANES), I32),)

    kernel = functools.partial(
        _compact_kernel, k_cols=k_cols, mr=mr, groups=groups
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[tile_spec] * (1 + k_cols),
        out_specs=tuple([out_spec] * k_cols + [count_spec]),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((1,), I32)],
        interpret=interpret,
    )(mask3, *cols3)

    counts = outs[k_cols][:, 0, 0]
    packed = []
    for o, dt in zip(outs[:k_cols], orig_dtypes):
        flat = o.reshape(B, mr * LANES)
        if dt == jnp.uint8:
            flat = flat.astype(jnp.uint8)
        elif dt != I32:
            flat = flat.view(dt)
        packed.append(flat[:, : -(-m // LANES) * LANES])
    return packed, counts

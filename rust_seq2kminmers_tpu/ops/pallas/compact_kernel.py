"""Pallas TPU kernel: ordered masked stream compaction ("compressstoreu").

The TPU-native equivalent of the reference's AVX-512 masked compress-stores
(src/hpc.rs:104-108 and src/nthash_avx512_32.rs:139-140), generalized to
whole reads: given mask[B, N] and K value columns, left-pack the selected
elements of each row, preserving order, into out[B, M] plus a count[B].

Why a kernel: XLA's scatter and minor-dim gather are orders of magnitude
slower than dense ops on TPU (measured ~318 ms / ~1.5 s per pass at
[64, 1M] on v5e), while this kernel streams the data once.

Algorithm (per row, sequential grid over tiles of S x 128):
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

SUBLANES = 8  # rows per tile (S); tile = S*128 elements
LANES = 128


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


def _compact_kernel(smask_ref, *refs, k_cols: int, mr: int):
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

    m = smask_ref[0]  # [S, 128] int32 0/1
    S = m.shape[0]
    li = _lane_iota(S)

    # --- ranks and per-row counts ---
    ps = _row_prefix_sum_inclusive(m)  # inclusive rank within row
    c_row = ps[:, LANES - 1 :]  # [S, 1] survivors per row

    # --- lane-local compaction (offsets < 128) ---
    sel = m > 0
    off = jnp.where(sel, li - (ps - 1), -1)  # move-left distance, -1 invalid
    cols = [r[0] for r in col_refs]  # [S, 128] each
    for j in range(7):
        sh = 1 << j
        off_in = pltpu.roll(off, -sh, 1)
        valid_in = (li < LANES - sh) & (off_in >= 0) & ((off_in & sh) != 0)
        keep = (off >= 0) & ((off & sh) == 0)
        new_cols = []
        for c in cols:
            c_in = pltpu.roll(c, -sh, 1)
            new_cols.append(jnp.where(valid_in, c_in, c))
        cols = new_cols
        off = jnp.where(valid_in, off_in - sh, jnp.where(keep, off, -1))

    # --- per-row destination fill and output row ---
    cnt = cnt_smem[0]
    excl = jnp.cumsum(c_row, axis=0) - c_row  # [S, 1] exclusive row prefix
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

    total = dest[S - 1, 0] + c_row[S - 1, 0]
    cnt_smem[0] = total
    count_ref[0, 0] = total


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def masked_compact(
    mask: jnp.ndarray,
    cols: Sequence[jnp.ndarray],
    m: int,
    interpret: bool = False,
) -> Tuple[list, jnp.ndarray]:
    """Left-pack selected elements of each row (ordered, exact).

    mask: bool/int [B, N]; cols: K arrays [B, N] of 32-bit dtype (or uint8,
    widened); N must be a multiple of S*128 = 1024.  Returns
    (list of [B, M'] arrays with M' = ceil(m/128)*128; entries beyond the
    returned count are garbage and must be masked by the caller, raw
    count int32[B]).
    """
    B, N = mask.shape
    tile = SUBLANES * LANES
    if N % tile:
        raise ValueError(f"N={N} must be a multiple of {tile}")
    nt = N // tile
    mr = -(-m // LANES) + SUBLANES + 2  # capacity rows + slack
    k_cols = len(cols)

    mask3 = mask.astype(I32).reshape(B, N // LANES, LANES)
    cols3 = []
    orig_dtypes = []
    for c in cols:
        orig_dtypes.append(c.dtype)
        if c.dtype == jnp.uint8:
            c = c.astype(I32)
        elif c.dtype != I32:
            c = jax.lax.bitcast_convert_type(c, I32)
        cols3.append(c.reshape(B, N // LANES, LANES))

    tile_spec = pl.BlockSpec(
        (1, SUBLANES, LANES),
        lambda b, t: (b, t, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, mr, LANES), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    count_spec = pl.BlockSpec(
        (1, 1), lambda b, t: (b, 0), memory_space=pltpu.SMEM
    )

    out_shapes = tuple(
        jax.ShapeDtypeStruct((B, mr, LANES), I32) for _ in range(k_cols)
    ) + (jax.ShapeDtypeStruct((B, 1), I32),)

    kernel = functools.partial(_compact_kernel, k_cols=k_cols, mr=mr)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[tile_spec] * (1 + k_cols),
        out_specs=tuple([out_spec] * k_cols + [count_spec]),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((1,), I32)],
        interpret=interpret,
    )(mask3, *cols3)

    counts = outs[k_cols][:, 0]
    packed = []
    for o, dt in zip(outs[:k_cols], orig_dtypes):
        flat = o.reshape(B, mr * LANES)
        if dt == jnp.uint8:
            flat = flat.astype(jnp.uint8)
        elif dt != I32:
            flat = flat.view(dt)
        packed.append(flat[:, : -(-m // LANES) * LANES])
    return packed, counts

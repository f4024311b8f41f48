"""Pallas TPU kernel: dense one-block compaction of slot arrays.

Phase 2 of the fused minimizer pipeline.  Phase 1 (fused_scan.py) emits
survivors into per-row slots [B, SR, NS] + row counts; with NS a power of
two <= 16, eight slot rows reshape to one 128-lane row, so a whole batch
row's slots fit a single VMEM-resident [G, 128] tile (G = SR*NS/128, ~0.5MB
at 1 Mbp reads).  The entire global compaction is then one in-register
bit-decomposed move (no sequential merges, no dynamic stores, no grid
carries) — the dense counterpart of ops/pallas/compact_kernel.py, ~5x
faster on slot-shaped inputs.

Ordering: slot arrays are in sequence order (row-major, slots within a row
first), and the reshape preserves row-major order, so the compacted output
is the globally ordered minimizer stream.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_scan import (
    DROP,
    I32,
    LANES,
    _flat_rank_inclusive,
    _move_compact,
    _nbits,
)


def _slot_compact_kernel(mask_ref, *refs, k_cols: int, mr: int, G: int):
    col_refs = refs[:k_cols]
    out_refs = refs[k_cols : 2 * k_cols]
    count_ref = refs[2 * k_cols]

    m = mask_ref[0]  # [G, 128] int32 0/1
    rank = _flat_rank_inclusive(m)
    cnt = jnp.sum(m)
    ri = jax.lax.broadcasted_iota(I32, m.shape, dimension=0)
    li = jax.lax.broadcasted_iota(I32, m.shape, dimension=1)
    off = jnp.where(m != 0, (ri * LANES + li) - (rank - 1), DROP)
    cols = [r[0] for r in col_refs]
    cols = _move_compact(off, cols, _nbits(G * LANES))
    for c, oref in zip(cols, out_refs):
        oref[0] = c[:mr]
    count_ref[0] = jnp.full((8, LANES), cnt, dtype=I32)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def slot_compact(
    mask: jnp.ndarray,  # int32/bool [B, N] slot-validity, N % 1024 == 0
    cols: Sequence[jnp.ndarray],  # K arrays [B, N] int32
    m: int,
    interpret: bool = False,
) -> Tuple[list, jnp.ndarray]:
    """Ordered left-pack of slot elements; whole row resident in VMEM.

    Returns (list of int32 [B, M'] with M' = ceil(m/128)*128 — entries past
    the count are garbage, callers mask — and raw count int32[B]).
    Requires N*4B (x ~8 live tiles) to fit VMEM: N <= ~2M slots.
    """
    B, N = mask.shape
    if N % (8 * LANES):
        pad = -(-N // (8 * LANES)) * (8 * LANES) - N
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        cols = [jnp.pad(c, ((0, 0), (0, pad))) for c in cols]
        N += pad
    G = N // LANES
    # The packed stream can never exceed the N input slots: cap the kernel
    # output rows at G and pad host-side when the caller's capacity m is
    # larger (e.g. the exact-capacity single-read API path).
    mr = min(-(-m // LANES) + 2, G)
    k_cols = len(cols)

    in_spec = pl.BlockSpec(
        (1, G, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, mr, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (1, 8, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _slot_compact_kernel, k_cols=k_cols, mr=mr, G=G
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[in_spec] * (1 + k_cols),
        out_specs=tuple([out_spec] * k_cols + [cnt_spec]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B, mr, LANES), I32)] * k_cols
            + [jax.ShapeDtypeStruct((B, 8, LANES), I32)]
        ),
        interpret=interpret,
    )(
        mask.astype(I32).reshape(B, G, LANES),
        *[c.reshape(B, G, LANES) for c in cols],
    )
    counts = outs[k_cols][:, 0, 0]
    packed = [o.reshape(B, mr * LANES) for o in outs[:k_cols]]
    if mr * LANES < m:
        packed = [
            jnp.pad(p, ((0, 0), (0, m - mr * LANES))) for p in packed
        ]
    return packed, counts

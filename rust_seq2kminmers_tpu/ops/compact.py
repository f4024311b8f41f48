"""Masked stream compaction on TPU-friendly dense tensors.

The TPU analogue of AVX-512 `compressstoreu` (reference
src/nthash_avx512_32.rs:139-140, src/hpc.rs:104-108): given values[..., N]
and a boolean mask, produce the selected values left-packed into a
fixed-size buffer of M slots plus a valid count.  Order is preserved.

Strategies, selectable per call site:
  * bsearch (default): for each output slot m, an explicit vectorized
    binary search over the monotone inclusive cumsum finds the index of the
    (m+1)-th selected element; values are then plain gathers.  On TPU this
    is the fast path: cumsum and take_along_axis are cheap, while XLA
    scatter and vmapped searchsorted are orders of magnitude slower
    (measured on v5e: scatter ~318ms vs bsearch ~ms at [64, 1M] -> [64, 21k]).
  * scatter: destination index = cumsum(mask)-1, out-of-range writes
    dropped.  Kept as a reference implementation.
  * gather: vmapped jnp.searchsorted (reference implementation).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

I32 = jnp.int32


def compact_indices(
    mask: jnp.ndarray, m: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Positions of the first m True entries per row, via explicit binary
    search on the inclusive cumsum (monotone).

    -> (src int32[B, m] clamped in [0, N-1], valid bool[B, m],
        raw count int32[B]).
    """
    B, N = mask.shape
    csum = jnp.cumsum(mask.astype(I32), axis=-1)
    count = csum[:, -1]
    target = jnp.arange(1, m + 1, dtype=I32)[None, :]  # [1, m]
    lo = jnp.zeros((B, m), dtype=I32)
    hi = jnp.full((B, m), N - 1, dtype=I32)
    # Invariant: answer in [lo, hi]; csum[hi] >= target wherever valid.
    for _ in range(max(1, N.bit_length())):
        mid = (lo + hi) >> 1
        cm = jnp.take_along_axis(csum, mid, axis=-1)
        ge = cm >= target
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    valid = target <= count[:, None]
    return jnp.minimum(lo, N - 1), valid, count


def compact(
    mask: jnp.ndarray,
    values: Sequence[jnp.ndarray],
    m: int,
    fills: Sequence[jnp.ndarray | int],
    method: str = "auto",
) -> Tuple[list, jnp.ndarray]:
    """Left-pack `values[i][..., n]` where mask is True into M slots.

    mask: bool[B, N]; values: list of [B, N] arrays; returns (list of [B, M]
    arrays padded with the corresponding fill, raw count int32[B]).  Selected
    elements beyond M are dropped; the returned count is the *unclipped*
    number of selected elements so callers can detect overflow
    (count > M means truncation).

    Methods: "auto" (default: the streaming Pallas kernel on TPU — the only
    one with production throughput — and bsearch elsewhere), "pallas",
    "pallas_interpret", "bsearch", "scatter", "gather".
    """
    B, N = mask.shape
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "bsearch"
    if method in ("pallas", "pallas_interpret"):
        from .pallas.compact_kernel import GROUP, masked_compact

        npad = -(-N // GROUP) * GROUP - N
        if npad:
            mask = jnp.pad(mask, ((0, 0), (0, npad)))
            values = [jnp.pad(v, ((0, 0), (0, npad))) for v in values]
        interpret = (
            method == "pallas_interpret" or jax.default_backend() != "tpu"
        )
        packed, count = masked_compact(
            mask, list(values), m, interpret=interpret
        )
        valid = jnp.arange(m, dtype=I32)[None, :] < count[:, None]
        outs = []
        for p, fill in zip(packed, fills):
            p = p[:, :m]
            outs.append(
                jnp.where(valid, p, jnp.asarray(fill, dtype=p.dtype))
            )
        return outs, count
    if method == "bsearch":
        src, valid, count = compact_indices(mask, m)
        outs = []
        for v, fill in zip(values, fills):
            g = jnp.take_along_axis(v, src, axis=-1)
            outs.append(jnp.where(valid, g, jnp.asarray(fill, dtype=v.dtype)))
        return outs, count
    csum = jnp.cumsum(mask.astype(I32), axis=-1)
    count = csum[:, -1]
    if method == "scatter":
        dest = jnp.where(mask, csum - 1, m)  # m == out-of-range -> dropped
        outs = []
        for v, fill in zip(values, fills):
            init = jnp.full((B, m), fill, dtype=v.dtype)
            outs.append(
                init.at[jnp.arange(B, dtype=I32)[:, None], dest].set(
                    v, mode="drop"
                )
            )
        return outs, count
    elif method == "gather":
        # src[b, j] = index of the (j+1)-th True in mask[b]; N if none.
        targets = jnp.arange(1, m + 1, dtype=I32)
        src = jax.vmap(
            lambda cs: jnp.searchsorted(cs, targets, side="left")
        )(csum)
        valid = src < N
        src_c = jnp.minimum(src, N - 1)
        outs = []
        for v, fill in zip(values, fills):
            g = jnp.take_along_axis(v, src_c, axis=-1)
            outs.append(jnp.where(valid, g, jnp.asarray(fill, dtype=v.dtype)))
        return outs, count
    raise ValueError(f"unknown compaction method {method!r}")

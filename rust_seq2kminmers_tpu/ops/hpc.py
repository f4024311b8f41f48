"""Homopolymer compression (HPC) as mask + compaction.

TPU-native equivalent of the reference's fused scalar HPC
(src/nthash_hpc.rs:149,253-263) and the AVX-512 RLE kernel
(src/hpc.rs:44-147): keep-mask = (x[i] != x[i-1]), first element kept, then
left-pack the kept codes together with their original positions
(start-of-run convention, src/hpc.rs:7-25).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..constants import CODE_PAD
from .compact import I32, compact, compact_indices


def hpc_keep_mask(codes: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """bool[B, L]: True where codes[b, j] starts a new run, within length."""
    B, L = codes.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1), 255, dtype=codes.dtype), codes[:, :-1]], axis=-1
    )
    j = jnp.arange(L, dtype=I32)
    return (codes != prev) & (j[None, :] < lengths[:, None])


def hpc_compress(
    codes: jnp.ndarray, lengths: jnp.ndarray, method: str = "bsearch"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (hpc_codes uint8[B, L] padded with CODE_PAD,
           pos int32[B, L] original start-of-run positions (padded with L),
           hpc_len int32[B])."""
    B, L = codes.shape
    keep = hpc_keep_mask(codes, lengths)
    if method == "bsearch":
        # The compacted "position" value IS the source index, so only the
        # codes need an actual gather.
        src, valid, count = compact_indices(keep, L)
        pos = jnp.where(valid, src, L)
        hpc_codes = jnp.where(
            valid, jnp.take_along_axis(codes, src, axis=-1), CODE_PAD
        ).astype(codes.dtype)
        return hpc_codes, pos, count
    j = jnp.broadcast_to(jnp.arange(L, dtype=I32)[None, :], (B, L))
    (hpc_codes, pos), hpc_len = compact(
        keep, [codes, j], L, [CODE_PAD, L], method=method
    )
    return hpc_codes, pos, hpc_len

"""Homopolymer compression (HPC) as mask + compaction.

TPU-native equivalent of the reference's fused scalar HPC
(src/nthash_hpc.rs:149,253-263) and the AVX-512 RLE kernel
(src/hpc.rs:44-147): keep-mask = (raw_byte[i] != raw_byte[i-1]), first
element kept, then left-pack the kept codes together with their original
positions (start-of-run convention, src/hpc.rs:7-25).  The raw-byte
comparison is precomputed into xcode bit 3 by the host encoders
(constants.encode_xcodes / the native packer), so the device only reads it.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..constants import CODE_PAD, XCODE_KEEP
from .compact import I32, compact, compact_indices


def with_keep_bits_device(codes: jnp.ndarray) -> jnp.ndarray:
    """Device-side constants.with_keep_bits: stamp xcode keep bits onto a
    plain 3-bit code tensor [..., L], treating code equality as byte
    equality — for synthetic benchmark/test tensors generated on device.
    Real sequences get their keep bits from the host encoders."""
    low = codes & 7
    prev = jnp.roll(low, 1, axis=-1)
    j = jnp.arange(codes.shape[-1], dtype=I32)
    keep = (low != prev) | (j == 0)
    return (low | jnp.where(keep, 8, 0).astype(codes.dtype)).astype(
        codes.dtype
    )


def hpc_keep_mask(codes: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """bool[B, L]: True where codes[b, j] starts a new run (precomputed
    raw-byte-diff xcode bit), within length."""
    B, L = codes.shape
    j = jnp.arange(L, dtype=I32)
    return ((codes & XCODE_KEEP) != 0) & (j[None, :] < lengths[:, None])


def hpc_compress(
    codes: jnp.ndarray, lengths: jnp.ndarray, method: str = "auto"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (hpc_codes uint8[B, L] padded with CODE_PAD,
           pos int32[B, L] original start-of-run positions (padded with L),
           hpc_len int32[B])."""
    B, L = codes.shape
    keep = hpc_keep_mask(codes, lengths)
    if method == "auto":
        import jax

        method = "pallas" if jax.default_backend() == "tpu" else "bsearch"
    if method in ("pallas", "pallas_interpret"):
        pk, count = hpc_compress_packed(codes, lengths, method)
        pos = pk >> 3
        hpc_codes = (pk & 7).astype(codes.dtype)
        return hpc_codes, pos, count
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


def pack_pos_code(codes: jnp.ndarray) -> jnp.ndarray:
    """(j << 3) | code packing of a code tensor (identity position map)."""
    B, L = codes.shape
    if L >= (1 << 28):
        raise ValueError("padded length must be < 2^28 for packed streams")
    j = jnp.arange(L, dtype=I32)[None, :]
    return (jnp.broadcast_to(j, (B, L)) << 3) | (codes.astype(I32) & 7)


def hpc_compress_packed(
    codes: jnp.ndarray, lengths: jnp.ndarray, method: str = "pallas"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HPC compaction in packed (pos << 3 | code) form: ONE int32 column —
    halves kernel VMEM and HBM traffic for the dense (m = L) compaction.

    -> (packed int32[B, L] — garbage beyond count, hpc_len int32[B])."""
    B, L = codes.shape
    keep = hpc_keep_mask(codes, lengths)
    packed = pack_pos_code(codes)
    (pk,), count = compact(
        keep, [packed], L, [I32((L << 3) | CODE_PAD)], method=method
    )
    return pk, count

"""NtHash1 seed constants and base-code tables.

Semantics reproduced from the reference crate rust-seq2kminmers:
  - 64-bit published NtHash1 seeds (reference: src/nthash_hpc.rs:30-49,
    src/nthash_avx512_32.rs:233-236).
  - With the reference's active configuration H = u32 (src/lib.rs:31) the
    lookup tables are the *low 32 bits* of the 64-bit seeds (the `as H` cast
    at src/nthash_hpc.rs:32-36; `SHIFT = 0` in the SIMD path,
    src/nthash_avx512_32.rs:238-240).
  - Unknown (non-ACGTN) bytes hash to 1 in the scalar tables
    (src/nthash_hpc.rs:31) and N hashes to 0 (src/nthash_hpc.rs:36).

Base codes follow the SIMD 3-bit LUT (src/nthash_avx512_32.rs:183-184):
A=0, C=1, G=2, T=3, N=4.  We add OTHER=5 (scalar table default seed 1) and
PAD=6 (padding sentinel for batched tensors; hashes to 0 and never forms a
valid window).
"""

from __future__ import annotations

import numpy as np

# 64-bit canonical NtHash1 seeds.
SEED_A64 = 0x3C8BFBB395C60474
SEED_C64 = 0x3193C18562A02B4C
SEED_G64 = 0x20323ED082572324
SEED_T64 = 0x295549F54BE24456

MASK32 = 0xFFFFFFFF
U32_MAX = 0xFFFFFFFF
U64_MAX = 0xFFFFFFFFFFFFFFFF

# Low 32 bits — the active H=u32 configuration of the reference.
SEED_A = SEED_A64 & MASK32
SEED_C = SEED_C64 & MASK32
SEED_G = SEED_G64 & MASK32
SEED_T = SEED_T64 & MASK32


def seed_tables(hash_width: int):
    """(forward, reverse-complement) seed tables truncated to the configured
    hash width — the reference's `as H` cast (src/nthash_hpc.rs:32-36)
    keeps the LOW `hash_width` bits of the 64-bit published seeds.

    Returned dtype: uint16 / uint32 / uint64 indexed by base code.
    """
    if hash_width == 64:
        dt, mask = np.uint64, U64_MAX
    elif hash_width == 32:
        dt, mask = np.uint32, MASK32
    elif hash_width == 16:
        dt, mask = np.uint16, 0xFFFF
    else:
        raise ValueError(f"hash_width must be 16/32/64, got {hash_width}")
    seeds = [SEED_A64, SEED_C64, SEED_G64, SEED_T64]
    f = np.array([s & mask for s in seeds] + [0, 1 & mask, 0], dtype=dt)
    r = np.array(
        [seeds[3] & mask, seeds[2] & mask, seeds[1] & mask, seeds[0] & mask]
        + [0, 1 & mask, 0],
        dtype=dt,
    )
    return f, r


def seed_tables_nthash2_31():
    """Seed tables for the NtHash2-hybrid 31-bit variant (reference
    src/nthash2_avx512_32.rs:238-259): the TOP 31 bits of the 64-bit seeds
    (`SEED >> 33`), values < 2^31, rotates mod 31.  This variant exists for
    l > 31, where 32-bit NtHash1 degenerates (src/nthash2_avx512_32.rs:4-6).
    """
    seeds = [SEED_A64, SEED_C64, SEED_G64, SEED_T64]
    f = np.array([s >> 33 for s in seeds] + [0, 1, 0], dtype=np.uint32)
    r = np.array(
        [seeds[3] >> 33, seeds[2] >> 33, seeds[1] >> 33, seeds[0] >> 33]
        + [0, 1, 0],
        dtype=np.uint32,
    )
    return f, r


def hash_bound_nthash2_31(density: float) -> int:
    """NtHash2-31 bound: the f32-recomputed SIMD bound halved — 31-bit
    hash space is half of 32-bit (src/nthash2_avx512_32.rs:53-54; the
    reference's comment calls the /2 unexplained, but it is exactly the
    space-size correction)."""
    return hash_bound_simd_u32(density) // 2

# Base codes (order matches the reference SIMD LUT at
# src/nthash_avx512_32.rs:183-184 which maps A->0 C->1 G->2 T->3 N->4).
CODE_A = 0
CODE_C = 1
CODE_G = 2
CODE_T = 3
CODE_N = 4
CODE_OTHER = 5
CODE_PAD = 6
NUM_CODES = 7

# Forward-strand seed per code; rc = complement's seed
# (src/nthash_hpc.rs:41-49).  N -> 0; OTHER -> 1 (scalar table default);
# PAD -> 0 (never part of a valid window).
SEED_TABLE_F = np.array(
    [SEED_A, SEED_C, SEED_G, SEED_T, 0, 1, 0], dtype=np.uint32
)
SEED_TABLE_R = np.array(
    [SEED_T, SEED_G, SEED_C, SEED_A, 0, 1, 0], dtype=np.uint32
)

# ---------------------------------------------------------------------------
# Per-mode-family byte -> 3-bit hash-code tables.
#
# The reference has TWO distinct byte conventions:
#   * scalar paths (Regular via the nthash32 crate, Hpc via the fused
#     iterator): 256-entry lookup with default seed 1 and ONLY uppercase
#     ACGT + N populated (src/nthash_hpc.rs:30-49) — lowercase and every
#     other byte hash as "other" (seed 1).
#   * SIMD paths (Simd/HpcSimd): the 16-entry low-nibble LUT
#     `_mm_set_epi8(4,4,4,4,4,4,4,4, 2,4,4,3, 1,4,0,4)` applied to
#     `byte & 0x0f` (src/nthash_avx512_32.rs:178-193) — case-folded, and
#     EVERY non-base nibble maps to code 4 (N, seed 0); e.g. b'Q' (& 15 ==
#     1) hashes as 'A'.
BYTE_TO_CODE_SCALAR = np.full(256, CODE_OTHER, dtype=np.uint8)
for _b, _c in [
    (ord("A"), CODE_A),
    (ord("C"), CODE_C),
    (ord("G"), CODE_G),
    (ord("T"), CODE_T),
    (ord("N"), CODE_N),
]:
    BYTE_TO_CODE_SCALAR[_b] = _c

# nibble -> code, args of the reference _mm_set_epi8 reversed (e0 first).
_SIMD_NIBBLE_LUT = np.array(
    [4, 0, 4, 1, 3, 4, 4, 2, 4, 4, 4, 4, 4, 4, 4, 4], dtype=np.uint8
)
BYTE_TO_CODE_SIMD = _SIMD_NIBBLE_LUT[np.arange(256) & 0x0F]

# Legacy single-table alias (case-folded, other->OTHER); retained for
# synthetic/test helpers only — the pipeline encoders below are per-family.
BYTE_TO_CODE = BYTE_TO_CODE_SCALAR.copy()
for _b, _c in [
    (ord("a"), CODE_A),
    (ord("c"), CODE_C),
    (ord("g"), CODE_G),
    (ord("t"), CODE_T),
    (ord("n"), CODE_N),
]:
    BYTE_TO_CODE[_b] = _c

CODE_TO_BYTE = np.frombuffer(b"ACGTN??", dtype=np.uint8).copy()

# ---------------------------------------------------------------------------
# xcode representation: the pipeline input value for one base is ONE byte
#     xcode = (keep << 3) | hash_code3,   keep = raw_byte[i] != raw_byte[i-1]
# (keep = 1 at i = 0).  The HPC keep-mask is thus *precomputed against raw
# bytes* on the streaming host — full raw-byte identity, exactly like the
# reference's raw-byte run comparison (src/nthash_hpc.rs:253-263,
# src/hpc.rs:88): runs of distinct non-ACGTN bytes that share a hash code
# survive.  Hashing reads only the low 3 bits.  One byte per base halves
# host->device wire traffic and host packing writes vs a 16-bit format, and
# the device kernels never need a cross-block "previous char" carry.
XCODE_KEEP = 8  # bit 3: this base differs from the previous raw byte
XCODE_PAD = XCODE_KEEP | CODE_PAD  # pad: code 6, keep set (inert: masked
# off by per-read length everywhere it could matter)


def family_of_mode(mode: str) -> str:
    """Hash-table family of a mode: scalar (regular/hpc) or simd."""
    return "simd" if mode in ("simd", "hpcsimd") else "scalar"


def code_table(family: str) -> np.ndarray:
    """256-entry byte -> 3-bit hash-code table of a mode family."""
    if family == "scalar":
        return BYTE_TO_CODE_SCALAR
    if family == "simd":
        return BYTE_TO_CODE_SIMD
    raise ValueError(f"unknown table family {family!r}")


def with_keep_bits(codes: np.ndarray) -> np.ndarray:
    """Stamp xcode keep bits onto a plain 3-bit code array (1-D or [B, L]),
    treating code equality as byte equality — for synthetic/test tensors
    whose bases were never real bytes.  Real sequence paths (encode_xcodes,
    the native packer) compare raw bytes instead."""
    codes = np.asarray(codes)
    low = codes & 7
    prev = np.roll(low, 1, axis=-1)
    keep = low != prev
    keep[..., 0] = True
    return (low | np.where(keep, XCODE_KEEP, 0)).astype(np.uint8)


def _to_byte_array(seq: bytes | str | np.ndarray) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode("latin-1")
    return np.frombuffer(bytes(seq), dtype=np.uint8) if not isinstance(
        seq, np.ndarray
    ) else seq.astype(np.uint8, copy=False)


def encode_xcodes(
    seq: bytes | str | np.ndarray, family: str = "scalar"
) -> np.ndarray:
    """ASCII sequence -> uint8 xcode array ((raw-byte-diff keep << 3) |
    hash_code3).  Large inputs — str (read zero-copy from the UCS1
    buffer), bytes, and C-contiguous uint8 ndarrays (via the buffer
    protocol) — go through the native AVX-512 encoder
    (io/native/rle_kernels.h xcode_dispatch; ~10-20 GB/s vs ~0.15 GB/s
    for the numpy fancy-index path)."""
    native_ok = len(seq) >= 4096 and (
        not isinstance(seq, np.ndarray)
        or (
            seq.ndim == 1
            and seq.dtype == np.uint8
            and seq.flags["C_CONTIGUOUS"]
        )
    )
    if native_ok:
        try:
            from .io.native_ext import load_ext

            ext = load_ext()
        except Exception:  # pragma: no cover — loader failure
            ext = None
        if ext is not None and hasattr(ext, "xcode"):
            try:
                return ext.xcode(seq, code_table(family))
            except ValueError:  # non-latin-1 str: fall through to numpy
                pass
    b = _to_byte_array(seq)
    codes = code_table(family)[b]
    if len(b) == 0:
        return codes
    keep = np.empty(len(b), dtype=bool)
    keep[0] = True
    np.not_equal(b[1:], b[:-1], out=keep[1:])
    return codes | np.where(keep, np.uint8(XCODE_KEEP), np.uint8(0))


def encode_bases(seq: bytes | str | np.ndarray) -> np.ndarray:
    """ASCII sequence -> uint8 3-bit code array (legacy case-folded table:
    A=0 C=1 G=2 T=3 N=4 other=5).  Exact for ACGTN-only uppercase input;
    use encode_xcodes for full per-family byte fidelity."""
    return BYTE_TO_CODE[_to_byte_array(seq)]


def hash_bound_u32(density: float) -> int:
    """Scalar-path density bound: trunc(density * u32::MAX) (src/lib.rs:91)."""
    return min(U32_MAX, int(np.float64(density) * np.float64(U32_MAX)))


def hash_bound(density: float, hash_width: int) -> int:
    """Generic `((density as FH) * (H::MAX as FH)) as H` (src/lib.rs:91) for
    the configured hash width (FH = f64, the reference's active float type,
    src/lib.rs:34).  Note for H=u64 `u64::MAX as f64` rounds to 2^64."""
    hmax = (1 << hash_width) - 1
    b = int(np.float64(density) * np.float64(hmax))
    return min(hmax, max(0, b))


def hash_bound_simd_u32(density: float) -> int:
    """SIMD-path bound.

    The reference recomputes the bound through f32
    (src/nthash_avx512_32.rs:47-48): density' = bound/H::MAX in f64, then
    `(density' as f32) * (u32::MAX as f32)` in f32 arithmetic, truncated.
    Note `u32::MAX as f32` rounds to 4294967296.0.
    """
    bound = hash_bound_u32(density)
    d2 = np.float64(bound) / np.float64(U32_MAX)
    prod = np.float32(d2) * np.float32(np.float64(U32_MAX))
    # Rust `as u32` saturates.
    prod64 = float(prod)
    if prod64 <= 0.0:
        return 0
    if prod64 >= float(U32_MAX):
        return U32_MAX
    return int(prod64)

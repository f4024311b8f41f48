"""String-level HPC utilities mirroring the reference's public HPC API
(reference src/hpc.rs: `hpc`, `encode_rle`, `encode_rle_simd`).

These are host-side utilities (native C++ kernel in io/native when
available, vectorized numpy fallback); the TPU pipeline uses the
mask+compaction form in ops/hpc.py.  Each function reproduces its reference
counterpart's exact nuance:

  * hpc(s)            — collapse runs of ANY character (src/hpc.rs:28-41).
  * encode_rle(s)     — collapse runs only of characters in "ACTGactgNn"
                        (src/hpc.rs:14); also return the original start
                        position of every kept char (src/hpc.rs:7-25).
  * encode_rle_simd(s)— collapse runs of ANY byte, positions as uint32
                        (src/hpc.rs:44-147).

For ACGTN-only input all three agree (asserted by the reference test at
tests/main.rs:76-78).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

_RLE_COLLAPSIBLE = np.zeros(256, dtype=bool)
for _c in b"ACTGactgNn":
    _RLE_COLLAPSIBLE[_c] = True


def _to_bytes(s) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode()
    return np.frombuffer(bytes(s), dtype=np.uint8)


def _native_rle(b: np.ndarray, collapse_any: bool):
    """Run the C++ s2k_hpc_rle kernel if the native lib is available;
    returns (kept chars uint8, kept positions int64) or None."""
    from .io.fasta import _load_native

    lib = _load_native()
    if lib is None:
        return None
    import ctypes

    b = np.ascontiguousarray(b)
    chars = np.empty(len(b), dtype=np.uint8)
    pos = np.empty(len(b), dtype=np.int64)
    m = lib.s2k_hpc_rle(
        b.ctypes.data_as(ctypes.c_void_p),
        len(b),
        1 if collapse_any else 0,
        chars.ctypes.data_as(ctypes.c_void_p),
        pos.ctypes.data_as(ctypes.c_void_p),
    )
    return chars[:m], pos[:m]


def hpc(s) -> str:
    """Collapse runs of any repeated character."""
    b = _to_bytes(s)
    if len(b) == 0:
        return ""
    nat = _native_rle(b, True)
    if nat is not None:
        return nat[0].tobytes().decode("latin-1")
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = b[1:] != b[:-1]
    return b[keep].tobytes().decode("latin-1")


def encode_rle(s) -> Tuple[str, List[int]]:
    """Collapse runs of ACTG/actg/N/n only; runs of other characters are
    kept verbatim.  Returns (hpc_string, start positions of kept chars)."""
    b = _to_bytes(s)
    if len(b) == 0:
        return "", []
    nat = _native_rle(b, False)
    if nat is not None:
        return nat[0].tobytes().decode("latin-1"), nat[1].tolist()
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = (b[1:] != b[:-1]) | ~_RLE_COLLAPSIBLE[b[1:]]
    pos = np.nonzero(keep)[0]
    return b[pos].tobytes().decode("latin-1"), pos.tolist()


def encode_rle_simd(s) -> Tuple[str, np.ndarray]:
    """Collapse runs of any byte; positions returned as uint32 array."""
    b = _to_bytes(s)
    if len(b) == 0:
        return "", np.zeros(0, dtype=np.uint32)
    nat = _native_rle(b, True)
    if nat is not None:
        return (
            nat[0].tobytes().decode("latin-1"),
            nat[1].astype(np.uint32),
        )
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = b[1:] != b[:-1]
    pos = np.nonzero(keep)[0].astype(np.uint32)
    return b[keep].tobytes().decode("latin-1"), pos

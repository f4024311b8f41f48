"""String-level HPC utilities mirroring the reference's public HPC API
(reference src/hpc.rs: `hpc`, `encode_rle`, `encode_rle_simd`).

These are host-side utilities (vectorized numpy); the TPU pipeline uses the
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


def hpc(s) -> str:
    """Collapse runs of any repeated character."""
    b = _to_bytes(s)
    if len(b) == 0:
        return ""
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = b[1:] != b[:-1]
    return b[keep].tobytes().decode("latin-1")


def encode_rle(s) -> Tuple[str, List[int]]:
    """Collapse runs of ACTG/actg/N/n only; runs of other characters are
    kept verbatim.  Returns (hpc_string, start positions of kept chars)."""
    b = _to_bytes(s)
    if len(b) == 0:
        return "", []
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = (b[1:] != b[:-1]) | ~_RLE_COLLAPSIBLE[b[1:]]
    pos = np.nonzero(keep)[0]
    return b[pos].tobytes().decode("latin-1"), pos.tolist()


def encode_rle_simd(s) -> Tuple[str, np.ndarray]:
    """Collapse runs of any byte; positions returned as uint32 array."""
    b = _to_bytes(s)
    if len(b) == 0:
        return "", np.zeros(0, dtype=np.uint32)
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = b[1:] != b[:-1]
    pos = np.nonzero(keep)[0].astype(np.uint32)
    return b[keep].tobytes().decode("latin-1"), pos

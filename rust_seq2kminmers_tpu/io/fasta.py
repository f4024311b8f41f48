"""FASTA/FASTQ input: native C++ reader (ctypes) with a Python fallback.

Replaces the reference's rust-parallelfastx dependency (mmap-based parser
with thread-parallel record dispatch, reference src/main.rs:79).  The native
library is compiled on first use with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..constants import (
    BYTE_TO_CODE,
    CODE_PAD,
    XCODE_PAD,
    code_table,
    encode_xcodes,
)

_NATIVE_DIR = Path(__file__).parent / "native"
_SRC = _NATIVE_DIR / "fasta_reader.cpp"
_SO = _NATIVE_DIR / "build" / "libs2kfasta.so"
_lock = threading.Lock()
_lib = None
_native_failed = False


def _load_native():
    global _lib, _native_failed
    with _lock:
        if _lib is not None or _native_failed:
            return _lib
        try:
            src_mtime = max(
                _SRC.stat().st_mtime,
                (_NATIVE_DIR / "rle_kernels.h").stat().st_mtime,
            )
            if not _SO.exists() or _SO.stat().st_mtime < src_mtime:
                _SO.parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-std=c++17",
                        "-shared", "-fPIC", "-pthread",
                        str(_SRC), "-o", str(_SO),
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO))
            lib.s2k_open.restype = ctypes.c_void_p
            lib.s2k_open.argtypes = [ctypes.c_char_p]
            lib.s2k_num_records.restype = ctypes.c_int64
            lib.s2k_num_records.argtypes = [ctypes.c_void_p]
            lib.s2k_max_seq_len.restype = ctypes.c_int64
            lib.s2k_max_seq_len.argtypes = [ctypes.c_void_p]
            lib.s2k_seq_len.restype = ctypes.c_int64
            lib.s2k_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.s2k_name.restype = ctypes.c_int64
            lib.s2k_name.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int64,
            ]
            lib.s2k_pack.restype = ctypes.c_int64
            lib.s2k_pack.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.s2k_packx.restype = ctypes.c_int64
            lib.s2k_packx.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_uint8,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.s2k_packx_idx.restype = ctypes.c_int64
            lib.s2k_packx_idx.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_uint8,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.s2k_seq_lens.restype = None
            lib.s2k_seq_lens.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.s2k_hpc_rle32.restype = ctypes.c_int64
            lib.s2k_hpc_rle32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.s2k_hpc_rle64.restype = ctypes.c_int64
            lib.s2k_hpc_rle64.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.s2k_close.restype = None
            lib.s2k_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _native_failed = True
            _lib = None
        return _lib


class FastaFile:
    """Indexed FASTA/FASTQ file with batched packed-tensor reads."""

    def __init__(self, path, prefer_native: bool = True):
        self.path = str(path)
        self._handle = None
        self._lib = _load_native() if prefer_native else None
        if self._lib is not None:
            self._handle = self._lib.s2k_open(self.path.encode())
            if not self._handle:
                self._lib = None
        if self._lib is None:
            self._py_records = _py_index(self.path)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __len__(self) -> int:
        if self.native:
            return int(self._lib.s2k_num_records(self._handle))
        return len(self._py_records)

    def max_seq_len(self) -> int:
        if self.native:
            return int(self._lib.s2k_max_seq_len(self._handle))
        return max((len(s) for _, s in self._py_records), default=0)

    def seq_len(self, i: int) -> int:
        if self.native:
            return int(self._lib.s2k_seq_len(self._handle, i))
        return len(self._py_records[i][1])

    def seq_lens(self) -> np.ndarray:
        """All record lengths at once (int64[n])."""
        n = len(self)
        if self.native:
            out = np.empty(n, dtype=np.int64)
            self._lib.s2k_seq_lens(
                self._handle, out.ctypes.data_as(ctypes.c_void_p)
            )
            return out
        return np.array(
            [len(s) for _, s in self._py_records], dtype=np.int64
        )

    def pack_indices(
        self,
        indices,
        max_len: int,
        threads: int = 0,
        family: str = "scalar",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Gather-pack arbitrary record indices into uint8 xcodes
        ((raw-byte-diff keep << 3) | code, for length-bucketed batching):
        -> (codes uint8[len(indices), max_len], lengths int64)."""
        idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
        count = len(idx)
        codes = np.empty((count, max_len), dtype=np.uint8)
        lengths = np.empty(count, dtype=np.int64)
        if count == 0:
            return codes, lengths
        if self.native:
            table = np.ascontiguousarray(code_table(family))
            self._lib.s2k_packx_idx(
                self._handle,
                idx.ctypes.data_as(ctypes.c_void_p),
                count,
                max_len,
                table.ctypes.data_as(ctypes.c_void_p),
                XCODE_PAD,
                codes.ctypes.data_as(ctypes.c_void_p),
                lengths.ctypes.data_as(ctypes.c_void_p),
                threads,
            )
        else:
            for i, r in enumerate(idx):
                if r < 0 or r >= len(self._py_records):
                    codes[i] = XCODE_PAD
                    lengths[i] = 0
                    continue
                _, s = self._py_records[r]
                x = encode_xcodes(s, family)[:max_len]
                codes[i, : len(x)] = x
                codes[i, len(x):] = XCODE_PAD
                lengths[i] = len(x)
        return codes, lengths

    def name(self, i: int) -> str:
        if self.native:
            buf = ctypes.create_string_buffer(4096)
            n = self._lib.s2k_name(self._handle, i, buf, 4096)
            return buf.raw[:n].decode(errors="replace")
        return self._py_records[i][0]

    def pack(
        self,
        first: int = 0,
        count: Optional[int] = None,
        max_len: Optional[int] = None,
        threads: int = 0,
        family: Optional[str] = "scalar",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (codes[count, max_len], lengths int64[count] clipped).

        family="scalar"|"simd" (default scalar) packs exact-fidelity uint8
        xcodes ((raw-byte-diff keep << 3) | per-family hash code, padded
        with XCODE_PAD); family=None packs the legacy quantized plain codes
        (case-folded, non-ACGTN -> OTHER, padded with CODE_PAD, no keep
        bits)."""
        n = len(self)
        if count is None:
            count = n - first
        count = max(0, min(count, n - first))
        if max_len is None:
            max_len = self.max_seq_len()
        codes = np.empty((count, max_len), dtype=np.uint8)
        lengths = np.empty(count, dtype=np.int64)
        if count == 0:
            return codes, lengths
        if self.native:
            if family is None:
                got = self._lib.s2k_pack(
                    self._handle,
                    first,
                    count,
                    max_len,
                    codes.ctypes.data_as(ctypes.c_void_p),
                    lengths.ctypes.data_as(ctypes.c_void_p),
                    threads,
                )
            else:
                table = np.ascontiguousarray(code_table(family))
                got = self._lib.s2k_packx(
                    self._handle,
                    first,
                    count,
                    max_len,
                    table.ctypes.data_as(ctypes.c_void_p),
                    XCODE_PAD,
                    codes.ctypes.data_as(ctypes.c_void_p),
                    lengths.ctypes.data_as(ctypes.c_void_p),
                    threads,
                )
            assert got == count
        else:
            for i in range(count):
                _, s = self._py_records[first + i]
                if family is None:
                    b = np.frombuffer(
                        s.encode("latin-1"), dtype=np.uint8
                    )[:max_len]
                    codes[i, : len(b)] = BYTE_TO_CODE[b]
                    codes[i, len(b):] = CODE_PAD
                    lengths[i] = len(b)
                else:
                    x = encode_xcodes(s, family)[:max_len]
                    codes[i, : len(x)] = x
                    codes[i, len(x):] = XCODE_PAD
                    lengths[i] = len(x)
        return codes, lengths

    def batches(
        self,
        batch_size: int,
        max_len: Optional[int] = None,
        threads: int = 0,
        family: Optional[str] = "scalar",
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        """Yield (codes, lengths, first_record_index) over the whole file."""
        if max_len is None:
            max_len = self.max_seq_len()
        n = len(self)
        for first in range(0, n, batch_size):
            codes, lengths = self.pack(
                first, min(batch_size, n - first), max_len, threads, family
            )
            yield codes, lengths, first

    def close(self):
        if self.native and self._handle:
            self._lib.s2k_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _py_index(path: str) -> List[Tuple[str, str]]:
    """Pure-Python fallback parser (FASTA multi-line + FASTQ 4-line)."""
    records: List[Tuple[str, str]] = []
    with open(path) as f:
        first = f.read(1)
        f.seek(0)
        if first == "@":
            while True:
                hdr = f.readline()
                if not hdr:
                    break
                seq = f.readline().strip()
                f.readline()  # +
                f.readline()  # qual
                if hdr.startswith("@"):
                    records.append((hdr[1:].strip(), seq))
        else:
            name, chunks = None, []
            for line in f:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if name is not None:
                        records.append((name, "".join(chunks)))
                    name, chunks = line[1:], []
                elif name is not None:
                    chunks.append(line)
            if name is not None:
                records.append((name, "".join(chunks)))
    return records

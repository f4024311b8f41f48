"""Loader for the s2kext CPython extension (zero-copy host RLE kernels).

The extension (io/native/s2kext.cpp + rle_kernels.h) compress-stores kept
chars directly into the result str's UCS1 buffer and positions into an
exact-dtype numpy array, with the GIL released around the AVX-512 kernel —
no intermediate buffers, no per-element Python conversion.  It is compiled
on first use with g++ and cached next to the source (same pattern as the
ctypes library in io/fasta.py); any failure falls back silently to the
ctypes/numpy paths in hpc_strings.py.
"""

from __future__ import annotations

import importlib.util
import subprocess
import sysconfig
import threading
from pathlib import Path

_DIR = Path(__file__).parent / "native"
_SRC = _DIR / "s2kext.cpp"
_HDR = _DIR / "rle_kernels.h"
_lock = threading.Lock()
_mod = None
_failed = False


def load_ext():
    global _mod, _failed
    with _lock:
        if _mod is not None or _failed:
            return _mod
        try:
            import numpy as np

            suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
            so = _DIR / "build" / f"s2kext{suffix}"
            src_mtime = max(_SRC.stat().st_mtime, _HDR.stat().st_mtime)
            if not so.exists() or so.stat().st_mtime < src_mtime:
                so.parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-std=c++17",
                        "-shared", "-fPIC", "-pthread",
                        f"-I{sysconfig.get_paths()['include']}",
                        f"-I{np.get_include()}",
                        str(_SRC), "-o", str(so),
                    ],
                    check=True,
                    capture_output=True,
                )
            spec = importlib.util.spec_from_file_location("s2kext", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _mod = mod
        except Exception:
            _failed = True
            _mod = None
        return _mod

"""Build/load the native host-I/O library (tiffio.cc → libbstnative.so).

The .so is compiled on first use (g++ -O2, links zlib) and cached next to the
sources; rebuilds automatically when a source file is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent
_SOURCES = ["tiffio.cc", "geom.cc"]
_LIB = _NATIVE_DIR / "libbstnative.so"

_handle: ctypes.CDLL | None = None


def _needs_build() -> bool:
    if not _LIB.exists():
        return True
    lib_mtime = _LIB.stat().st_mtime
    return any(
        (_NATIVE_DIR / s).exists() and (_NATIVE_DIR / s).stat().st_mtime > lib_mtime
        for s in _SOURCES
    )


def build() -> Path:
    srcs = [str(_NATIVE_DIR / s) for s in _SOURCES if (_NATIVE_DIR / s).exists()]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", str(_LIB), *srcs, "-lz"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def load() -> ctypes.CDLL:
    """Load (building if stale). Set BEACH_SEG_TPU_NO_NATIVE=1 to force the
    NumPy fallbacks in geo/rasterize.py and geo/contours.py (the TIFF codec
    has no fallback and always requires the native library)."""
    global _handle
    if os.environ.get("BEACH_SEG_TPU_NO_NATIVE"):
        raise RuntimeError("native library disabled via BEACH_SEG_TPU_NO_NATIVE")
    if _handle is None:
        if _needs_build():
            build()
        _handle = ctypes.CDLL(str(_LIB))
    return _handle

"""ctypes bindings to the native (C++) data-loading runtime.

Wraps ``native/build/libafdm_native.so`` (see ``native/csv_loader.cpp``):
fast single-pass CSV parsing, deterministic Fisher-Yates permutations, and
batch gathering. The library is compiled ON FIRST USE when absent (one
``g++ -O3`` invocation, a few seconds — ``AFDM_NATIVE_BUILD=0`` opts out),
so a fresh checkout runs the C++ host path without a manual ``make -C
native``. Everything still degrades gracefully to the pure-numpy path when
compilation isn't possible (no g++, read-only tree) — the framework never
*requires* the native layer, and either way the active path is recorded in
every run artifact (``impl_flags.impl_report``: ``native_loader``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import platform
import shutil
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
# The cached .so is keyed by the host architecture so a source tree shared
# across heterogeneous hosts (NFS, reused container image) never loads a
# binary built for a different CPU. On x86_64 the build targets the portable
# x86-64-v3 baseline (AVX2-era, 2015+) instead of -march=native for the same
# reason; other arches get plain -O3.
_ARCH = platform.machine() or "unknown"
_LIB_CANDIDATES = (
    os.environ.get("AFDM_NATIVE_LIB", ""),
    os.path.join(_NATIVE_DIR, "build", f"libafdm_native-{_ARCH}.so"),
)


def _autobuild() -> str | None:
    """First-use compile of the native library; None when not possible.

    Writes to a pid-suffixed temp file and ``os.replace``s it into place so
    concurrent processes racing the build still each load a complete .so.
    """
    if os.environ.get("AFDM_NATIVE_BUILD", "1") == "0":
        return None
    src = os.path.join(_NATIVE_DIR, "csv_loader.cpp")
    gxx = shutil.which("g++")
    if gxx is None or not os.path.exists(src):
        return None
    build_dir = os.path.join(_NATIVE_DIR, "build")
    final = os.path.join(build_dir, f"libafdm_native-{_ARCH}.so")
    tmp = os.path.join(build_dir, f".libafdm_native.{os.getpid()}.so")
    arch_flags = ["-march=x86-64-v3"] if _ARCH in ("x86_64", "AMD64") else []
    try:
        os.makedirs(build_dir, exist_ok=True)
        subprocess.run(
            [gxx, "-O3", *arch_flags, "-std=c++17", "-fPIC", "-shared",
             src, "-o", tmp],
            check=True, capture_output=True, timeout=300,
        )
        os.replace(tmp, final)
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native loader auto-build skipped (%s); numpy path active", e)
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    logger.info("native loader compiled on first use: %s", final)
    return final


# Manual memo instead of lru_cache so the probe-only path
# (``load_native(autobuild=False)``, used by impl_report) never poisons the
# cache: a later data-path call can still trigger the first-use build.
_cache: dict = {"lib": None, "build_tried": False}


def load_native(autobuild: bool = True):
    """Return the loaded CDLL or None.

    ``autobuild=True`` (the data path) compiles the library on first use;
    ``autobuild=False`` (status probes like ``impl_flags.impl_report``) only
    reports what already exists — rendering a settings dump must not spawn a
    g++ compile as a side effect (ADVICE r4).
    """
    if _cache["lib"] is not None:
        return _cache["lib"]
    candidates = [c for c in _LIB_CANDIDATES if c and os.path.exists(c)]
    if not candidates and autobuild and not _cache["build_tried"]:
        _cache["build_tried"] = True
        built = _autobuild()
        if built:
            candidates = [built]
    for cand in candidates:
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(os.path.abspath(cand))
            except OSError:
                continue
            lib.afdm_csv_count_rows.restype = ctypes.c_int64
            lib.afdm_csv_count_rows.argtypes = [ctypes.c_char_p]
            lib.afdm_parse_label_pixel_csv.restype = ctypes.c_int64
            lib.afdm_parse_label_pixel_csv.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.afdm_shuffled_permutation.restype = None
            lib.afdm_shuffled_permutation.argtypes = [
                ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.afdm_gather_batch.restype = None
            lib.afdm_gather_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            _cache["lib"] = lib
            return lib
    return None


def native_available() -> bool:
    return load_native() is not None


def native_status() -> str:
    """Probe-only status for run artifacts: never triggers a build."""
    if load_native(autobuild=False) is not None:
        return "loaded"
    if any(c and os.path.exists(c) for c in _LIB_CANDIDATES):
        return "present (not loaded)"
    return "not built (autobuilds on first data use)"


def parse_label_pixel_csv(path: str, cols: int = 784):
    """(labels int32 [N], pixels float32 [N, cols] in [0,1]) via C++;
    None if the native library is unavailable or parsing fails."""
    lib = load_native()
    if lib is None:
        return None
    n = lib.afdm_csv_count_rows(path.encode())
    if n <= 0:
        return None
    labels = np.empty(n, np.int32)
    pixels = np.empty((n, cols), np.float32)
    got = lib.afdm_parse_label_pixel_csv(
        path.encode(), cols,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
    )
    if got <= 0:
        return None
    return labels[:got], pixels[:got]


def shuffled_permutation(n: int, seed: int, epoch: int) -> np.ndarray | None:
    lib = load_native()
    if lib is None:
        return None
    out = np.empty(n, np.int64)
    lib.afdm_shuffled_permutation(
        n, seed, epoch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    )
    return out


def gather_batch(images: np.ndarray, perm: np.ndarray, start: int,
                 bsz: int) -> np.ndarray | None:
    """Contiguous batch gather through the C++ path (images: [N, ...] f32)."""
    lib = load_native()
    if lib is None:
        return None
    flat = np.ascontiguousarray(images.reshape(images.shape[0], -1))
    stride = flat.shape[1]
    out = np.empty((bsz, stride), np.float32)
    lib.afdm_gather_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(perm, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        start, bsz, stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape((bsz,) + images.shape[1:])

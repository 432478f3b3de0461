"""ctypes loader for the native tier (librayeater.so).

Auto-builds with make/g++ on first use (cached next to the sources);
callers fall back to pure-Python paths when unavailable — the native tier
is an accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils.logging import scoped

_log = scoped("native")
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librayeater.so")
_lib = None
_tried = False


def _build_locked():
    """Run make under an exclusive flock so concurrent first-use builds
    (parallel pytest workers, a sample plus a bench run) can't race g++
    writing librayeater.so and corrupt it. The Makefile itself links to a
    temp file and renames into place, so readers never see a partial .so;
    the lock just serializes the compilers."""
    import fcntl
    with open(os.path.join(_DIR, ".build.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            # another process may have finished the build while we waited
            if os.path.exists(_SO) and (
                    os.path.getmtime(_SO) >= os.path.getmtime(
                        os.path.join(_DIR, "src", "rayeater_native.cpp"))):
                return
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(
                os.path.join(_DIR, "src", "rayeater_native.cpp"))):
        try:
            _build_locked()
        except Exception as e:  # no toolchain → pure-python fallback
            _log.warning("native build failed (%s); using python paths", e)
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        _log.warning("native load failed (%s)", e)
        return None

    lib.re_ply_probe.restype = ctypes.c_int
    lib.re_ply_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    lib.re_ply_read.restype = ctypes.c_int
    lib.re_ply_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    lib.re_png_encode.restype = ctypes.c_int64
    lib.re_png_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.re_png_probe.restype = ctypes.c_int
    lib.re_png_probe.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.re_png_decode.restype = ctypes.c_int
    lib.re_png_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    _log.info("native tier loaded: %s", _SO)
    return _lib


def available() -> bool:
    return _load() is not None


def read_ply(path: str):
    """Fast binary PLY vertex read → (prop_names, (n, p) float32)."""
    lib = _load()
    if lib is None:
        raise ImportError("native tier unavailable")
    n = ctypes.c_int64()
    p = ctypes.c_int32()
    off = ctypes.c_int64()
    ascii_ = ctypes.c_int32()
    names = ctypes.create_string_buffer(16384)
    rc = lib.re_ply_probe(path.encode(), ctypes.byref(n), ctypes.byref(p),
                          names, len(names), ctypes.byref(off),
                          ctypes.byref(ascii_))
    if rc != 0:
        raise ValueError(f"native PLY probe failed ({rc}) for {path}")
    props = names.value.decode().split("\n")
    out = np.empty((n.value, p.value), np.float32)
    rc = lib.re_ply_read(path.encode(), off.value, ascii_.value, n.value,
                         p.value,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native PLY read failed ({rc}) for {path}")
    return props, out


def png_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3|4) u8 → PNG bytes."""
    lib = _load()
    if lib is None:
        raise ImportError("native tier unavailable")
    pixels = np.ascontiguousarray(pixels, np.uint8)
    h, w, c = pixels.shape
    pp = pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    need = lib.re_png_encode(pp, h, w, c, None, 0)
    if need < 0:
        raise ValueError(f"native PNG size probe failed ({need})")
    out = np.empty(need, np.uint8)
    size = lib.re_png_encode(
        pp, h, w, c, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        need)
    if size < 0:
        raise ValueError(f"native PNG encode failed ({size})")
    return out[:size].tobytes()


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) u8 (8-bit, non-interlaced, no palette)."""
    lib = _load()
    if lib is None:
        raise ImportError("native tier unavailable")
    buf = np.frombuffer(data, np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.re_png_probe(bp, len(buf), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"native PNG probe failed ({rc})")
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.re_png_decode(
        bp, len(buf), h.value, w.value, c.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"native PNG decode failed ({rc})")
    return out

"""Native (C++) IO runtime: compiled on first use, loaded via ctypes.

The compiled-runtime layer of the framework (the reference's IO stack is
C++ Exodus/Ioss; ours is this library): buffered binary trajectory frames
with CRC integrity and batch Hilbert keys for host-side resharding.
Falls back gracefully (library() returns None) when no compiler exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional

_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "fastio.cpp")


def _cache_dir() -> str:
    d = os.environ.get("MUNDY_TPU_NATIVE_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache", "mundy_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def build_library() -> Optional[str]:
    """Compile fastio.cpp to a shared object (content-hashed cache)."""
    src = _source_path()
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"fastio_{digest}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    os.replace(out + ".tmp", out)
    return out


def library() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.mundy_traj_open_write.restype = ctypes.c_void_p
    lib.mundy_traj_open_write.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
    lib.mundy_traj_write_frame.restype = ctypes.c_int
    lib.mundy_traj_write_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, ctypes.c_void_p]
    lib.mundy_traj_close.argtypes = [ctypes.c_void_p]
    lib.mundy_traj_open_read.restype = ctypes.c_void_p
    lib.mundy_traj_open_read.argtypes = [ctypes.c_char_p]
    lib.mundy_traj_num_particles.restype = ctypes.c_int64
    lib.mundy_traj_num_particles.argtypes = [ctypes.c_void_p]
    lib.mundy_traj_num_frames.restype = ctypes.c_int64
    lib.mundy_traj_num_frames.argtypes = [ctypes.c_void_p]
    lib.mundy_traj_read_frame.restype = ctypes.c_int
    lib.mundy_traj_read_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.mundy_traj_close_read.argtypes = [ctypes.c_void_p]
    lib.mundy_hilbert_keys.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p]
    _LIB = lib
    return _LIB

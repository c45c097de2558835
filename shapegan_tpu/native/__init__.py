"""Loader for the first-party C++ libraries (mesh SDF BVH, rasterizer).

Build policy shared by every consumer:
  * rebuild when the library is missing OR the C++ source is newer,
  * under an exclusive file lock (data-prep fans MeshSDF construction across
    a multiprocessing.Pool — unsynchronized `make` runs would interleave
    linker output into one .so),
  * into a temp name moved over the target with os.replace, so a process
    that already has the previous .so mmapped never sees it truncated
    (in-place relink => SIGBUS in the running process).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))


def load_library(source: str, lib: str) -> Optional[ctypes.CDLL]:
    """CDLL for ``lib`` (e.g. 'librasterizer.so'), building from ``source``
    (e.g. 'rasterizer.cpp') if missing/stale. Returns None on build failure
    (callers fall back to their numpy paths). Raises nothing."""
    lib_path = os.path.join(NATIVE_DIR, lib)
    src_path = os.path.join(NATIVE_DIR, source)
    try:
        stale = not os.path.exists(lib_path) or (
            os.path.exists(src_path)
            and os.path.getmtime(src_path) > os.path.getmtime(lib_path)
        )
        if stale:
            _build_locked(src_path, lib_path)
        return ctypes.CDLL(lib_path)
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"native build of {lib} unavailable ({e}); using numpy fallback")
        return None


def _build_locked(src_path: str, lib_path: str) -> None:
    import fcntl

    lock_path = lib_path + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            # Re-check under the lock: another process may have just built it.
            if os.path.exists(lib_path) and os.path.getmtime(src_path) <= os.path.getmtime(lib_path):
                return
            tmp_path = lib_path + f".tmp.{os.getpid()}"
            cxx = os.environ.get("CXX", "g++")
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-fPIC", "-pthread", "-Wall",
                 "-shared", src_path, "-o", tmp_path],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_path, lib_path)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)

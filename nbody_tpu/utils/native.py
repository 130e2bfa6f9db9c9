"""ctypes bindings for the native C++ reference engine (native/nbody_ref.cpp).

The library plays the role the reference's host-side C++ plays (tree build
project.cu:575-591, CPU traversal 593-675, dump writer 504-534): a fast
golden engine for large-N parity tests and dump generation.  Built on
demand with the repo's g++ via native/Makefile; all entry points raise
``NativeUnavailable`` if no toolchain is present so the pure-Python/JAX
framework keeps working without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnbodyref.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise NativeUnavailable(
            f"could not build native library: {detail}"
        ) from e


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "nbody_ref.cpp")
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.nbody_bh_accelerations.restype = ctypes.c_int
    lib.nbody_bh_accelerations.argtypes = [
        dp, dp, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, dp,
    ]
    lib.nbody_naive_accelerations.restype = ctypes.c_int
    lib.nbody_naive_accelerations.argtypes = [
        dp, dp, ctypes.c_int, ctypes.c_double, dp,
    ]
    lib.nbody_tree_dump.restype = ctypes.c_long
    lib.nbody_tree_dump.argtypes = [
        dp, dp, ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
    ]
    lib.nbody_simulate.restype = ctypes.c_int
    lib.nbody_simulate.argtypes = [
        dp, dp, dp, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def bh_accelerations(
    positions, masses, g: float, theta: float = 0.5, max_depth: int = 9
) -> np.ndarray:
    lib = load()
    p = np.ascontiguousarray(positions, dtype=np.float64)
    m = np.ascontiguousarray(masses, dtype=np.float64)
    n = m.shape[0]
    acc = np.empty((n, 2), dtype=np.float64)
    rc = lib.nbody_bh_accelerations(
        _as_c(m), _as_c(p), n, g, theta, max_depth, _as_c(acc)
    )
    if rc < 0:
        raise RuntimeError(f"nbody_bh_accelerations failed: {rc}")
    return acc


def naive_accelerations(positions, masses, g: float) -> np.ndarray:
    lib = load()
    p = np.ascontiguousarray(positions, dtype=np.float64)
    m = np.ascontiguousarray(masses, dtype=np.float64)
    n = m.shape[0]
    acc = np.empty((n, 2), dtype=np.float64)
    rc = lib.nbody_naive_accelerations(_as_c(m), _as_c(p), n, g, _as_c(acc))
    if rc != 0:
        raise RuntimeError(f"nbody_naive_accelerations failed: {rc}")
    return acc


def tree_dump(positions, masses, max_depth: int = 9) -> str:
    lib = load()
    p = np.ascontiguousarray(positions, dtype=np.float64)
    m = np.ascontiguousarray(masses, dtype=np.float64)
    n = m.shape[0]
    needed = lib.nbody_tree_dump(_as_c(m), _as_c(p), n, max_depth, None, 0)
    if needed < 0:
        raise RuntimeError(f"nbody_tree_dump failed: {needed}")
    buf = ctypes.create_string_buffer(needed)
    lib.nbody_tree_dump(_as_c(m), _as_c(p), n, max_depth, buf, needed)
    return buf.raw.decode()


def simulate(
    positions,
    velocities,
    masses,
    n_steps: int,
    dt: float,
    g: float,
    engine: str = "barnes_hut",
    theta: float = 0.5,
    max_depth: int = 9,
):
    """Full native step loop; returns (positions, velocities) after
    n_steps (arrays are copied, not mutated)."""
    lib = load()
    p = np.array(positions, dtype=np.float64)
    v = np.array(velocities, dtype=np.float64)
    m = np.ascontiguousarray(masses, dtype=np.float64)
    n = m.shape[0]
    eng = 0 if engine == "naive" else 1
    rc = lib.nbody_simulate(
        _as_c(m), _as_c(p), _as_c(v), n, n_steps, dt, g, theta, max_depth, eng
    )
    if rc != 0:
        raise RuntimeError(f"nbody_simulate failed: {rc}")
    return p, v

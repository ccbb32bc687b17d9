"""Native (C++) runtime components, loaded via ctypes.

The reference ships a C++/SSE/OpenMP BVH raytracer behind a Cython bridge
(auxiliary/raytracer/*, SURVEY.md §2.2 N1-N6 + C8). This package is its
counterpart in the TPU framework: ``raytracer.cpp`` compiled on demand with
g++ into a shared library and called through ctypes (no Cython/pybind11
needed). The native engine serves as the CPU oracle for the JAX mesh caster
(ops/triangles.py) and the TSDF raymarcher (ops/raycast.py), and as a fast
host-side mesh raycaster outside jit.

Build is lazy and cached: first use compiles ``raytracer.cpp`` into
``_ltnative-<tag>.so`` next to the source (falling back to a user cache dir
if the package is read-only). ``available()`` reports whether a toolchain
exists; tests skip gracefully without one.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import NamedTuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "raytracer.cpp")
_LIB = None
_BUILD_ERROR = None


def _source_tag() -> str:
    # the key must identify the MACHINE too, not just the source:
    # -march=native binaries under the user-global XDG cache would
    # otherwise be loaded on a different CPU (or a copied working tree)
    # and SIGILL on the first call instead of rebuilding
    import platform

    cpu = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu += line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    with open(_SRC, "rb") as f:
        return hashlib.sha256(
            f.read() + cpu.encode()).hexdigest()[:12]


def _lib_paths() -> list[str]:
    name = f"_ltnative-{_source_tag()}.so"
    paths = [os.path.join(os.path.dirname(__file__), name)]
    cache = os.environ.get("XDG_CACHE_HOME",
                           os.path.join(os.path.expanduser("~"), ".cache"))
    paths.append(os.path.join(cache, "lidar_transfer_tpu", name))
    return paths


def _compile(out_path: str) -> None:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    flags = ["-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
             "-march=native", "-funroll-loops"]
    # build to a temp file then atomically rename (parallel test runners)
    fd, tmp = tempfile.mkstemp(suffix=".so",
                               dir=os.path.dirname(out_path))
    os.close(fd)
    try:
        subprocess.run(["g++", *flags, _SRC, "-o", tmp], check=True,
                       capture_output=True, text=True)
        os.replace(tmp, out_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load() -> ctypes.CDLL | None:
    global _LIB, _BUILD_ERROR
    if _LIB is not None or _BUILD_ERROR is not None:
        return _LIB
    last_err = None
    for path in _lib_paths():
        if not os.path.exists(path):
            try:
                _compile(path)
            except (OSError, subprocess.CalledProcessError) as e:
                detail = getattr(e, "stderr", "") or str(e)
                last_err = f"build failed at {path}: {detail}"
                continue
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            last_err = f"load failed at {path}: {e}"
            continue
        lib.lt_trace.restype = ctypes.c_int
        lib.lt_trace.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,       # rays
            ctypes.POINTER(ctypes.c_float),                     # origin
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,       # verts
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,       # faces
            ctypes.POINTER(ctypes.c_int32),                     # vert_labels
            ctypes.POINTER(ctypes.c_float),                     # vert_rems
            ctypes.POINTER(ctypes.c_float),                     # endpoints
            ctypes.POINTER(ctypes.c_int32),                     # labels
            ctypes.POINTER(ctypes.c_float),                     # rems
            ctypes.POINTER(ctypes.c_float),                     # range
            ctypes.POINTER(ctypes.c_int32),                     # tri
        ]
        _LIB = lib
        return _LIB
    _BUILD_ERROR = last_err or "no candidate paths"
    print(f"[lidar_transfer_tpu.native] native raytracer unavailable: "
          f"{_BUILD_ERROR}", file=sys.stderr)
    return None


def available() -> bool:
    """True if the native raytracer compiled and loaded."""
    return _load() is not None


class NativeTraceResult(NamedTuple):
    endpoints: np.ndarray   # (R,3) f32; (0,0,0) on miss
    labels: np.ndarray      # (R,)  i32; 0 on miss
    remissions: np.ndarray  # (R,)  f32; 0 on miss
    range: np.ndarray       # (R,)  f32; 0 on miss
    tri: np.ndarray         # (R,)  i32 hit triangle index; -1 on miss
    hits: int


def _c32(a, dtype):
    return np.ascontiguousarray(a, dtype=dtype)


def trace_mesh(rays: np.ndarray, origin: np.ndarray, verts: np.ndarray,
               faces: np.ndarray, vert_labels: np.ndarray,
               vert_rems: np.ndarray) -> NativeTraceResult:
    """Nearest-hit raycast of R rays against an indexed mesh (native BVH).

    Same contract as the reference's ``C_Trace`` (RayTracerCython.pyx:15-33 →
    RayTracer.cpp:118-124): shared ray origin, per-vertex attributes, hit
    label from the triangle's vertex 0, remission = mean of its 3 vertices.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(
            f"native raytracer unavailable: {_BUILD_ERROR}")
    rays = _c32(rays, np.float32).reshape(-1, 3)
    origin = _c32(origin, np.float32).reshape(3)
    verts = _c32(verts, np.float32).reshape(-1, 3)
    faces = _c32(faces, np.int32).reshape(-1, 3)
    vert_labels = _c32(vert_labels, np.int32).reshape(-1)
    vert_rems = _c32(vert_rems, np.float32).reshape(-1)
    if faces.size and (faces.min() < 0 or faces.max() >= verts.shape[0]):
        raise ValueError("face index out of range")
    if vert_labels.shape[0] != verts.shape[0] or \
            vert_rems.shape[0] != verts.shape[0]:
        raise ValueError("per-vertex attribute length mismatch")

    n_rays = rays.shape[0]
    endpoints = np.zeros((n_rays, 3), np.float32)
    labels = np.zeros((n_rays,), np.int32)
    rems = np.zeros((n_rays,), np.float32)
    rng = np.zeros((n_rays,), np.float32)
    tri = np.full((n_rays,), -1, np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))  # noqa
    hits = lib.lt_trace(
        fptr(rays), n_rays, fptr(origin), fptr(verts), verts.shape[0],
        iptr(faces), faces.shape[0], iptr(vert_labels), fptr(vert_rems),
        fptr(endpoints), iptr(labels), fptr(rems), fptr(rng), iptr(tri))
    return NativeTraceResult(endpoints=endpoints, labels=labels,
                             remissions=rems, range=rng, tri=tri, hits=hits)

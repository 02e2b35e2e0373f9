"""Mesh extraction: decode an SDF grid and run native isosurface extraction.

Parity: `MeshExtractor.extract_mesh_from_code` (`reconstruct/optimizer.py:
284-304` + `reconstruct/utils.py:98-141`): 64^3 voxel grid decode followed by
marching cubes.  The grid decode is a batched MLP evaluation (MXU); the
irregular surface extraction runs in the C++ runtime (`native/
marching_cubes.cpp`, marching tetrahedra) through ctypes — the framework's
native-code seam.  The library auto-builds with `make` on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .deepsdf import DeepSDFConfig, decode_sdf

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


class Mesh(NamedTuple):
    vertices: np.ndarray  # (V, 3) float32, normalized object frame
    faces: np.ndarray  # (T, 3) int32


@lru_cache(maxsize=1)
def _load_native():
    lib_path = os.path.join(_NATIVE_DIR, "libqsp_native.so")
    if not os.path.exists(lib_path):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.marching_cubes.restype = ctypes.c_int
    lib.marching_cubes.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def marching_cubes(sdf_grid: np.ndarray, iso: float = 0.0) -> Mesh:
    """Extract the iso-surface of a (nz, ny, nx)-indexed SDF grid.

    Returned vertices are in (x, y, z) voxel coordinates.
    """
    lib = _load_native()
    sdf = np.ascontiguousarray(sdf_grid, dtype=np.float32)
    nz, ny, nx = sdf.shape
    vert_cap = max(1 << 16, 8 * nx * ny)
    tri_cap = 2 * vert_cap
    verts = np.empty((vert_cap, 3), np.float32)
    tris = np.empty((tri_cap, 3), np.int32)
    nv = ctypes.c_int(0)
    nt = ctypes.c_int(0)
    status = lib.marching_cubes(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(iso),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        vert_cap, tri_cap,
        ctypes.byref(nv), ctypes.byref(nt),
    )
    if status != 0:
        raise RuntimeError("marching_cubes: capacity exceeded")
    return Mesh(vertices=verts[: nv.value].copy(), faces=tris[: nt.value].copy())


def sdf_grid_from_code(
    params, cfg: DeepSDFConfig, code: jax.Array, resolution: int = 64,
    extent: float = 1.0, chunk: int = 32768,
) -> np.ndarray:
    """Decode the SDF on a regular grid (nz, ny, nx) over [-extent, extent]^3."""
    lin = jnp.linspace(-extent, extent, resolution)
    zz, yy, xx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)

    decode = jax.jit(lambda p: decode_sdf(params, cfg, code, p))
    out = []
    for i in range(0, pts.shape[0], chunk):
        out.append(np.asarray(decode(pts[i : i + chunk])))
    return np.concatenate(out).reshape(resolution, resolution, resolution)


def extract_mesh_from_code(
    params, cfg: DeepSDFConfig, code: jax.Array, resolution: int = 64,
    extent: float = 1.0,
) -> Mesh:
    """Full pipeline: decode grid on device, extract surface natively.

    Vertices are rescaled from voxel indices to normalized object
    coordinates in [-extent, extent]^3.
    """
    grid = sdf_grid_from_code(params, cfg, code, resolution, extent)
    mesh = marching_cubes(grid, iso=0.0)
    scale = 2.0 * extent / (resolution - 1)
    verts = mesh.vertices * scale - extent
    return Mesh(vertices=verts.astype(np.float32), faces=mesh.faces)

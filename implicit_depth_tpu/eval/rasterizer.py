"""Mesh depth rasterizer + plane renderer for temporal evaluation.

Replaces PyTorch3D's MeshRasterizer (utils/binary_metrics_utils.py:283-388)
with a TPU-native split:
- the synthetic occlusion plane is rendered in CLOSED FORM (ray-plane
  intersection, jnp) — the reference builds a 1024x1024-vertex mesh for
  what is analytically a rectangle (binary_metrics_utils.py:305-329);
- GT-mesh z-buffers come from a small C++ rasterizer (csrc/rasterizer.cpp)
  compiled on demand and bound via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "librasterizer.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "rasterizer.cpp")
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", _LIB_PATH]
        )
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rasterize_depth.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, f32p, f32p,
        ctypes.c_int32, ctypes.c_int32, f32p,
    ]
    lib.project_vertices.argtypes = [f32p, ctypes.c_int64, f32p, f32p, f32p]
    lib.sample_vertex_predictions.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, f32p, f32p, f32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, f32p,
    ]
    _lib = lib
    return lib


def rasterize_mesh_depth(
    verts_n3: np.ndarray, faces_n3: np.ndarray,
    cam_T_world_44: np.ndarray, K_33: np.ndarray,
    height: int, width: int,
) -> np.ndarray:
    """Z-buffer depth image of a mesh; 0 where empty."""
    lib = _load_lib()
    verts = np.ascontiguousarray(verts_n3, np.float32)
    faces = np.ascontiguousarray(faces_n3, np.int32)
    T = np.ascontiguousarray(cam_T_world_44, np.float32)
    K = np.ascontiguousarray(K_33[:3, :3], np.float32)
    out = np.zeros((height, width), np.float32)
    lib.rasterize_depth(verts, verts.shape[0], faces, faces.shape[0], T, K,
                        height, width, out)
    return out


def project_mesh_vertices(
    verts_n3: np.ndarray, cam_T_world_44: np.ndarray, K_33: np.ndarray
) -> np.ndarray:
    """(n, 3) -> (n, 3) of (u, v, z_cam); z <= 0 marks behind-camera."""
    lib = _load_lib()
    verts = np.ascontiguousarray(verts_n3, np.float32)
    T = np.ascontiguousarray(cam_T_world_44, np.float32)
    K = np.ascontiguousarray(K_33[:3, :3], np.float32)
    out = np.zeros((verts.shape[0], 3), np.float32)
    lib.project_vertices(verts, verts.shape[0], T, K, out)
    return out


def sample_vertex_predictions(
    verts_n3: np.ndarray, faces_n3: np.ndarray,
    cam_T_world_44: np.ndarray, K_33: np.ndarray,
    pred_hw: np.ndarray, edge_size: int = 4,
) -> np.ndarray:
    """Fused per-frame vertex-visibility update (C++, one call).

    Equivalent to rasterize_mesh_depth + project_mesh_vertices + the
    numpy sampling chain of TemporalEvaluator.update_vertex_predictions
    (reference: utils/binary_metrics_utils.py:360-388) without the
    million-element host temporaries. Returns (n_verts,) float32 of the
    sampled prediction at visible vertices, -1 elsewhere."""
    lib = _load_lib()
    verts = np.ascontiguousarray(verts_n3, np.float32)
    faces = np.ascontiguousarray(faces_n3, np.int32)
    T = np.ascontiguousarray(cam_T_world_44, np.float32)
    K = np.ascontiguousarray(K_33[:3, :3], np.float32)
    pred = np.ascontiguousarray(pred_hw, np.float32)
    h, w = pred.shape
    out = np.empty((verts.shape[0],), np.float32)
    lib.sample_vertex_predictions(verts, verts.shape[0], faces, faces.shape[0],
                                  T, K, pred, h, w, edge_size, out)
    return out


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Loads vertices/faces from ascii or binary-little-endian PLY
    (the ScanNet `_vh_clean_2.ply` GT meshes)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        counts = {}
        props: dict[str, list] = {}
        current = None
        for l in header:
            if l.startswith("element"):
                _, name, cnt = l.split()
                counts[name] = int(cnt)
                current = name
                props[name] = []
            elif l.startswith("property") and current:
                props[current].append(l.split()[1:])

        nv, nf = counts["vertex"], counts["face"]
        tmap = {"float": "f4", "float32": "f4", "double": "f8", "uchar": "u1",
                "uint8": "u1", "int": "i4", "int32": "i4", "uint": "u4", "short": "i2",
                "ushort": "u2", "char": "i1"}

        if fmt == "ascii":
            verts = np.zeros((nv, 3), np.float32)
            for i in range(nv):
                vals = f.readline().split()
                verts[i] = [float(v) for v in vals[:3]]
            faces = np.zeros((nf, 3), np.int32)
            for i in range(nf):
                vals = f.readline().split()
                faces[i] = [int(v) for v in vals[1:4]]
            return verts, faces

        # binary little endian
        vdtype = np.dtype([(f"p{i}", "<" + tmap[p[0]]) for i, p in enumerate(props["vertex"])])
        vdata = np.frombuffer(f.read(vdtype.itemsize * nv), dtype=vdtype, count=nv)
        verts = np.stack([vdata["p0"], vdata["p1"], vdata["p2"]], -1).astype(np.float32)

        # face: list uchar int vertex_indices
        list_prop = props["face"][0]
        cnt_t = "<" + tmap[list_prop[1]]
        idx_t = "<" + tmap[list_prop[2]]
        fdtype = np.dtype([("n", cnt_t), ("idx", idx_t, (3,))])
        fdata = np.frombuffer(f.read(fdtype.itemsize * nf), dtype=fdtype, count=nf)
        assert (fdata["n"] == 3).all(), "non-triangle faces unsupported"
        return verts, fdata["idx"].astype(np.int32)


def render_plane_depth(
    anchor_world_T_cam_44: Array,
    plane_distance,
    render_cam_T_world_44: Array,
    K_44: Array,
    height: int,
    width: int,
    half_extent: float = 12.8,
) -> Array:
    """Closed-form depth of the temporal-eval plane.

    The plane sits at z = plane_distance in the anchor camera's frame,
    spanning +-half_extent (the reference's 1024 * 0.025 / 2 plane,
    binary_metrics_utils.py:305-329). Returns (h, w) depth in the render
    camera; 0 outside the rectangle or behind the camera. jnp, jittable.
    """
    from implicit_depth_tpu.core import geometry

    grid = geometry.pixel_grid(height, width)  # (h, w, 3)
    invK = jnp.linalg.inv(K_44[:3, :3])
    rays_cam = jnp.einsum("ij,hwj->hwi", invK, grid)

    # render-camera -> anchor-camera transform
    anchor_cam_T_world = jnp.linalg.inv(anchor_world_T_cam_44)
    world_T_render = jnp.linalg.inv(render_cam_T_world_44)
    A = anchor_cam_T_world @ world_T_render  # render cam -> anchor cam
    R, t = A[:3, :3], A[:3, 3]
    d_a = jnp.einsum("ij,hwj->hwi", R, rays_cam)  # ray dirs in anchor frame
    o_a = t

    denom = d_a[..., 2]
    s = (plane_distance - o_a[2]) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    px = o_a[0] + s * d_a[..., 0]
    py = o_a[1] + s * d_a[..., 1]
    hit = (s > 0) & (jnp.abs(px) <= half_extent) & (jnp.abs(py) <= half_extent)
    # depth in the render camera = s * z-component of the cam ray (z=1) => s
    return jnp.where(hit, s, 0.0)

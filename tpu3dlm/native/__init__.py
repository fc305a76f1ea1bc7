"""Native runtime components (C++ via ctypes): DBSCAN core + scanpack loader.

Built on first use with g++ (no cmake/pybind needed); every entry point has
a pure-Python fallback so the framework works without a toolchain. The
shared library is cached next to the sources and rebuilt when they change.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

_logger = logging.getLogger(__name__)
_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = [
    os.path.join(_HERE, "src", f)
    for f in ("dbscan.cpp", "scanpack.cpp", "normals.cpp", "poisson.cpp")
]
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _source_digest() -> str:
    h = hashlib.sha256()
    for s in _SRC:
        with open(s, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _build() -> str | None:
    so_path = os.path.join(_HERE, f"libtpu3dlm_native_{_source_digest()}.so")
    if os.path.exists(so_path):
        return so_path
    # compile to a temp path and rename: a build killed mid-link (timeout,
    # Ctrl-C, disk full) must not leave a partial .so at the final path —
    # the exists-check above would keep returning it and every later
    # process would crash loading a truncated ELF instead of falling back
    tmp_path = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        *_SRC, "-o", tmp_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        os.rename(tmp_path, so_path)  # atomic on the same filesystem
        return so_path
    except Exception as e:  # toolchain absent / compile failure → fallback
        _logger.warning("native build failed (%s); using Python fallbacks", e)
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return None


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build()
        if so:
            try:
                lib = ctypes.CDLL(so)
            except OSError as e:
                # e.g. a corrupt .so from an older interrupted build —
                # degrade to the Python fallbacks instead of crashing
                # every native entry point
                _logger.warning(
                    "native library failed to load (%s); using Python "
                    "fallbacks", e,
                )
                return None
            lib.tpu3dlm_dbscan.restype = ctypes.c_int
            lib.tpu3dlm_dbscan.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.tpu3dlm_scanpack_write.restype = ctypes.c_int
            lib.tpu3dlm_scanpack_read.restype = ctypes.c_int
            lib.tpu3dlm_grid_normals.restype = ctypes.c_int
            lib.tpu3dlm_grid_normals.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_double, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.tpu3dlm_march_tets.restype = ctypes.c_int
            lib.tpu3dlm_march_tets.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.c_double, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.tpu3dlm_trilinear_splat.restype = ctypes.c_int
            lib.tpu3dlm_trilinear_splat.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_double,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.tpu3dlm_free.restype = None
            lib.tpu3dlm_free.argtypes = [ctypes.c_void_p]
            lib.tpu3dlm_cull_leakage.restype = ctypes.c_int
            lib.tpu3dlm_cull_leakage.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_double,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _LIB = lib
    return _LIB


def native_cull_keep_mask(
    verts: np.ndarray,
    faces: np.ndarray,
    points: np.ndarray,
    origin: np.ndarray,
    cell: float,
    span_cells: np.ndarray,
) -> np.ndarray | None:
    """C++ dilated-occupancy keep mask for mapper/poisson._cull_leakage;
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or len(faces) == 0:
        return None
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    p = np.ascontiguousarray(points, np.float32)
    org = np.ascontiguousarray(origin, np.float32)
    keep = np.empty(len(f), np.uint8)
    rc = lib.tpu3dlm_cull_leakage(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(f)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(p)),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_double(cell),
        ctypes.c_int64(int(span_cells[0])),
        ctypes.c_int64(int(span_cells[1])),
        ctypes.c_int64(int(span_cells[2])),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool) if rc == 0 else None


def native_march_tets(
    field: np.ndarray,
    iso: float,
    origin: np.ndarray,
    voxel: float,
    weld: bool,
    normals_toward_positive: bool,
) -> tuple[np.ndarray, np.ndarray] | None:
    """C++ marching tetrahedra (same semantics as the numpy path in
    mapper/meshing.py — vertex ORDER may differ, and geometry matches up
    to f32/f64 interpolation round-off: the C++ computes edge
    interpolation and weld keys in double while the numpy oracle works in
    float32, so vertices can drift ~1 ulp and weld merges can disagree on
    exact round-half boundaries; the parity test pins agreement at 1e-3);
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(field, np.float32)
    org = np.ascontiguousarray(origin, np.float32)
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.tpu3dlm_march_tets(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(f.shape[0]), ctypes.c_int64(f.shape[1]),
        ctypes.c_int64(f.shape[2]), ctypes.c_double(iso),
        ctypes.c_int(1 if normals_toward_positive else 0),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_double(voxel), ctypes.c_int(1 if weld else 0),
        ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(faces_p), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    try:
        verts = (
            np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
            if nv.value
            else np.zeros((0, 3), np.float32)
        )
        faces = (
            np.ctypeslib.as_array(faces_p, shape=(nf.value, 3)).copy()
            if nf.value
            else np.zeros((0, 3), np.int32)
        )
    finally:
        if nv.value:
            lib.tpu3dlm_free(verts_p)
        if nf.value:
            lib.tpu3dlm_free(faces_p)
    return verts.astype(np.float32), faces.astype(np.int32)


def native_trilinear_splat(
    points: np.ndarray,
    values: np.ndarray | None,
    lo: np.ndarray,
    dims: tuple[int, int, int],
    voxel: float,
) -> np.ndarray | None:
    """C++ trilinear scatter (f64 accumulation, border clamp — the
    meshing.trilinear_scatter semantics); None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    nx, ny, nz = (int(d) for d in dims)
    scalar = values is None
    channels = 1 if scalar else int(values.shape[1])
    accum = np.zeros((nx * ny * nz, channels), np.float64)
    vals_arg = ctypes.POINTER(ctypes.c_float)()
    if not scalar:
        values = np.ascontiguousarray(values, np.float32)
        vals_arg = values.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lo32 = np.ascontiguousarray(lo, np.float32)
    rc = lib.tpu3dlm_trilinear_splat(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]), vals_arg, ctypes.c_int64(channels),
        lo32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_double(voxel), ctypes.c_int64(nx), ctypes.c_int64(ny),
        ctypes.c_int64(nz),
        accum.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    shaped = accum.reshape(nx, ny, nz, channels).astype(np.float32)
    return shaped[..., 0] if scalar else shaped


def native_grid_normals(
    points: np.ndarray, voxel: float, viewpoint=None
) -> np.ndarray | None:
    """C++ grid-PCA normals; None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    vp = None
    if viewpoint is not None:
        vp = np.ascontiguousarray(viewpoint, np.float32)
    rc = lib.tpu3dlm_grid_normals(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        ctypes.c_double(voxel),
        vp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if vp is not None
        else ctypes.POINTER(ctypes.c_float)(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def native_dbscan(points: np.ndarray, eps: float, min_points: int) -> np.ndarray | None:
    """C++ grid DBSCAN; None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    labels = np.empty(pts.shape[0], np.int32)
    lib.tpu3dlm_dbscan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        ctypes.c_double(eps),
        ctypes.c_int(min_points),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels


def scanpack_write(path: str, rgb, depth, intr, rgb_size, poses) -> bool:
    lib = get_lib()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    depth = np.ascontiguousarray(depth, np.float32)
    intr = np.ascontiguousarray(intr, np.float32)
    rgb_size = np.ascontiguousarray(rgb_size, np.float32)
    poses = np.ascontiguousarray(poses, np.float32)
    if lib is None:
        np.savez(path + ".npz", rgb=rgb, depth=depth, intr=intr,
                 rgb_size=rgb_size, poses=poses)
        # the binary pack and the .npz fallback share ONE .src fingerprint:
        # writing one must remove a stale sibling, or a later run with the
        # other toolchain state would serve old pixels behind a fresh print
        try:
            os.unlink(path)
        except OSError:
            pass
        return True
    f, h, w, _ = rgb.shape
    hd, wd = depth.shape[1], depth.shape[2]
    rc = lib.tpu3dlm_scanpack_write(
        path.encode(), rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        intr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb_size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(f), ctypes.c_int64(h), ctypes.c_int64(w),
        ctypes.c_int64(hd), ctypes.c_int64(wd),
    )
    if rc == 0:
        try:
            os.unlink(path + ".npz")  # remove a stale fallback sibling
        except OSError:
            pass
    return rc == 0


def scanpack_read(path: str):
    """→ (rgb, depth, intr, rgb_size, poses) or None when absent."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        npz = path + ".npz"
        if os.path.exists(npz):
            d = np.load(npz)
            return d["rgb"], d["depth"], d["intr"], d["rgb_size"], d["poses"]
        return None
    dims = np.zeros(5, np.int64)
    rc = lib.tpu3dlm_scanpack_read(
        path.encode(), dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        None, None, None, None, None,
    )
    if rc != 0:
        return None
    f, h, w, hd, wd = (int(x) for x in dims)
    if min(f, h, w, hd, wd) <= 0 or max(f, h, w, hd, wd) > 10**9:
        return None  # corrupt dims behind a valid magic (see scanpack.cpp)
    rgb = np.empty((f, h, w, 3), np.uint8)
    depth = np.empty((f, hd, wd), np.float32)
    intr = np.empty((f, 4), np.float32)
    rgb_size = np.empty((f, 2), np.float32)
    poses = np.empty((f, 7), np.float32)
    rc = lib.tpu3dlm_scanpack_read(
        path.encode(), dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        intr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb_size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return rgb, depth, intr, rgb_size, poses


_PACK_MAGIC = b"TPSCAN1\x00"
_PACK_HEADER = 48  # 8-byte magic + 5 × int64 dims (scanpack.cpp Header)


def _pack_offsets(f: int, h: int, w: int, hd: int, wd: int) -> dict:
    """Byte offset + (shape, dtype) of each array in the pack layout."""
    out, off = {}, _PACK_HEADER
    for name, shape, dt in (
        ("rgb", (f, h, w, 3), np.uint8),
        ("depth", (f, hd, wd), np.float32),
        ("intr", (f, 4), np.float32),
        ("rgb_size", (f, 2), np.float32),
        ("poses", (f, 7), np.float32),
    ):
        out[name] = (off, shape, dt)
        off += int(np.prod(shape)) * np.dtype(dt).itemsize
    out["total"] = off
    return out


def scanpack_memmap(path: str, mode: str = "r"):
    """Memory-mapped views over a scanpack file (no C round trip, O(pages)
    resident — the streaming reader's zero-decode source). Returns
    ``{"rgb": memmap, "depth": ..., "intr": ..., "rgb_size": ..., "poses": ...,
    "dims": (f, h, w, hd, wd)}`` or None if the file is absent/invalid
    (e.g. a partially-written pack whose magic was never finalised)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fp:
        hdr = fp.read(_PACK_HEADER)
    if len(hdr) != _PACK_HEADER or hdr[:8] != _PACK_MAGIC:
        return None
    f, h, w, hd, wd = (int(x) for x in np.frombuffer(hdr, np.int64, 5, 8))
    # dims sanity: corrupt header bytes can pass the magic check with
    # negative/absurd dims — a negative total defeats the truncation check
    # below and np.memmap then raises instead of honoring the documented
    # "None if invalid" contract (callers treat None as rebuild-the-pack)
    if min(f, h, w, hd, wd) <= 0 or max(f, h, w, hd, wd) > 10**9:
        return None
    offs = _pack_offsets(f, h, w, hd, wd)
    if os.path.getsize(path) < offs["total"]:
        return None  # truncated
    out = {"dims": (f, h, w, hd, wd)}
    for name in ("rgb", "depth", "intr", "rgb_size", "poses"):
        off, shape, dt = offs[name]
        out[name] = np.memmap(path, dtype=dt, mode=mode, offset=off, shape=shape)
    return out


def scanpack_create(path: str, f: int, h: int, w: int, hd: int, wd: int):
    """Preallocate a pack for incremental (chunk-by-chunk) writing.

    The magic is NOT written yet — `scanpack_read`/`scanpack_memmap` treat
    the file as invalid until `scanpack_finalize` stamps it, so a stream
    that stops early never leaves a half-pack that later loads as a scan.
    Returns writable memmap views (same keys as `scanpack_memmap`)."""
    offs = _pack_offsets(f, h, w, hd, wd)
    with open(path, "wb") as fp:
        fp.write(b"\x00" * 8)  # magic stamped by scanpack_finalize
        fp.write(np.asarray([f, h, w, hd, wd], np.int64).tobytes())
        fp.truncate(offs["total"])
    out = {"dims": (f, h, w, hd, wd)}
    for name in ("rgb", "depth", "intr", "rgb_size", "poses"):
        off, shape, dt = offs[name]
        out[name] = np.memmap(path, dtype=dt, mode="r+", offset=off, shape=shape)
    return out


def scanpack_finalize(path: str) -> None:
    """Stamp the magic after every frame is written — makes the pack valid."""
    with open(path, "r+b") as fp:
        fp.write(_PACK_MAGIC)

"""ctypes bindings to the native C++ runtime (`native/`).

The native layer provides the host-side runtime components the reference
implements in C++: point-cloud file IO (PCL reader analog, cloudIO.cpp),
the scan accumulator (velodyne_accumulator.cpp), an ordered multi-threaded
sequence prefetcher (the data-loader replacing App::processFromFile's
synchronous reads, app.cpp:261-278), and host voxel downsampling.

`load()` builds the shared library on demand (`make -C native`) and caches
the handle. Every public helper has a pure-Python/numpy fallback so the
package works without a toolchain; `available()` reports which path is live.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_native", "libaicp_native.so")
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_c_float_p = ctypes.POINTER(ctypes.c_float)
_c_double_p = ctypes.POINTER(ctypes.c_double)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.aicp_cloud_read.restype = ctypes.c_long
    lib.aicp_cloud_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(_c_float_p), _c_double_p]
    lib.aicp_pcd_write.restype = ctypes.c_int
    lib.aicp_pcd_write.argtypes = [ctypes.c_char_p, _c_float_p, ctypes.c_long,
                                   _c_double_p, ctypes.c_int]
    lib.aicp_buffer_free.restype = None
    lib.aicp_buffer_free.argtypes = [_c_float_p]
    lib.aicp_voxel_downsample.restype = ctypes.c_long
    lib.aicp_voxel_downsample.argtypes = [
        _c_float_p, ctypes.c_long, ctypes.c_float, _c_float_p, ctypes.c_long]
    lib.aicp_voxel_downsample_q16.restype = ctypes.c_long
    lib.aicp_voxel_downsample_q16.argtypes = [
        _c_float_p, ctypes.c_long, ctypes.c_float,
        ctypes.POINTER(ctypes.c_short), ctypes.c_long, _c_float_p, _c_float_p]
    lib.aicp_accum_create.restype = ctypes.c_void_p
    lib.aicp_accum_create.argtypes = [ctypes.c_long, ctypes.c_int,
                                      ctypes.c_float, ctypes.c_float]
    lib.aicp_accum_push.restype = ctypes.c_long
    lib.aicp_accum_push.argtypes = [ctypes.c_void_p, _c_float_p,
                                    ctypes.c_long, _c_float_p]
    lib.aicp_accum_count.restype = ctypes.c_long
    lib.aicp_accum_count.argtypes = [ctypes.c_void_p]
    lib.aicp_accum_finished.restype = ctypes.c_int
    lib.aicp_accum_finished.argtypes = [ctypes.c_void_p]
    lib.aicp_accum_take.restype = ctypes.c_long
    lib.aicp_accum_take.argtypes = [ctypes.c_void_p, _c_float_p, ctypes.c_long]
    lib.aicp_accum_clear.restype = None
    lib.aicp_accum_clear.argtypes = [ctypes.c_void_p]
    lib.aicp_accum_destroy.restype = None
    lib.aicp_accum_destroy.argtypes = [ctypes.c_void_p]
    lib.aicp_prefetch_create.restype = ctypes.c_void_p
    lib.aicp_prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_long, ctypes.c_float]
    lib.aicp_prefetch_next.restype = ctypes.c_long
    lib.aicp_prefetch_next.argtypes = [ctypes.c_void_p, _c_float_p,
                                       _c_double_p, ctypes.POINTER(ctypes.c_long)]
    lib.aicp_prefetch_destroy.restype = None
    lib.aicp_prefetch_destroy.argtypes = [ctypes.c_void_p]
    lib.aicp_lzf_compress.restype = ctypes.c_long
    lib.aicp_lzf_compress.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                      ctypes.c_char_p, ctypes.c_long]
    lib.aicp_lzf_decompress.restype = ctypes.c_long
    lib.aicp_lzf_decompress.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                        ctypes.c_char_p, ctypes.c_long]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Return the native library handle, building it if needed (or None)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except (subprocess.SubprocessError, OSError):
                pass
        try:
            _lib = _bind(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _load_failed = True
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------- file IO

def read_cloud(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read .pcd/.ply/.bin -> (points (N,3) float32, viewpoint (7,) float64)."""
    lib = load()
    if lib is None:
        return _read_cloud_py(path)
    buf = _c_float_p()
    vp = (ctypes.c_double * 7)()
    n = lib.aicp_cloud_read(path.encode(), ctypes.byref(buf), vp)
    if n < 0:
        raise IOError(f"native cloud read failed ({n}): {path}")
    try:
        pts = np.ctypeslib.as_array(buf, shape=(n, 3)).copy() if n else \
            np.zeros((0, 3), np.float32)
    finally:
        lib.aicp_buffer_free(buf)
    return pts, np.asarray(vp[:], np.float64)


def _read_cloud_py(path: str) -> tuple[np.ndarray, np.ndarray]:
    from .io.pcd import read_pcd
    ident = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pcd":
        pts, vp = read_pcd(path)
        return pts, vp
    if ext == ".bin":
        raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        pts = raw[:, :3]
        return pts[np.isfinite(pts).all(axis=1)], ident
    raise IOError(f"no python fallback reader for {ext!r}")


def write_pcd(path: str, points: np.ndarray,
              viewpoint=(0, 0, 0, 1, 0, 0, 0),
              binary: bool | str = True) -> None:
    """binary: False ascii, True binary, "compressed" binary_compressed."""
    lib = load()
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    if lib is None:
        from .io.pcd import write_pcd as py_write
        py_write(path, pts, viewpoint, binary)
        return
    vp = (ctypes.c_double * 7)(*[float(v) for v in viewpoint])
    mode = 2 if binary == "compressed" else (1 if binary else 0)
    rc = lib.aicp_pcd_write(path.encode(),
                            pts.ctypes.data_as(_c_float_p), pts.shape[0],
                            vp, mode)
    if rc != 0:
        raise IOError(f"native pcd write failed: {path}")


# ------------------------------------------------------- voxel downsample

def voxel_downsample(points: np.ndarray, voxel: float,
                     capacity: Optional[int] = None) -> np.ndarray:
    """Centroid voxel downsample on the host (pre-transfer reduction)."""
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    cap = capacity or pts.shape[0]
    lib = load()
    if lib is None:
        return _voxel_downsample_py(pts, voxel, cap)
    out = np.empty((cap, 3), np.float32)
    n = lib.aicp_voxel_downsample(pts.ctypes.data_as(_c_float_p),
                                  pts.shape[0], ctypes.c_float(voxel),
                                  out.ctypes.data_as(_c_float_p), cap)
    return out[:n]


def voxel_downsample_q16(points: np.ndarray, voxel: float, capacity: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Fused voxel downsample + int16 wire quantization in one native pass:
    returns (q (capacity,3) int16 zero-padded, scale (3,), center (3,),
    count). Dequantization: p = q * scale + center — byte-identical to
    Cloud.from_numpy(voxel_downsample(...), quantize=True)'s wire payload."""
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    lib = load()
    if lib is None:
        ds = _voxel_downsample_py(pts, voxel, capacity)
        n = ds.shape[0]
        q = np.zeros((capacity, 3), np.int16)
        if n:
            lo, hi = ds.min(axis=0), ds.max(axis=0)
            center = ((hi + lo) * 0.5).astype(np.float32)
            scale = np.maximum((hi - lo) / 65534.0, 1e-6).astype(np.float32)
            q[:n] = np.round((ds - center) / scale)
        else:
            center = np.zeros(3, np.float32)
            scale = np.full(3, 1e-6, np.float32)
        return q, scale, center, n
    q = np.empty((capacity, 3), np.int16)
    scale = np.empty(3, np.float32)
    center = np.empty(3, np.float32)
    n = lib.aicp_voxel_downsample_q16(
        pts.ctypes.data_as(_c_float_p), pts.shape[0], ctypes.c_float(voxel),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_short)), capacity,
        scale.ctypes.data_as(_c_float_p), center.ctypes.data_as(_c_float_p))
    return q, scale, center, int(n)


def _voxel_downsample_py(pts: np.ndarray, voxel: float, cap: int) -> np.ndarray:
    if pts.shape[0] == 0:
        return pts
    q = np.floor(pts / voxel).astype(np.int64)
    _, first_idx, inv = np.unique(q, axis=0, return_index=True,
                                  return_inverse=True)
    # first-touch voxel ordering to match the native layer
    order = np.argsort(np.argsort(first_idx))
    slots = order[inv]
    k = len(first_idx)
    sums = np.zeros((k, 3), np.float64)
    counts = np.zeros(k, np.int64)
    np.add.at(sums, slots, pts)
    np.add.at(counts, slots, 1)
    out = (sums / counts[:, None]).astype(np.float32)
    return out[:cap]


# ----------------------------------------------------------- accumulator

class ScanAccumulator:
    """VelodyneAccumulator analog (velodyne_accumulator.cpp:31-72): batches
    `batch_size` sensor-frame scans into one odom-frame cloud with a
    [min_range, max_range] crop."""

    def __init__(self, capacity: int = 262144, batch_size: int = 10,
                 min_range: float = 0.5, max_range: float = 30.0):
        self.capacity = int(capacity)
        self.batch_size = int(batch_size)
        self.min_range = float(min_range)
        self.max_range = float(max_range)
        self._lib = load()
        if self._lib is not None:
            self._h = self._lib.aicp_accum_create(
                self.capacity, self.batch_size,
                ctypes.c_float(self.min_range), ctypes.c_float(self.max_range))
        else:
            self._h = None
            self._scans: list[np.ndarray] = []
            self._n_scans = 0

    def push(self, points: np.ndarray, T_sensor_to_odom: np.ndarray) -> int:
        """Returns the number of points retained from this scan."""
        pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
        T = np.ascontiguousarray(T_sensor_to_odom, np.float32).reshape(4, 4)
        if self._h is not None:
            return int(self._lib.aicp_accum_push(
                self._h, pts.ctypes.data_as(_c_float_p), pts.shape[0],
                T.ctypes.data_as(_c_float_p)))
        if self._n_scans >= self.batch_size:
            return -1
        r2 = np.sum(pts * pts, axis=1)
        keep = (r2 >= self.min_range ** 2) & (r2 <= self.max_range ** 2)
        kept = pts[keep]
        room = self.capacity - sum(len(s) for s in self._scans)
        kept = kept[:max(room, 0)]
        self._scans.append(kept @ T[:3, :3].T + T[:3, 3])
        self._n_scans += 1
        return len(kept)

    @property
    def count(self) -> int:
        if self._h is not None:
            return int(self._lib.aicp_accum_count(self._h))
        return sum(len(s) for s in self._scans)

    @property
    def finished(self) -> bool:
        if self._h is not None:
            return bool(self._lib.aicp_accum_finished(self._h))
        return self._n_scans >= self.batch_size

    def take(self) -> np.ndarray:
        """Returns the accumulated odom-frame cloud and resets."""
        if self._h is not None:
            out = np.empty((self.capacity, 3), np.float32)
            n = self._lib.aicp_accum_take(
                self._h, out.ctypes.data_as(_c_float_p), self.capacity)
            return out[:n].copy()
        out = (np.concatenate(self._scans) if self._scans
               else np.zeros((0, 3), np.float32)).astype(np.float32)
        self._scans = []
        self._n_scans = 0
        return out

    def clear(self) -> None:
        if self._h is not None:
            self._lib.aicp_accum_clear(self._h)
        else:
            self._scans = []
            self._n_scans = 0

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.aicp_accum_destroy(self._h)
            self._h = None


# ------------------------------------------------------------ prefetcher

class SequencePrefetcher:
    """Ordered multi-threaded cloud loader. Iterates (index, points, count,
    viewpoint); points is a fixed (capacity, 3) padded float32 array (rows
    past count are zero). Files that fail to read are skipped."""

    def __init__(self, paths: Sequence[str], capacity: int,
                 n_threads: int = 4, window: int = 8, voxel: float = 0.0):
        self.paths = [str(p) for p in paths]
        self.capacity = int(capacity)
        self.voxel = float(voxel)
        self._lib = load()
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = self._lib.aicp_prefetch_create(
                arr, len(self.paths), int(n_threads), int(window),
                self.capacity, ctypes.c_float(self.voxel))
        else:
            self._h = None
            self._py_iter = iter(range(len(self.paths)))

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is not None:
            while True:
                out = np.empty((self.capacity, 3), np.float32)
                vp = (ctypes.c_double * 7)()
                idx = ctypes.c_long()
                n = self._lib.aicp_prefetch_next(
                    self._h, out.ctypes.data_as(_c_float_p), vp,
                    ctypes.byref(idx))
                if n == -1:
                    raise StopIteration
                if n < 0:
                    continue  # unreadable file: skip
                return (int(idx.value), out, int(n),
                        np.asarray(vp[:], np.float64))
        # python fallback: synchronous ordered loads
        while True:
            try:
                i = next(self._py_iter)
            except StopIteration:
                raise
            try:
                pts, vp = read_cloud(self.paths[i])
            except IOError:
                continue
            if self.voxel > 0:
                pts = voxel_downsample(pts, self.voxel, self.capacity)
            if len(pts) > self.capacity:
                stride = len(pts) / self.capacity
                sel = (np.arange(self.capacity) * stride).astype(np.int64)
                pts = pts[sel]
            out = np.zeros((self.capacity, 3), np.float32)
            out[:len(pts)] = pts
            return i, out, len(pts), vp

    def close(self) -> None:
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.aicp_prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()

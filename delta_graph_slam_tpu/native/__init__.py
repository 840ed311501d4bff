"""Native (C++) host runtime components, loaded via ctypes.

``libpcio.so`` implements the host data path (KITTI ingestion, binary PCD
IO, the scan spool, host voxel thinning). Falls back to the pure-Python
implementations in ``io``/``ops`` when the library is absent; ``make -C
delta_graph_slam_tpu/native`` (or import with DGS_BUILD_NATIVE=1) builds it.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpcio.so")
_lib = None


def _try_build():
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build=None):
    """Load (optionally building) libpcio; returns None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if build or (build is None and os.environ.get("DGS_BUILD_NATIVE")):
            if not _try_build():
                return None
        else:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pcio_load_kitti_bin.restype = ctypes.c_int64
    lib.pcio_load_kitti_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
    ]
    lib.pcio_free.argtypes = [ctypes.c_void_p]
    lib.pcio_save_pcd.restype = ctypes.c_int
    lib.pcio_save_pcd.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    lib.pcio_load_pcd.restype = ctypes.c_int64
    lib.pcio_load_pcd.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
    ]
    lib.pcio_voxel_thin.restype = ctypes.c_int64
    lib.pcio_voxel_thin.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    lib.pcio_spool_create.restype = ctypes.c_void_p
    lib.pcio_spool_create.argtypes = [ctypes.c_char_p]
    lib.pcio_spool_append.restype = ctypes.c_int
    lib.pcio_spool_append.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pcio_spool_close.argtypes = [ctypes.c_void_p]
    lib.pcio_spool_open.restype = ctypes.c_void_p
    lib.pcio_spool_open.argtypes = [ctypes.c_char_p]
    lib.pcio_spool_size.restype = ctypes.c_int64
    lib.pcio_spool_size.argtypes = [ctypes.c_void_p]
    lib.pcio_spool_stamp.restype = ctypes.c_double
    lib.pcio_spool_stamp.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pcio_spool_count.restype = ctypes.c_int64
    lib.pcio_spool_count.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pcio_spool_read.restype = ctypes.c_int
    lib.pcio_spool_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    ]
    _lib = lib
    return lib


def _take_array(lib, ptr, n):
    arr = np.ctypeslib.as_array(ptr, shape=(n, 3)).copy()
    lib.pcio_free(ptr)
    return arr


def load_kitti_bin(path):
    lib = load_library()
    if lib is None:
        from ..io.kitti import load_kitti_velodyne_bin

        return load_kitti_velodyne_bin(path)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.pcio_load_kitti_bin(os.fsencode(path), ctypes.byref(out))
    if n < 0:
        raise IOError(f"pcio_load_kitti_bin failed for {path}")
    if n == 0:
        return np.zeros((0, 3), np.float32)
    return _take_array(lib, out, n)


def save_pcd(path, points):
    lib = load_library()
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 3))
    if lib is None:
        from ..io.pcd import save_pcd as py_save

        return py_save(path, pts)
    rc = lib.pcio_save_pcd(
        os.fsencode(path),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts),
    )
    if rc != 0:
        raise IOError(f"pcio_save_pcd failed for {path}")


def load_pcd(path):
    lib = load_library()
    if lib is None:
        from ..io.pcd import load_pcd as py_load

        return py_load(path)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.pcio_load_pcd(os.fsencode(path), ctypes.byref(out))
    if n == -2:
        # unsupported layout -> python fallback
        from ..io.pcd import load_pcd as py_load

        return py_load(path)
    if n < 0:
        raise IOError(f"pcio_load_pcd failed for {path}")
    if n == 0:
        return np.zeros((0, 3), np.float32)
    return _take_array(lib, out, n)


def voxel_thin(points, resolution):
    """Host-side exact voxel-centroid thinning (pre-upload size bound)."""
    lib = load_library()
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 3))
    if lib is None:
        # numpy fallback
        keys = np.floor(pts / resolution).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        sums = np.zeros((len(uniq), 3))
        np.add.at(sums, inv, pts)
        return (sums / np.bincount(inv)[:, None]).astype(np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.pcio_voxel_thin(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        resolution, ctypes.byref(out),
    )
    if n < 0:
        raise RuntimeError("pcio_voxel_thin failed")
    if n == 0:
        return np.zeros((0, 3), np.float32)
    return _take_array(lib, out, n)


class ScanSpool:
    """Packed scan store (write once, replay fast) backed by libpcio."""

    def __init__(self, path, mode="r"):
        lib = load_library(build=True)
        if lib is None:
            raise RuntimeError("native libpcio unavailable")
        self._lib = lib
        self.mode = mode
        if mode == "w":
            self._h = lib.pcio_spool_create(os.fsencode(path))
        else:
            self._h = lib.pcio_spool_open(os.fsencode(path))
        if not self._h:
            raise IOError(f"cannot open spool {path}")

    def append(self, stamp, points):
        pts = np.ascontiguousarray(
            np.asarray(points, np.float32).reshape(-1, 3)
        )
        rc = self._lib.pcio_spool_append(
            self._h, float(stamp),
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        )
        if rc != 0:
            raise IOError("spool append failed")

    def __len__(self):
        return int(self._lib.pcio_spool_size(self._h))

    def stamp(self, i):
        return float(self._lib.pcio_spool_stamp(self._h, i))

    def read(self, i):
        n = int(self._lib.pcio_spool_count(self._h, i))
        buf = np.empty((n, 3), np.float32)
        rc = self._lib.pcio_spool_read(
            self._h, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IOError("spool read failed")
        return buf

    def close(self):
        if self._h:
            self._lib.pcio_spool_close(self._h)
            self._h = None

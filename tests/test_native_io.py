"""Native libpcio tests (skipped when the C++ toolchain is unavailable)."""

import numpy as np
import pytest

from delta_graph_slam_tpu import native

HAVE = native.load_library(build=True) is not None

pytestmark = pytest.mark.skipif(not HAVE, reason="libpcio not built")

RNG = np.random.default_rng(0)


def test_pcd_roundtrip(tmp_path):
    pts = RNG.uniform(-10, 10, (1234, 3)).astype(np.float32)
    path = str(tmp_path / "x.pcd")
    native.save_pcd(path, pts)
    back = native.load_pcd(path)
    np.testing.assert_allclose(back, pts, atol=0)
    # and the python reader can read what the native writer wrote
    from delta_graph_slam_tpu.io.pcd import load_pcd as py_load

    np.testing.assert_allclose(py_load(path), pts, atol=0)


def test_kitti_bin(tmp_path):
    raw = RNG.uniform(-50, 50, (500, 4)).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    raw.tofile(path)
    pts = native.load_kitti_bin(path)
    np.testing.assert_allclose(pts, raw[:, :3], atol=0)


def test_voxel_thin_matches_numpy(tmp_path):
    pts = RNG.uniform(-5, 5, (2000, 3)).astype(np.float32)
    res = 0.7
    got = native.voxel_thin(pts, res)
    keys = np.floor(pts / res).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    want = np.zeros((len(uniq), 3))
    np.add.at(want, inv, pts.astype(np.float64))
    want = (want / np.bincount(inv)[:, None]).astype(np.float32)
    got_s = got[np.lexsort(got.T)]
    want_s = want[np.lexsort(want.T)]
    assert got.shape == want.shape
    np.testing.assert_allclose(got_s, want_s, atol=1e-4)


def test_scan_spool(tmp_path):
    path = str(tmp_path / "scans.spool")
    w = native.ScanSpool(path, "w")
    scans = [RNG.uniform(-1, 1, (n, 3)).astype(np.float32)
             for n in (100, 50, 333)]
    for i, s in enumerate(scans):
        w.append(10.0 + i, s)
    w.close()
    r = native.ScanSpool(path, "r")
    assert len(r) == 3
    for i, s in enumerate(scans):
        assert r.stamp(i) == 10.0 + i
        np.testing.assert_allclose(r.read(i), s, atol=0)
    r.close()

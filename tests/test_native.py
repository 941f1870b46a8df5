"""Native C++ runtime layer: IO round-trips, accumulator, prefetcher,
voxel downsample — validated against the pure-Python fallbacks."""
import os

import numpy as np
import pytest

from aicp_mapping_tpu import native
from aicp_mapping_tpu.io.pcd import read_pcd, write_pcd


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _random_cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-10, 10, (n, 3)).astype(np.float32)


def test_native_pcd_roundtrip(lib, tmp_path):
    pts = _random_cloud()
    vp = (1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0)
    path = str(tmp_path / "a.pcd")
    native.write_pcd(path, pts, viewpoint=vp, binary=True)
    got, got_vp = native.read_cloud(path)
    np.testing.assert_array_equal(got, pts)
    np.testing.assert_allclose(got_vp, vp)


def test_native_reads_python_written_pcd(lib, tmp_path):
    """Cross-validate the native reader against the numpy writer (both
    binary and ascii modes)."""
    pts = _random_cloud(200, seed=1)
    for binary in (True, False):
        path = str(tmp_path / f"b_{binary}.pcd")
        write_pcd(path, pts, binary=binary)
        got, _ = native.read_cloud(path)
        np.testing.assert_allclose(got, pts, atol=1e-5)
        # and the python reader agrees
        py_pts, _ = read_pcd(path)
        np.testing.assert_allclose(got, py_pts, atol=1e-5)


def test_native_kitti_bin(lib, tmp_path):
    rng = np.random.default_rng(2)
    raw = rng.uniform(-50, 50, (1000, 4)).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    raw.tofile(path)
    got, _ = native.read_cloud(path)
    np.testing.assert_array_equal(got, raw[:, :3])


def test_native_ply_ascii_and_binary(lib, tmp_path):
    pts = _random_cloud(50, seed=3)
    # ascii ply with an extra property
    path_a = str(tmp_path / "c.ply")
    with open(path_a, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 50\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nend_header\n")
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 255\n")
    got, _ = native.read_cloud(path_a)
    np.testing.assert_allclose(got, pts, atol=1e-5)

    # binary_little_endian ply, doubles
    path_b = str(tmp_path / "d.ply")
    with open(path_b, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 50\n"
                b"property double x\nproperty double y\nproperty double z\n"
                b"end_header\n")
        f.write(pts.astype("<f8").tobytes())
    got_b, _ = native.read_cloud(path_b)
    np.testing.assert_allclose(got_b, pts, atol=1e-6)


def test_nonfinite_points_filtered(lib, tmp_path):
    pts = _random_cloud(10, seed=4)
    pts[3] = [np.nan, 0, 0]
    pts[7] = [np.inf, 1, 1]
    path = str(tmp_path / "nan.pcd")
    write_pcd(path, pts, binary=True)
    got, _ = native.read_cloud(path)
    assert got.shape == (8, 3)
    assert np.isfinite(got).all()


def test_voxel_downsample_native_matches_python(lib):
    pts = _random_cloud(4000, seed=5)
    nat = native.voxel_downsample(pts, 0.5)
    py = native._voxel_downsample_py(pts, 0.5, len(pts))
    assert nat.shape == py.shape
    np.testing.assert_allclose(nat, py, atol=1e-4)


def test_voxel_downsample_reduces_and_centroids(lib):
    # two clusters of identical points -> exactly two centroids
    pts = np.array([[0.1, 0.1, 0.1]] * 5 + [[5.0, 5.0, 5.0]] * 3, np.float32)
    out = native.voxel_downsample(pts, 1.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], [0.1, 0.1, 0.1], atol=1e-6)
    np.testing.assert_allclose(out[1], [5.0, 5.0, 5.0], atol=1e-6)


def _accum_case(use_native):
    """Accumulator semantics: range crop in sensor frame, transform to odom,
    finished at batch_size (velodyne_accumulator.cpp:31-72)."""
    acc = native.ScanAccumulator(capacity=10000, batch_size=2,
                                 min_range=0.5, max_range=30.0)
    if not use_native:
        acc._h = None
        acc._scans, acc._n_scans = [], 0
    scan = np.array([
        [1.0, 0.0, 0.0],     # kept
        [0.1, 0.0, 0.0],     # < min_range, cropped
        [40.0, 0.0, 0.0],    # > max_range, cropped
        [0.0, 2.0, 0.0],     # kept
    ], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10.0, 0.0, 0.0]
    kept = acc.push(scan, T)
    assert kept == 2
    assert not acc.finished
    kept2 = acc.push(scan, np.eye(4, dtype=np.float32))
    assert kept2 == 2 and acc.finished and acc.count == 4
    out = acc.take()
    assert acc.count == 0 and not acc.finished
    np.testing.assert_allclose(
        out, [[11, 0, 0], [10, 2, 0], [1, 0, 0], [0, 2, 0]], atol=1e-6)
    return out


def test_accumulator_native(lib):
    _accum_case(True)


def test_accumulator_python_fallback():
    _accum_case(False)


def test_prefetcher_ordered_and_padded(lib, tmp_path):
    paths = []
    sizes = [100, 300, 50, 200]
    for i, n in enumerate(sizes):
        pts = _random_cloud(n, seed=10 + i)
        p = str(tmp_path / f"cloud_{i}.pcd")
        write_pcd(p, pts, binary=True)
        paths.append(p)
    # include one unreadable path: must be skipped
    paths.insert(2, str(tmp_path / "missing.pcd"))

    pf = native.SequencePrefetcher(paths, capacity=256, n_threads=3, window=2)
    items = list(pf)
    pf.close()
    idxs = [it[0] for it in items]
    assert idxs == [0, 1, 3, 4]  # ordered, missing skipped
    for (idx, pts, count, vp), n in zip(items, sizes):
        assert pts.shape == (256, 3)
        assert count == min(n, 256)
        assert np.all(pts[count:] == 0)


def test_prefetcher_voxel_mode(lib, tmp_path):
    pts = np.array([[0.1, 0.1, 0.1]] * 50 + [[5.0, 5.0, 5.0]] * 50, np.float32)
    p = str(tmp_path / "v.pcd")
    write_pcd(p, pts, binary=True)
    pf = native.SequencePrefetcher([p], capacity=16, voxel=1.0)
    idx, out, count, _ = next(pf)
    pf.close()
    assert count == 2
    np.testing.assert_allclose(out[0], [0.1, 0.1, 0.1], atol=1e-6)


def test_binary_compressed_corrupt_sizes_rejected(lib, tmp_path):
    """A binary_compressed PCD whose header declares absurd compressed /
    uncompressed sizes must fail with a clean error code, not a multi-GiB
    allocation (std::bad_alloc across the ctypes boundary aborts)."""
    import struct

    header = ("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
              "TYPE F F F\nCOUNT 1 1 1\nWIDTH 10\nHEIGHT 1\n"
              "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 10\nDATA binary_compressed\n")
    for csize, usize in ((0xFFFFFF00, 120), (8, 0xFFFFFF00)):
        path = str(tmp_path / f"corrupt_{csize}_{usize}.pcd")
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(struct.pack("<II", csize, usize))
            f.write(b"\x00" * 8)  # far less data than declared
        with pytest.raises(IOError):
            native.read_cloud(path)


def test_binary_compressed_valid_roundtrip_still_works(lib, tmp_path):
    pts = _random_cloud(300, seed=11)
    path = str(tmp_path / "ok_compressed.pcd")
    write_pcd(path, pts, binary="compressed")
    got, _ = native.read_cloud(path)
    np.testing.assert_allclose(got, pts, atol=1e-6)

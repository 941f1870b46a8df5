"""PCD point-cloud file IO (ASCII + binary), numpy-based.

Replacement for the reference's PCL PCD read/write usage
(cloudIO.cpp:53-67 `savePointCloudPCLwithPose` — sensor pose embedded in the
VIEWPOINT header; app.cpp:269 loadPCDFile). Supports the xyz layout the AICP
pipeline uses; extra fields are read and ignored.
"""
from __future__ import annotations

import numpy as np

_DTYPE_MAP = {
    ("F", 4): np.float32, ("F", 8): np.float64,
    ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
    ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32,
}


def read_pcd(path: str):
    """Returns (points (N, 3) float32, viewpoint (tx,ty,tz,qw,qx,qy,qz))."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition(" ")
            header[key.upper()] = value
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get(
            "COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header["POINTS"])
        viewpoint = np.array(
            [float(v) for v in header.get(
                "VIEWPOINT", "0 0 0 1 0 0 0").split()], dtype=np.float64)

        data_mode = header["DATA"].split()[0]
        np_fields = []
        for name, size, typ, cnt in zip(fields, sizes, types, counts):
            base = _DTYPE_MAP[(typ, size)]
            np_fields.append((name, base, (cnt,)) if cnt > 1 else (name, base))
        dtype = np.dtype(np_fields)

        if data_mode == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n)
            raw = np.atleast_2d(raw)
            cols = {}
            c = 0
            for name, _, cnt in [(fl, sz, ct) for fl, sz, ct in
                                 zip(fields, sizes, counts)]:
                cols[name] = raw[:, c]
                c += cnt
            pts = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        elif data_mode == "binary":
            buf = f.read(dtype.itemsize * n)
            arr = np.frombuffer(buf, dtype=dtype, count=n)
            pts = np.stack([arr["x"], arr["y"], arr["z"]], axis=1)
        elif data_mode == "binary_compressed":
            import lzf  # pragma: no cover - not available; raise clearly
            raise NotImplementedError("binary_compressed PCD not supported")
        else:
            raise ValueError(f"unknown PCD DATA mode {data_mode!r}")

    pts = np.ascontiguousarray(pts, dtype=np.float32)
    finite = np.isfinite(pts).all(axis=1)
    return pts[finite], viewpoint


def write_pcd(path: str, points: np.ndarray,
              viewpoint=(0, 0, 0, 1, 0, 0, 0), binary: bool = True) -> None:
    points = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 3)
    n = points.shape[0]
    vp = " ".join(f"{float(v):g}" for v in viewpoint)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z\n"
        "SIZE 4 4 4\n"
        "TYPE F F F\n"
        "COUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT {vp}\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(points.tobytes())
        else:
            np.savetxt(f, points, fmt="%.6f")


def viewpoint_to_pose(viewpoint: np.ndarray) -> np.ndarray:
    """PCD VIEWPOINT (tx ty tz qw qx qy qz) -> 4x4 pose (float32).

    Same source as the regression test's pose loading from PCD headers
    (aicp_test.cpp:176-185, sensor_origin_/sensor_orientation_)."""
    from ..geometry import se3
    import jax.numpy as jnp
    t = jnp.asarray(viewpoint[:3], jnp.float32)
    q = jnp.asarray([viewpoint[3], viewpoint[4], viewpoint[5], viewpoint[6]],
                    jnp.float32)
    return np.asarray(se3.from_quat_trans(q, t))

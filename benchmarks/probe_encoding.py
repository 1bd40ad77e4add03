"""Background perf probe: encoding pipeline stages at training shape on TPU.

Writes progressive results to stdout; run under nohup/background. Uses a
fresh-input pool per measurement to defeat any dispatch caching.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

NF, L, P, d, T = 32, 16, 12288, 3, 4096

def timeit(name, f, pools, n=8):
    t0 = time.time()
    jax.block_until_ready(f(*pools[0]))
    print(f"{name} [compile+1st {time.time()-t0:.1f}s]", flush=True)
    t0 = time.time()
    for i in range(n):
        jax.block_until_ready(f(*pools[i % len(pools)]))
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)

scales = jnp.asarray(np.geomspace(1.0, 1e-4, 16).astype(np.float32))
shifts = jnp.asarray(np.random.RandomState(0).uniform(0, 10, (16, 3)).astype(np.float32))

ys = [jnp.full((NF, L, P), float(i + 1)) for i in range(4)]
timeit("control 25MB elementwise", jax.jit(lambda x: x * 1.5), [(y,) for y in ys])

pts_sa = [jax.random.normal(jax.random.PRNGKey(i), (NF, 3, P)) for i in range(4)]
def cfs_soa(points):
    return sum((points[i][None, :] / scales[:, None] + shifts[:, i, None]) for i in range(d))
timeit("cfs SoA vmapped", jax.jit(lambda x: jax.vmap(cfs_soa)(x)), [(p,) for p in pts_sa])

pts_ap = [jax.random.normal(jax.random.PRNGKey(i), (NF, P, 3)) for i in range(4)]
from neural_graph_mapping_tpu.ops.encodings import PermutohedralEncoding
from neural_graph_mapping_tpu.ops import permuto
enc = PermutohedralEncoding(pos_dim=3, log2_hashmap_size=12, nr_levels=16,
                            nr_feat_per_level=2, coarsest_scale=1.0, finest_scale=1e-4)
kw = jax.jit(lambda x: jax.vmap(enc._lattice_keys_and_weights)(x))
timeit("keys/weights full", kw, [(p,) for p in pts_ap])

keys = jax.random.split(jax.random.PRNGKey(0), NF)
params = jax.vmap(enc.init)(keys)
fwd = jax.jit(lambda p, x: jax.vmap(enc.apply)(p, x))
timeit("encoding fwd", fwd, [(params, p) for p in pts_ap])

gr = jax.jit(jax.grad(lambda p, x: jax.vmap(enc.apply)(p, x).sum()))
timeit("encoding fwd+bwd", gr, [(params, p) for p in pts_ap])

# MLP-only reference point: what the rest of the field costs
w0 = jax.random.normal(jax.random.PRNGKey(9), (NF, 32, 32))
w1 = jax.random.normal(jax.random.PRNGKey(10), (NF, 32, 4))
feats = [jax.random.normal(jax.random.PRNGKey(i), (NF, P, 32)) for i in range(4)]
mlp = jax.jit(lambda h, a, b: jnp.maximum(jnp.einsum("npi,nij->npj", h, a), 0.0) @ b[0:1][0] if False else jnp.einsum("npi,nij->npj", jnp.maximum(jnp.einsum("npi,nij->npj", h, a), 0.0), b))
timeit("field MLP fwd", mlp, [(h, w0, w1) for h in feats])
print("DONE", flush=True)

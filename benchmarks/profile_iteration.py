"""Per-stage timing of the fused optimization iteration on TPU.

Builds realistic engine state via bench.build_engine, then times:
  sampler-only | render fwd | loss+grad | full iteration
with a pool of distinct PRNG keys per call (defeats any dispatch caching).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import functools

import bench
from neural_graph_mapping_tpu.mapping import optimizer, render, sampling
from neural_graph_mapping_tpu.mapping.engine import optimization_iteration, compute_losses

print("building engine state...", flush=True)
ds, ngm = bench.build_engine()
allocated = ngm._allocated_mask()
cache_c2w = jnp.asarray(ngm._cache_c2w_np)
cache_valid = jnp.asarray(ngm._cache_valid_np)
keys = [jax.random.PRNGKey(i) for i in range(100, 116)]

def timeit(name, f, n=12):
    jax.block_until_ready(f(keys[0]))
    t0 = time.time()
    for i in range(n):
        jax.block_until_ready(f(keys[i % len(keys)]))
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)

fset, camera, rcfg, ocfg, lcfg = ngm._fset, ngm._camera, ngm._rcfg, ngm._ocfg, ngm._loss_cfg
F = ngm._num_train_fields
params = ngm._params
adam = ngm._adam
ma = ngm._map_arrays

# A: field selection + sampler
@jax.jit
def sampler_only(key):
    k_sel, k_sample = jax.random.split(key)
    fids, fval = sampling.select_target_fields(k_sel, ngm._observed_mask, allocated, F)
    t = sampling.sample_target_mv(
        k_sample, camera, fids, fval, ma.positions,
        ngm._cache_rgb, ngm._cache_depth, cache_c2w, cache_valid,
        fset.field_radius, lcfg.num_rays_per_field)
    return t.rgbds.sum() + t.near_distances.sum()
timeit("A sampler", sampler_only)

# build one fixed target for the render-only stages
k_sel, k_sample = jax.random.split(keys[0])
fids, fval = sampling.select_target_fields(k_sel, ngm._observed_mask, allocated, F)
target = sampling.sample_target_mv(
    k_sample, camera, fids, fval, ma.positions,
    ngm._cache_rgb, ngm._cache_depth, cache_c2w, cache_valid,
    fset.field_radius, lcfg.num_rays_per_field)
target = jax.tree_util.tree_map(lambda x: jax.device_put(x), target)
sub_pos = ma.positions[target.field_ids]
sub_quat = ma.orientations[target.field_ids]
sub_params = fset.gather_fields(params, target.field_ids)

# B: render forward only
@jax.jit
def render_fwd(key):
    pred = render.render_rays_vmap(fset, sub_params, sub_pos, sub_quat, camera, target, key, rcfg)
    return pred.rgbds.sum() + pred.term_probs.sum()
timeit("B render fwd", render_fwd)

# C: loss + grad
@jax.jit
def loss_grad(key):
    def loss_fn(sp):
        pred = render.render_rays_vmap(fset, sp, sub_pos, sub_quat, camera, target, key, rcfg)
        c, _ = compute_losses(lcfg, rcfg, target, pred)
        return c
    l, g = jax.value_and_grad(loss_fn)(sub_params)
    return l + g["w0"].sum()
timeit("C loss+grad", loss_grad)

# D: adam slice update alone (uses grads == params slice as dummy)
@jax.jit
def adam_only(key):
    p2, a2 = optimizer.adam_slice_update(
        ocfg, params, adam, target.field_ids, target.field_valid, sub_params, sub_params)
    return p2["w0"].sum() + a2.steps.sum()
timeit("D adam gather/scatter", adam_only)

# E: full iteration
def full(key):
    p, a, ti, ld = optimization_iteration(
        fset, camera, rcfg, ocfg, lcfg, F,
        params, adam, ma.training_iterations, ma.positions, ma.orientations,
        allocated, ngm._observed_mask, ngm._cache_rgb, ngm._cache_depth,
        cache_c2w, cache_valid, key)
    return p["w0"]
timeit("E full iteration", full)
print("DONE", flush=True)

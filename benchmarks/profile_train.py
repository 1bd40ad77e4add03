"""Stage-level profiling of the training iteration on the live chip.

Times jitted sub-programs of the fused optimization iteration (sampler only,
forward render, value_and_grad, full iteration with Adam) at the reference
workload constants, each as a lax.scan over iterations to amortize dispatch
overhead. Prints per-iteration milliseconds per stage.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import functools
import jax.numpy as jnp
import numpy as np

from bench import build_engine
from neural_graph_mapping_tpu.mapping import optimizer, render, sampling
from neural_graph_mapping_tpu.mapping.engine import compute_losses


def main():
    ds, ngm = build_engine()
    fset, camera, rcfg, ocfg, loss_cfg = (
        ngm._fset, ngm._camera, ngm._rcfg, ngm._ocfg, ngm._loss_cfg
    )
    ntf = ngm._num_train_fields
    allocated = ngm._allocated_mask()
    observed = ngm._observed_mask
    cache_c2w = jnp.asarray(ngm._cache_c2w_np)
    cache_valid = jnp.asarray(ngm._cache_valid_np)
    positions = ngm._map_arrays.positions
    orientations = ngm._map_arrays.orientations
    cache_rgb, cache_depth = ngm._cache_rgb, ngm._cache_depth
    params, adam = ngm._params, ngm._adam
    ti = ngm._map_arrays.training_iterations
    n_iters = 30

    def sample_only(key):
        k_sel, k_sample, _ = jax.random.split(key, 3)
        field_ids, field_valid = sampling.select_target_fields(
            k_sel, observed, allocated, ntf
        )
        return sampling.sample_target_mv(
            k_sample, camera, field_ids, field_valid, positions,
            cache_rgb, cache_depth, cache_c2w, cache_valid,
            fset.field_radius, loss_cfg.num_rays_per_field,
        )

    def fwd(key):
        k_sel, k_sample, k_render = jax.random.split(key, 3)
        field_ids, field_valid = sampling.select_target_fields(
            k_sel, observed, allocated, ntf
        )
        target = sampling.sample_target_mv(
            k_sample, camera, field_ids, field_valid, positions,
            cache_rgb, cache_depth, cache_c2w, cache_valid,
            fset.field_radius, loss_cfg.num_rays_per_field,
        )
        sub_positions = positions[target.field_ids]
        sub_orientations = orientations[target.field_ids]
        sub_params = fset.gather_fields(params, target.field_ids)
        pred = render.render_rays_vmap(
            fset, sub_params, sub_positions, sub_orientations, camera, target,
            k_render, rcfg,
        )
        combined, _ = compute_losses(loss_cfg, rcfg, target, pred)
        return combined

    def grad_only(key):
        k_sel, k_sample, k_render = jax.random.split(key, 3)
        field_ids, field_valid = sampling.select_target_fields(
            k_sel, observed, allocated, ntf
        )
        target = sampling.sample_target_mv(
            k_sample, camera, field_ids, field_valid, positions,
            cache_rgb, cache_depth, cache_c2w, cache_valid,
            fset.field_radius, loss_cfg.num_rays_per_field,
        )
        sub_positions = positions[target.field_ids]
        sub_orientations = orientations[target.field_ids]
        sub_params = fset.gather_fields(params, target.field_ids)

        def loss_fn(sp):
            pred = render.render_rays_vmap(
                fset, sp, sub_positions, sub_orientations, camera, target,
                k_render, rcfg,
            )
            c, _ = compute_losses(loss_cfg, rcfg, target, pred)
            return c

        g = jax.grad(loss_fn)(sub_params)
        return g["w0"].sum()

    @jax.jit
    def full_iter(params, adam, ti, key):
        from neural_graph_mapping_tpu.mapping.engine import optimization_iteration
        return optimization_iteration(
            fset, camera, rcfg, ocfg, loss_cfg, ntf, params, adam, ti,
            positions, orientations, allocated, observed,
            cache_rgb, cache_depth, cache_c2w, cache_valid, key,
        )

    def scan_of(fn, reduce_out):
        @jax.jit
        def run(key):
            keys = jax.random.split(key, n_iters)
            return jax.lax.scan(
                lambda c, k: (reduce_out(fn(k)) + c, None), 0.0, keys
            )[0]
        return run

    def timeit(name, run, *args):
        out = run(*args)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = run(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name:28s} {dt / n_iters * 1000:8.3f} ms/iter")
        return dt

    key = jax.random.PRNGKey(3)

    run_sample = scan_of(sample_only, lambda t: t.gt_distances.sum())
    run_fwd = scan_of(fwd, lambda x: x)
    run_grad = scan_of(grad_only, lambda x: x)

    @jax.jit
    def run_full(params, adam, ti, key):
        keys = jax.random.split(key, n_iters)

        def body(carry, k):
            p, a, t = carry
            p, a, t, ld = full_iter(p, a, t, k)
            return (p, a, t), None

        (p, a, t), _ = jax.lax.scan(body, (params, adam, ti), keys)
        return p["w0"].sum()

    import os
    stages = os.environ.get("PROFILE_STAGES", "sample,fwd,grad,full").split(",")
    if "sample" in stages:
        timeit("sampler only", run_sample, key)
    if "fwd" in stages:
        timeit("sampler+fwd render+loss", run_fwd, key)
    if "grad" in stages:
        timeit("sampler+value_and_grad", run_grad, key)
    if "full" in stages:
        timeit("full iteration (adam)", run_full, params, adam, ti, key)


if __name__ == "__main__":
    main()

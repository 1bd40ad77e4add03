"""Field-count scale sweep (VERDICT r4 item 5).

BASELINE config[4] is a 1000+-field map; bench.py and the render benches run
at ~128 allocated fields. This sweeps N_alloc in {128, 512, 2048}: the
training step gathers/scatters per-field params over the full capacity, the
tiled render dispatch sorts all routed pairs, and topk2_fields unrolls an
N/2048-chunk loop inside the kernel — all three could cliff with N.

Per N: grow the warm bench engine to N allocated fields (extra fields placed
on a jittered grid around the existing map, params freshly initialized),
then time (a) the 5-iteration training scan (bench.py workload: 32 train
fields x 512 rays x 24 samples — the ACTIVE workload is constant by design;
what scales is the capacity machinery) and (b) one 8192-ray render block at
span 512 through the real render_image path.

Usage: python benchmarks/scale_sweep.py [N ...]   (default: 128 512 2048)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

import bench
from neural_graph_mapping_tpu.mapping import map_state, optimizer
from neural_graph_mapping_tpu.mapping.engine import optimization_iterations_scan
import neural_graph_mapping_tpu.camera as cam_mod


def grow_to(ngm, n_target: int, key):
    """Allocate fields up to n_target: jittered grid positions inside the
    existing map's bounding box (+1 m), identity orientations, fresh params,
    zero Adam state — the same state shape a long real run reaches."""
    n_now = ngm.num_fields
    n_new = n_target - n_now
    assert n_new >= 0
    if n_new == 0:
        return
    pos = np.asarray(ngm._map_arrays.positions[:n_now])
    lo, hi = pos.min(0) - 1.0, pos.max(0) + 1.0
    kp, kq = jax.random.split(key)
    new_pos = jax.random.uniform(
        kp, (n_new, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    )
    while ngm.capacity < n_target:
        ngm._map_arrays = map_state.grow_capacity(
            ngm._map_arrays, ngm.capacity * 2
        )
        ngm._params = jax.tree_util.tree_map(
            lambda p: jnp.concatenate([p, jnp.zeros_like(p)], axis=0), ngm._params
        )
    fresh = ngm._fset.init_fields(kq, ngm.capacity)
    mask = (jnp.arange(ngm.capacity) >= n_now) & (jnp.arange(ngm.capacity) < n_target)

    def mix(old, new):
        m = mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(m, new, old)

    ngm._params = jax.tree_util.tree_map(mix, ngm._params, fresh)
    ma = ngm._map_arrays
    ngm._map_arrays = ma._replace(
        positions=ma.positions.at[n_now:n_target].set(new_pos),
        orientations=ma.orientations.at[n_now:n_target].set(
            jnp.array([1.0, 0.0, 0.0, 0.0])
        ),
        kf_ids=ma.kf_ids.at[n_now:n_target].set(0),
        training_iterations=ma.training_iterations.at[n_now:n_target].set(100),
    )
    ngm._num_fields = n_target
    ngm._adam = optimizer.init_adam_state(ngm._params)
    # pad the observed mask to the grown capacity, then mark a few of the
    # new fields observed so selection mixes old/new
    obs = jnp.zeros((ngm.capacity,), bool).at[: ngm._observed_mask.shape[0]].set(
        ngm._observed_mask
    )
    ngm._observed_mask = obs | (
        (jnp.arange(ngm.capacity) >= n_now)
        & (jnp.arange(ngm.capacity) < n_now + 8)
    )


def time_train(ngm, frames=10):
    allocated = ngm._allocated_mask()
    cache_c2w = jnp.asarray(ngm._cache_c2w_np)
    cache_valid = jnp.asarray(ngm._cache_valid_np)

    def one_frame(params, adam, ti, key):
        return optimization_iterations_scan(
            ngm._fset, ngm._camera, ngm._rcfg, ngm._ocfg, ngm._loss_cfg,
            ngm._num_train_fields, ngm._num_iterations_per_frame,
            params, adam, ti,
            ngm._map_arrays.positions, ngm._map_arrays.orientations,
            allocated, ngm._observed_mask,
            ngm._cache_rgb, ngm._cache_depth, cache_c2w, cache_valid,
            key,
        )

    params, adam, ti = ngm._params, ngm._adam, ngm._map_arrays.training_iterations
    # keys pre-split outside the timed loop: per-frame jax.random.split costs
    # ~22 ms through the relay and serializes the pipeline (see bench.py r5)
    all_keys = jax.random.split(jax.random.PRNGKey(11), 2 * frames + 1)
    jax.block_until_ready(all_keys)
    params, adam, ti, _ = one_frame(params, adam, ti, all_keys[-1])  # compile
    jax.block_until_ready(params["w0"])
    best = float("inf")
    for p in range(2):
        t0 = time.time()
        for i in range(frames):
            params, adam, ti, _ = one_frame(params, adam, ti, all_keys[p * frames + i])
        jax.block_until_ready(params["w0"])
        best = min(best, time.time() - t0)
    rays = frames * ngm._num_iterations_per_frame * (
        ngm._num_train_fields * ngm._loss_cfg.num_rays_per_field
    )
    # the scan donates its inputs — rebind the engine state to the live
    # outputs so the render path below doesn't read deleted buffers
    ngm._params, ngm._adam = params, adam
    ngm._map_arrays = ngm._map_arrays._replace(training_iterations=ti)
    return rays / best


def time_render_block(ngm, ds, block=8192, span=512):
    camera = cam_mod.Camera.create(
        width=640, height=480, fx=554.256, fy=554.256, cx=320.0, cy=240.0
    )
    ngm._eval_span_samples = span
    ngm._eval_num_samples = span
    ngm._pixel_block_size = block
    c2w = jnp.asarray(ds[5]["c2w"])
    n_blocks = -(-camera.width * camera.height // block)
    rgbd, _ = ngm.render_image(c2w, camera)  # compile
    jax.block_until_ready(rgbd)
    t0 = time.time()
    rgbd, _ = ngm.render_image(c2w, camera)
    jax.block_until_ready(rgbd)
    dt = time.time() - t0
    return dt / n_blocks * 1e3, dt


def main():
    targets = [int(a) for a in sys.argv[1:]] or [128, 512, 2048]
    for n in targets:
        ds, ngm = bench.build_engine()
        if ngm.num_fields > n:
            print(f"N={n}: skipped (warm engine already has {ngm.num_fields})")
            continue
        grow_to(ngm, n, jax.random.PRNGKey(n))
        rays = time_train(ngm)
        ms_block, frame_s = time_render_block(ngm, ds)
        print(
            f"N={n}: train {rays/1e6:.3f}M rays/s ({rays/2457600:.4f}x), "
            f"render {ms_block:.1f} ms/block ({frame_s:.2f} s/640x480 frame)",
            flush=True,
        )


if __name__ == "__main__":
    main()

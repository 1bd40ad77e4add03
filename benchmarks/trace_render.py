"""Capture a jax.profiler trace of the tiled full-image render block and print
the top self-time ops (parsed from the perfetto trace JSON — see _traceutil).

The render path (engine.render_block_tiled_jit -> fields.apply_knn_tiled) is
the protocol-speed bottleneck for evaluate_full (ref run_mapping.py:403-437);
this names the ops inside the ~200 ms 8192-ray block so perf work targets the
right decomposition stage.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from bench import build_engine
from neural_graph_mapping_tpu.mapping.engine import render_block_tiled_jit


def main():
    ds, ngm = build_engine()
    import neural_graph_mapping_tpu.camera as cam_mod

    camera = cam_mod.Camera.create(
        width=160, height=120, fx=140.0, fy=140.0, cx=80.0, cy=60.0
    )
    c2w = jnp.asarray(ds[5]["c2w"])
    block = 8192
    span = 512
    print(
        f"fields={ngm.num_fields} cap={ngm.capacity} block={block} span={span}",
        flush=True,
    )

    # canonical row-major pixel block (the render_image layout) so the
    # ray-regenerating kernel path is representative
    ii, jj = np.meshgrid(np.arange(camera.height), np.arange(camera.width), indexing="ij")
    ijs_all = np.stack([ii, jj], -1).reshape(-1, 2).astype(np.float32)
    ijs = jnp.asarray(
        np.concatenate([ijs_all] * (block // len(ijs_all) + 1))[:block]
    )
    ks = ngm._fset.num_knn * span
    use_ray = (ks & (ks - 1)) == 0
    print(f"use_ray_kernel={use_ray}", flush=True)

    def one_block(key):
        return render_block_tiled_jit(
            ngm._fset, camera, ngm._rcfg, span,
            ngm._eval_near, ngm._eval_far,
            ngm._params, ngm._map_arrays.positions,
            ngm._map_arrays.orientations, ngm._allocated_mask(),
            ijs, c2w, key,
            use_ray_kernel=use_ray,
            block_offset=jnp.asarray(0.0),
        )

    key = jax.random.PRNGKey(3)
    key, sub = jax.random.split(key)
    out = one_block(sub)
    jax.block_until_ready(out[0])

    # steady-state timing (fresh keys; relay overhead is bimodal — report min)
    times = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        t0 = time.time()
        out = one_block(sub)
        jax.block_until_ready(out[0])
        times.append(time.time() - t0)
    print(f"steady block: min {min(times)*1e3:.1f} ms  med {sorted(times)[3]*1e3:.1f} ms", flush=True)

    trace_dir = "/tmp/jax_trace_render"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            out = one_block(sub)
        jax.block_until_ready(out[0])

    from _traceutil import print_top_ops

    print_top_ops(trace_dir, n_iters=3)


if __name__ == "__main__":
    main()

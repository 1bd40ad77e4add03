"""Time a full 640x480 frame render — the reference's eval protocol shape.

The eval protocol renders held-out keyframes at the dataset's native
resolution (reference run_mapping.py:1976-2020; NRGBD/Replica are 640x480).
VERDICT r3 set <=5 s/frame as the bar for making eval_render_scale=1.0 the
default. This measures the real engine path (``render_image``) end to end:
span-restricted sampling, tile-sorted MoE dispatch, in-kernel ray
regeneration, quadrature — wall-clock per frame plus the per-block count so
relay overhead (~30 ms/dispatch) is attributable.

Usage: python benchmarks/frame_render_bench.py [span_samples] [block_size]
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

from bench import build_engine


def main():
    span = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    ds, ngm = build_engine()
    import neural_graph_mapping_tpu.camera as cam_mod

    camera = cam_mod.Camera.create(
        width=640, height=480, fx=554.256, fy=554.256, cx=320.0, cy=240.0
    )
    ngm._eval_span_samples = span
    ngm._eval_num_samples = span
    ngm._pixel_block_size = block
    c2w = jnp.asarray(ds[5]["c2w"])
    n_blocks = -(-camera.width * camera.height // block)
    print(f"fields={ngm.num_fields} cap={ngm.capacity} span={span} "
          f"block={block} blocks/frame={n_blocks}", flush=True)

    rgbd, _ = ngm.render_image(c2w, camera)  # compile
    jax.block_until_ready(rgbd)
    times = []
    for _ in range(3):
        t0 = time.time()
        rgbd, _ = ngm.render_image(c2w, camera)
        jax.block_until_ready(rgbd)
        times.append(time.time() - t0)
    best = min(times)
    print(f"640x480 frame: min {best:.2f} s  med {sorted(times)[1]:.2f} s "
          f"({best / n_blocks * 1e3:.1f} ms/block incl. overhead)", flush=True)
    d = np.asarray(rgbd[..., 3])
    print(f"depth sanity: mean {d[d > 0].mean():.2f} m, finite {np.isfinite(d).all()}")


if __name__ == "__main__":
    main()

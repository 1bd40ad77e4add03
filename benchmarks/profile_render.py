"""Eval-render timing: tiled span-restricted path vs capacity-probe path.

Builds the bench engine (real map content), renders one full frame each way,
times steady-state renders, and reports the per-frame wall time plus the
agreement between the two paths (the tiled path must match where the capacity
path dropped nothing).
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


def main():
    ds, ngm = build_engine()
    import neural_graph_mapping_tpu.camera as cam_mod

    # small eval camera (the round-1 quality protocol used 160x120)
    camera = cam_mod.Camera.create(
        width=160, height=120, fx=140.0, fy=140.0, cx=80.0, cy=60.0,
    )
    c2w = jnp.asarray(ds[5]["c2w"])
    print(f"fields={ngm.num_fields} cap={ngm.capacity} "
          f"eval_samples={ngm._eval_num_samples} span_samples={ngm._eval_span_samples}")

    # -- tiled path ---------------------------------------------------------
    t0 = time.time()
    rgbd_t, _ = ngm.render_image(c2w, camera)
    jax.block_until_ready(rgbd_t)
    t_compile = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        rgbd_t, _ = ngm.render_image(c2w, camera)
    jax.block_until_ready(rgbd_t)
    t_tiled = (time.time() - t0) / reps
    print(f"tiled render: {t_tiled * 1000:.1f} ms/frame (first incl compile {t_compile:.1f} s)")

    # -- capacity path ------------------------------------------------------
    t0 = time.time()
    rgbd_c, _ = ngm.render_image(c2w, camera, capacity_per_field=1 << 17)
    jax.block_until_ready(rgbd_c)
    t_compile = time.time() - t0
    t0 = time.time()
    rgbd_c, _ = ngm.render_image(c2w, camera, capacity_per_field=1 << 17)
    jax.block_until_ready(rgbd_c)
    t_cap = time.time() - t0
    print(f"capacity render: {t_cap * 1000:.1f} ms/frame (first incl compile {t_compile:.1f} s)")

    a, b = np.asarray(rgbd_t), np.asarray(rgbd_c)
    # the paths sample different distances; compare where both saw surface
    both = (a[..., 3] > 0.05) & (b[..., 3] > 0.05)
    print(f"depth>0 agreement: tiled {float((a[...,3]>0.05).mean()):.3f} "
          f"capacity {float((b[...,3]>0.05).mean()):.3f}")
    if both.any():
        print(f"mean |depth diff| where both hit: {np.abs(a[...,3]-b[...,3])[both].mean():.4f} m")
        print(f"mean |rgb diff| where both hit: {np.abs(a[...,:3]-b[...,:3])[both].mean():.4f}")


if __name__ == "__main__":
    main()

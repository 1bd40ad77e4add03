"""End-to-end smoke drive: fit one neural field to a synthetic RGB-D scene.

Exercises the full public pipeline — ray sampling -> field-set vmap
evaluation (permutohedral encoding + MLP) -> volume-rendering quadrature ->
mapping losses -> optax Adam — on whatever backend is default (TPU under
axon), then renders the scene back and reports depth/color errors and the
vmap-vs-KNN path consistency. Used by the project verify skill.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from neural_graph_mapping_tpu.camera import Camera
from neural_graph_mapping_tpu.models import NeuralFieldSet
from neural_graph_mapping_tpu.ops import losses, quadrature


def main(iters: int = 300) -> None:
    print("backend:", jax.default_backend(), jax.devices())
    cam = Camera.create(width=80, height=60, fx=70.0, fy=70.0, cx=40.0, cy=30.0)

    fset = NeuralFieldSet(
        dim_points=3,
        field_type="neural_graph_mapping_tpu.models.fields.NeuralField",
        field_kwargs=dict(
            encoding_type="neural_graph_mapping_tpu.ops.encodings.PermutohedralEncoding",
            encoding_kwargs=dict(
                pos_dim=3, log2_hashmap_size=12, nr_levels=16, nr_feat_per_level=2,
                coarsest_scale=1.0, finest_scale=1e-4, init_scale=1e-5,
            ),
            num_layers=1, dim_out=4,
        ),
        num_knn=2, distance_factor=10.0, outside_value=1.0,
        field_radius=1.0, scale_mode="unit_cube",
    )
    params = fset.init_fields(jax.random.PRNGKey(0), 1)
    positions = jnp.asarray([[0.0, 0.0, -2.0]])
    orientations = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])

    sphere_c = jnp.asarray([0.0, 0.0, -2.0])
    sphere_r = 0.5

    def gt_ray(ijs):
        dirs = cam.ijs_to_directions(ijs, "opengl")
        oc = -sphere_c
        b = jnp.sum(dirs * oc, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - sphere_r**2
        disc = b * b - c
        hit = disc > 0
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where(hit & (t > 0), t, 0.0)
        normal = (dirs * t[..., None] - sphere_c) / sphere_r
        color = jnp.where(hit[..., None], 0.5 + 0.5 * normal, 0.0)
        return t, color, hit

    R, S, TRUNC = 1024, 24, 0.1
    opt = optax.adam(1e-3, eps=1e-15)
    opt_state = opt.init(params)

    def step(params, opt_state, key):
        k1, k2 = jax.random.split(key)
        ijs = jax.random.uniform(k1, (R, 2)) * jnp.asarray([cam.height - 1, cam.width - 1])
        gt_dist, gt_color, hit = gt_ray(ijs)
        near, far = jnp.full((R,), 1.0), jnp.full((R,), 3.0)

        def loss_fn(p):
            pts, dists = cam.sample_ijs_uniform(k2, ijs, S, near, far)
            outs = fset.apply_vmap(p, pts.reshape(1, -1, 3), positions, orientations)
            outs = outs.reshape(R, S, 4)
            q = quadrature.quadrature(
                "nrgbd", outs[..., :3], outs[..., 3], dists, -pts[..., 2],
                geometry_factor=20.0,
            )
            l_ph = losses.photometric_loss("l1", gt_color, q.colors, mask=hit)
            l_d = losses.depth_loss("huber", gt_dist, q.depths, mask=hit)
            fs_mask = (dists < (gt_dist[:, None] - TRUNC)) & hit[:, None]
            l_fs = losses.freespace_loss(outs[..., 3], TRUNC, fs_mask)
            deltas = gt_dist[:, None] - dists
            ts_mask = (jnp.abs(deltas) < TRUNC) & hit[:, None]
            l_ts = losses.tsdf_loss(outs[..., 3], deltas, TRUNC, ts_mask)
            return l_ph + l_d + 40.0 * l_fs + 50.0 * l_ts, (l_ph, l_d)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    step_jit = jax.jit(step)
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    for i in range(iters + 1):
        key, sub = jax.random.split(key)
        params, opt_state, loss, (l_ph, l_d) = step_jit(params, opt_state, sub)
        if i % 100 == 0:
            print(f"iter {i:4d}  loss {float(loss):.4f}  "
                  f"photo {float(l_ph):.4f}  depth {float(l_d):.5f}")
    dt = time.time() - t0
    print(f"{iters} iters in {dt:.1f}s  ({iters * R / dt:,.0f} rays/s)")

    # full-image render + error report
    ii, jj = jnp.meshgrid(jnp.arange(cam.height), jnp.arange(cam.width), indexing="ij")
    ijs = jnp.stack([ii, jj], -1).reshape(-1, 2).astype(jnp.float32)
    gt_dist, gt_color, hit = gt_ray(ijs)
    n = ijs.shape[0]
    pts, dists = cam.sample_ijs_uniform(
        jax.random.PRNGKey(7), ijs, 64, jnp.full((n,), 1.0), jnp.full((n,), 3.0)
    )
    outs = fset.apply_vmap(params, pts.reshape(1, -1, 3), positions, orientations)
    outs = outs.reshape(n, 64, 4)
    q = quadrature.quadrature(
        "nrgbd", outs[..., :3], outs[..., 3], dists, -pts[..., 2], geometry_factor=20.0
    )
    depth_err = jnp.abs(q.depths - cam.distance_to_depth(gt_dist, ijs))
    print(f"depth L1 on surface: {float(losses.masked_mean(depth_err, hit))*100:.2f} cm")
    print(f"color L1 on surface: {float(losses.masked_mean(jnp.abs(q.colors - gt_color), hit[:, None])):.3f}")
    print(f"term prob on surface: {float(losses.masked_mean(q.term_probs, hit)):.3f}")

    sel = jnp.arange(0, n, 13)
    pts_sel = pts[sel].reshape(-1, 3)
    # tiled MoE dispatch: evaluates every routed pair (the fixed-capacity
    # path silently drops pairs once demand exceeds `capacity`)
    knn_out = fset.apply_knn_tiled(
        params, pts_sel, positions, orientations, jnp.ones(1, bool)
    )
    inside = jnp.linalg.norm(pts_sel - positions[0], axis=-1) < 1.0
    diff = jnp.abs(knn_out - outs[sel].reshape(-1, 4)).max(axis=-1)
    print("knn-vs-vmap max diff (inside pts):",
          float(jnp.where(inside, diff, 0.0).max()))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)

"""Device-side training-target samplers (static shapes, mask semantics).

Rebuild of the reference's target samplers:

- multi-view (`_sample_target_mv`, run_mapping.py:1261-1459): pick target
  fields (half currently-observed, half random), find keyframes that see each
  field via sphere-surface sample projection into every cached keyframe,
  sample rays inside the per-(field, keyframe) 2D bounding box, and build
  RGB/depth/termination supervision targets.
- single-view (`_sample_target_sv`, run_mapping.py:1463-1583): intersect the
  current depth cloud's view rays with active field spheres.
- observed-field test (`_get_observed_fields`, run_mapping.py:1643-1670).

Everything here runs inside jit with static shapes: where the reference drops
fields/rays by boolean indexing, we carry validity masks; where it uses
``torch.multinomial``, we use masked Gumbel top-k (without replacement) or
masked categorical draws (with replacement).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neural_graph_mapping_tpu import geometry
from neural_graph_mapping_tpu.camera import Camera
from neural_graph_mapping_tpu.utils import transforms


class Target(NamedTuple):
    """Supervision targets for one optimization iteration (cf. the reference's
    ``Target`` namedtuple, run_mapping.py:43-58) plus a per-field validity
    mask replacing its dynamic field filtering (run_mapping.py:1365-1380)."""

    ijs: jnp.ndarray  # (F, R, 2) int pixel (row, col)
    c2ws: jnp.ndarray  # (F, R, 4, 4) camera-to-world per ray
    near_distances: jnp.ndarray  # (F, R)
    far_distances: jnp.ndarray  # (F, R)
    gt_distances: jnp.ndarray  # (F, R) 0 = unavailable
    field_ids: jnp.ndarray  # (F,)
    field_valid: jnp.ndarray  # (F,) False -> all its rays masked out
    rgbds: jnp.ndarray  # (F, R, 4)
    rgb_mask: jnp.ndarray  # (F, R)
    depth_mask: jnp.ndarray  # (F, R)
    term_probs: jnp.ndarray  # (F, R)
    term_mask: jnp.ndarray  # (F, R)


def masked_choice_without_replacement(
    key: jax.Array, mask: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw up to k distinct indices where mask is True (Gumbel top-k).

    Replaces ``torch.multinomial(mask, k)`` (run_mapping.py:1296-1311).

    Returns:
        idx: (k,) indices (arbitrary where invalid).
        valid: (k,) True for draws backed by a True mask entry.
    """
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, mask.shape) + 1e-20) + 1e-20)
    scores = jnp.where(mask, gumbel, -jnp.inf)
    top, idx = jax.lax.top_k(scores, k)
    return idx, jnp.isfinite(top)


def select_target_fields(
    key: jax.Array,
    observed_mask: jnp.ndarray,  # (N_cap,) currently-observed fields
    allocated_mask: jnp.ndarray,  # (N_cap,) fields that exist
    num_train_fields: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Half currently-observed, half random fields (run_mapping.py:1295-1317).

    Returns (field_ids (F,), field_valid (F,)) — distinct valid ids.
    """
    k_obs = num_train_fields // 2
    k1, k2 = jax.random.split(key)
    obs_ids, obs_ok = masked_choice_without_replacement(
        k1, observed_mask & allocated_mask, k_obs
    )
    chosen = jnp.zeros_like(allocated_mask).at[obs_ids].set(obs_ok, mode="drop")
    rand_mask = allocated_mask & ~chosen
    # the reference backfills missing observed slots with EXTRA random fields
    # so min(num_train_fields, num_fields) always train (run_mapping.py:
    # 1300-1310: num_missing_fields random draws, not a fixed half). Draw a
    # full num_train_fields of random candidates; each invalid observed slot
    # takes the next unused one.
    rand_ids, rand_ok = masked_choice_without_replacement(
        k2, rand_mask, num_train_fields
    )
    k_rand = num_train_fields - k_obs
    fill_idx = k_rand + jnp.cumsum(~obs_ok) - 1  # rank among invalid slots
    fill_idx = jnp.clip(fill_idx, 0, num_train_fields - 1)
    obs_ids = jnp.where(obs_ok, obs_ids, rand_ids[fill_idx])
    obs_ok = obs_ok | (~obs_ok & rand_ok[fill_idx])
    field_ids = jnp.concatenate([obs_ids, rand_ids[:k_rand]])
    field_valid = jnp.concatenate([obs_ok, rand_ok[:k_rand]])
    # invalid slots point at field 0 to keep gathers in range
    field_ids = jnp.where(field_valid, field_ids, 0)
    return field_ids, field_valid


def observed_fields_mask(
    key: jax.Array,
    camera: Camera,
    depth_image: jnp.ndarray,  # (H, W)
    c2w: jnp.ndarray,  # (4, 4)
    field_positions: jnp.ndarray,  # (N_cap, 3)
    allocated_mask: jnp.ndarray,  # (N_cap,)
    field_radius: float,
    num_points: int = 500,
) -> jnp.ndarray:
    """Which fields intersect view rays of the current frame
    (run_mapping.py:1643-1670). Returns (N_cap,) bool."""
    points, _, valid = camera.depth_to_points_full(depth_image, "opengl")
    probs = jnp.where(valid, 1.0, 0.0)
    sel = jax.random.categorical(
        key, jnp.log(probs + 1e-20), shape=(num_points,)
    )
    pts = points[sel]  # camera frame
    pts_ok = valid[sel]
    field_pos_c = transforms.transform_points(field_positions, c2w, inv=True)
    origin = jnp.zeros((1, 3))
    # (N_cap, num_points) sphere-vs-segment intersections
    hits = geometry.segments_intersect_spheres(
        jnp.broadcast_to(origin, pts.shape), pts, field_pos_c, field_radius
    )
    hits = hits & pts_ok[None, :]
    return jnp.any(hits, axis=-1) & allocated_mask


_VIS_POOL = 4  # visibility-depth max-pool factor (TPU path)
# NGM_VIS_EXACT=1 forces the exact per-pixel gather on all backends — the
# A/B switch for quantifying the max-pool approximation (VERDICT r2 Weak #6)
_VIS_EXACT = os.environ.get("NGM_VIS_EXACT", "") == "1"


def _visibility_depths(
    cache_depth: jnp.ndarray,  # (S, H, W)
    ys: jnp.ndarray,  # (F, K, S) clipped pixel rows
    xs: jnp.ndarray,  # (F, K, S) clipped pixel cols
) -> jnp.ndarray:
    """Per-slot depth lookup for the field<->keyframe visibility test
    (run_mapping.py:1341-1356 gathers the cached depth at each projected
    sphere sample).

    On TPU the exact XLA scalar gather measures ~2 ms/iteration (it
    serializes); instead the depth maps are 4x4 MAX-pooled (loop-invariant
    inside the per-frame scan, so XLA hoists the pooling) and looked up with
    the Pallas lane-gather kernel. Max-pooling makes the occlusion test
    conservative-permissive (a field is never wrongly marked invisible), which
    only biases *which keyframes are sampled for training* — supervision
    masks downstream are unaffected. CPU keeps the exact gather.
    """
    from neural_graph_mapping_tpu.ops import permuto

    s, h, w = cache_depth.shape
    if _VIS_EXACT or not permuto._use_pallas():
        slot_idx = jnp.broadcast_to(jnp.arange(s)[None, None, :], ys.shape)
        return cache_depth[slot_idx, ys, xs]

    from neural_graph_mapping_tpu.ops import permuto_pallas

    p = _VIS_POOL
    h_ds, w_ds = (h + p - 1) // p, (w + p - 1) // p
    pad_h, pad_w = h_ds * p - h, w_ds * p - w
    padded = jnp.pad(cache_depth, ((0, 0), (0, pad_h), (0, pad_w)))
    pooled = jnp.max(padded.reshape(s, h_ds, p, w_ds, p), axis=(2, 4))

    f, k, _ = ys.shape
    flat = (ys // p) * w_ds + (xs // p)  # (F, K, S)
    flat_t = flat.transpose(2, 0, 1).reshape(s, f * k)  # slot-major
    got = permuto_pallas.batched_gather(pooled.reshape(s, h_ds * w_ds), flat_t)
    return got.reshape(s, f, k).transpose(1, 2, 0)


def sample_target_mv(
    key: jax.Array,
    camera: Camera,
    field_ids: jnp.ndarray,  # (F,) pre-selected target fields
    field_valid: jnp.ndarray,  # (F,)
    field_positions: jnp.ndarray,  # (N_cap, 3)
    cache_rgb: jnp.ndarray,  # (S, H, W, 3)
    cache_depth: jnp.ndarray,  # (S, H, W)
    cache_c2w: jnp.ndarray,  # (S, 4, 4)
    cache_valid: jnp.ndarray,  # (S,) slot holds a frame
    field_radius: float,
    num_rays_per_field: int,
    num_field_samples: int = 20,
) -> Target:
    """Multi-view target sampler (run_mapping.py:1261-1459), one jit program.

    For each target field: scatter ``num_field_samples`` points on its bounding
    sphere, project into every cached keyframe, build the field<->keyframe
    visibility mask (in front, in frustum, not occluded beyond cached depth),
    sample ``num_rays_per_field`` keyframes ~ visibility, then pixels uniform
    in the per-keyframe 2D bbox of the projected samples, and assemble RGB-D /
    termination supervision with the reference's masks.
    """
    f = field_ids.shape[0]
    s = cache_c2w.shape[0]
    r = num_rays_per_field
    h, w = cache_depth.shape[1], cache_depth.shape[2]
    k_offsets, k_kf, k_pix = jax.random.split(key, 3)

    field_pos_w = field_positions[field_ids]  # (F, 3)

    # sphere-surface samples (run_mapping.py:1324-1326)
    offsets = jax.random.normal(k_offsets, (num_field_samples, 3))
    offsets = offsets / jnp.linalg.norm(offsets, axis=-1, keepdims=True)
    samples_w = field_pos_w[:, None, :] + offsets[None] * field_radius  # (F, 20, 3)

    # project into every cache slot: (F, 20, S, 3)
    samples_c = transforms.transform_points(
        samples_w[:, :, None, :], cache_c2w[None, None], inv=True
    )
    sample_depths = -samples_c[..., 2]
    xy, _ = camera.project_points(samples_c, "opengl")  # (F, 20, S, 2)
    xs = xy[..., 0].astype(jnp.int32)
    ys = xy[..., 1].astype(jnp.int32)
    in_frustum = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)

    xs_c = jnp.clip(xs, 0, w - 1)
    ys_c = jnp.clip(ys, 0, h - 1)
    kf_depths = _visibility_depths(cache_depth, ys_c, xs_c)  # (F, 20, S)
    kf_depths = jnp.where(in_frustum, kf_depths, 0.0)

    # field <-> keyframe visibility (run_mapping.py:1357-1362)
    in_front = jnp.any(sample_depths > 0, axis=1)  # (F, S)
    closer = jnp.any(sample_depths < kf_depths, axis=1)
    in_any_frustum = jnp.any(in_frustum, axis=1)
    field_kf_mask = in_front & closer & in_any_frustum & cache_valid[None, :]

    visible = jnp.any(field_kf_mask, axis=-1)  # (F,)
    field_valid = field_valid & visible

    # sample a keyframe per ray ~ visibility mask (with replacement)
    logits = jnp.where(field_kf_mask, 0.0, -jnp.inf)
    safe_logits = jnp.where(visible[:, None], logits, 0.0)  # avoid all -inf rows
    target_slots = jax.random.categorical(k_kf, safe_logits[:, None, :], shape=(f, r))

    # per-(field, slot) projected-sample bbox (run_mapping.py:1387-1397)
    big = 1e9
    xy_valid = jnp.where(in_frustum[..., None], xy, jnp.asarray([big, big]))
    min_xy_all = jnp.min(xy_valid, axis=1)  # (F, S, 2)
    xy_valid_max = jnp.where(in_frustum[..., None], xy, jnp.asarray([-big, -big]))
    max_xy_all = jnp.max(xy_valid_max, axis=1)
    min_xy_all = jnp.clip(min_xy_all, 0.0, None)
    max_xy_all = jnp.minimum(max_xy_all, jnp.asarray([float(w), float(h)]))
    take = lambda a: jnp.take_along_axis(a, target_slots[..., None], axis=1)
    min_xy = take(min_xy_all)  # (F, R, 2)
    max_xy = take(max_xy_all)
    max_xy = jnp.maximum(max_xy, min_xy)  # degenerate bbox -> single pixel

    # pixels uniform in the bbox (run_mapping.py:1400-1408)
    u = jax.random.uniform(k_pix, (f, r, 2))
    target_xy = (max_xy - min_xy) * u + min_xy
    target_ji = jnp.minimum(
        target_xy.astype(jnp.int32), jnp.asarray([w - 1, h - 1])
    )
    target_ijs = jnp.stack([target_ji[..., 1], target_ji[..., 0]], axis=-1)

    target_c2ws = cache_c2w[target_slots]  # (F, R, 4, 4)

    # per-ray near/far from field center projection (run_mapping.py:1414-1422)
    field_pos_c = transforms.transform_points(
        field_pos_w[:, None, :], target_c2ws, inv=True
    )
    dirs = camera.ijs_to_directions(target_ijs.astype(jnp.float32))
    center_distance = jnp.sum(field_pos_c * dirs, axis=-1)
    near = jnp.maximum(center_distance - field_radius, 0.0)
    far = jnp.maximum(center_distance + field_radius, 0.0)

    # RGB-D targets (run_mapping.py:1424-1445)
    rows = target_ijs[..., 0]
    cols = target_ijs[..., 1]
    rgb = cache_rgb[target_slots, rows, cols].astype(jnp.float32)  # (F, R, 3)
    depth = cache_depth[target_slots, rows, cols]  # (F, R)
    rgbds = jnp.concatenate([rgb, depth[..., None]], axis=-1)
    gt_distances = camera.depth_to_distance(depth, target_ijs.astype(jnp.float32))
    valid_depth = gt_distances != 0.0
    depth_mask = (gt_distances > near) & (gt_distances < far) & valid_depth
    rgb_mask = jnp.any(rgbds[..., :2] != 0.0, axis=-1)
    term_probs = (gt_distances < far).astype(jnp.float32)
    term_mask = (gt_distances > near) & valid_depth

    fv = field_valid[:, None]
    return Target(
        ijs=target_ijs,
        c2ws=target_c2ws,
        near_distances=near,
        far_distances=far,
        gt_distances=gt_distances,
        field_ids=field_ids,
        field_valid=field_valid,
        rgbds=rgbds,
        rgb_mask=rgb_mask & fv,
        depth_mask=depth_mask & fv,
        term_probs=term_probs,
        term_mask=term_mask & fv,
    )


def sample_target_sv(
    key: jax.Array,
    camera: Camera,
    rgbd_image: jnp.ndarray,  # (H, W, 4)
    c2w: jnp.ndarray,  # (4, 4)
    field_positions: jnp.ndarray,  # (N_cap, 3)
    active_mask: jnp.ndarray,  # (N_cap,)
    field_radius: float,
    num_train_fields: int,
    num_rays_per_field: int,
    num_cloud_points: int = 50_000,
    cloud_chunk: int = 8192,
) -> Target:
    """Single-view target sampler (run_mapping.py:1463-1583).

    Subsamples the current depth cloud, intersects view segments with active
    field spheres, picks fields with enough intersecting rays, then samples
    rays per field from its intersecting segments. Static-shape version at
    the reference's full 50,000-point cloud (run_mapping.py:1472-1483):

    - field ELIGIBILITY (counts over ALL capacity slots) streams the
      (N_cap, P) sphere-intersection matrix in ``cloud_chunk``-point slices
      via lax.scan, so peak memory is (N_cap, chunk) instead of the dense
      (N_cap, 50k) blow-up that previously capped the cloud at 16,384;
    - the per-point hit mask is then recomputed densely only for the F
      SELECTED fields ((F, P) — tiny);
    - per-field ray draws use inverse-CDF binary search, O(F*R*log P).
    """
    f, r = num_train_fields, num_rays_per_field
    k_cloud, k_fields, k_rays = jax.random.split(key, 3)

    points, ijs, valid = camera.depth_to_points_full(rgbd_image[..., 3], "opengl")
    sel = jax.random.categorical(
        k_cloud, jnp.log(jnp.where(valid, 1.0, 1e-20)), shape=(num_cloud_points,)
    )
    pts = points[sel]
    pts_ok = valid[sel]
    pt_ijs = ijs[sel]

    field_pos_c = transforms.transform_points(field_positions, c2w, inv=True)
    origin = jnp.zeros((1, 3))

    # 1) streamed per-field intersection COUNTS over the padded cloud
    pad = (-num_cloud_points) % cloud_chunk
    pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)]) if pad else pts
    ok_p = (
        jnp.concatenate([pts_ok, jnp.zeros((pad,), bool)]) if pad else pts_ok
    )
    n_chunks = pts_p.shape[0] // cloud_chunk

    def count_chunk(acc, inp):
        p_c, ok_c = inp
        hit = geometry.segments_intersect_spheres(
            jnp.broadcast_to(origin, p_c.shape), p_c, field_pos_c, field_radius
        )  # (N_cap, chunk)
        hit = hit & ok_c[None, :] & active_mask[:, None]
        return acc + jnp.sum(hit, axis=-1), None

    counts, _ = jax.lax.scan(
        count_chunk,
        jnp.zeros(field_positions.shape[0], jnp.int32),
        (
            pts_p.reshape(n_chunks, cloud_chunk, 3),
            ok_p.reshape(n_chunks, cloud_chunk),
        ),
    )

    eligible = counts >= num_rays_per_field  # (N_cap,)
    field_ids, field_valid = masked_choice_without_replacement(k_fields, eligible, f)

    # 2) dense hit mask for the SELECTED fields only
    sel_pos = field_pos_c[field_ids]  # (F, 3)
    field_hits = geometry.segments_intersect_spheres(
        jnp.broadcast_to(origin, pts.shape), pts, sel_pos, field_radius
    ) & pts_ok[None, :]  # (F, P)
    # uniform draw (with replacement) over each field's intersecting
    # segments: inverse-CDF + batched binary search
    w = jnp.where(field_valid[:, None], field_hits, True).astype(jnp.float32)
    cdf = jnp.cumsum(w, axis=-1)  # (F, P)
    u = jax.random.uniform(k_rays, (f, r)) * cdf[:, -1:]
    segments = jnp.clip(
        jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u),
        0,
        w.shape[-1] - 1,
    )

    target_ijs = pt_ijs[segments]  # (F, R, 2)
    dirs = camera.ijs_to_directions(target_ijs.astype(jnp.float32))
    pos_c = field_pos_c[field_ids]  # (F, 3)
    center_distance = jnp.sum(pos_c[:, None, :] * dirs, axis=-1)
    near = center_distance - field_radius
    far = center_distance + field_radius

    rgbds = rgbd_image[target_ijs[..., 0], target_ijs[..., 1]]
    gt_distances = camera.depth_to_distance(rgbds[..., 3], target_ijs.astype(jnp.float32))
    depth_mask = gt_distances < far
    term_probs = depth_mask.astype(jnp.float32)
    term_mask = jnp.ones_like(depth_mask)

    fv = field_valid[:, None]
    c2ws = jnp.broadcast_to(c2w, (f, r, 4, 4))
    return Target(
        ijs=target_ijs,
        c2ws=c2ws,
        near_distances=near,
        far_distances=far,
        gt_distances=gt_distances,
        field_ids=field_ids,
        field_valid=field_valid,
        rgbds=rgbds,
        rgb_mask=depth_mask & fv,
        depth_mask=depth_mask & fv,
        term_probs=term_probs,
        term_mask=term_mask & fv,
    )

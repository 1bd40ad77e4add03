"""NeuralGraphMap: the online dense neural mapping engine.

TPU-native rebuild of the reference's ``NeuralGraphMap`` orchestrator
(run_mapping.py:95-2394). Design per SURVEY.md section 7:

- **Device side** is a handful of jitted programs with static shapes:
  one fused optimization iteration (field selection -> multi-view target
  sampling -> ray rendering -> losses -> per-field Adam with gather/scatter),
  field allocation, observed-field tests, loop-closure re-anchoring, and
  chunked image rendering. Field capacity grows by power-of-two buckets, so
  recompiles happen O(log num_fields) times per run.
- **Host side** is incremental bookkeeping: the pose graph (dict-of-sets),
  keyframe slot registry, kf->fields index, dataset IO, eval scheduling.
- Loop closures only re-anchor field poses (one batched rigid transform per
  frame) — the map is never reintegrated (run_mapping.py:936-952).
"""

from __future__ import annotations

import functools
import logging
import math
import os
import time
from typing import Dict, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu import camera as camera_mod
from neural_graph_mapping_tpu import config as config_mod
from neural_graph_mapping_tpu.mapping import graph as graph_mod
from neural_graph_mapping_tpu.mapping import map_state, optimizer, render, sampling
from neural_graph_mapping_tpu.models.fields import NeuralFieldSet
from neural_graph_mapping_tpu.ops import losses as losses_mod
from neural_graph_mapping_tpu.utils import chunking, profiling, transforms

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Jitted programs (module-level so the engine instance stays out of traces).
# `fset`, `camera`, configs are static (hashable by identity / NamedTuple).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("fset", "camera", "rcfg", "ocfg", "loss_cfg", "num_train_fields"),
)
def optimization_iteration(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    ocfg: optimizer.AdamConfig,
    loss_cfg: "LossConfig",
    num_train_fields: int,
    params,
    adam: optimizer.AdamState,
    training_iterations: jnp.ndarray,  # (N_cap,)
    map_positions: jnp.ndarray,  # (N_cap, 3)
    map_orientations: jnp.ndarray,  # (N_cap, 4)
    allocated_mask: jnp.ndarray,  # (N_cap,)
    observed_mask: jnp.ndarray,  # (N_cap,)
    cache_rgb: jnp.ndarray,  # (S, H, W, 3)
    cache_depth: jnp.ndarray,  # (S, H, W)
    cache_c2w: jnp.ndarray,  # (S, 4, 4)
    cache_valid: jnp.ndarray,  # (S,)
    key: jax.Array,
):
    """One fused multi-view optimization iteration (run_mapping.py:1124-1221)."""
    k_sel, k_sample, k_render = jax.random.split(key, 3)

    if loss_cfg.single_field_id is not None:
        only = (
            jnp.arange(allocated_mask.shape[0]) == loss_cfg.single_field_id
        )
        allocated_mask = allocated_mask & only
        observed_mask = observed_mask & only
    field_ids, field_valid = sampling.select_target_fields(
        k_sel, observed_mask, allocated_mask, num_train_fields
    )
    target = sampling.sample_target_mv(
        k_sample,
        camera,
        field_ids,
        field_valid,
        map_positions,
        cache_rgb,
        cache_depth,
        cache_c2w,
        cache_valid,
        fset.field_radius,
        loss_cfg.num_rays_per_field,
    )
    return _optimization_iteration_core(
        fset, camera, rcfg, ocfg, loss_cfg, params, adam, training_iterations,
        map_positions, map_orientations, target, k_render,
    )


def _optimization_iteration_core(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    ocfg: optimizer.AdamConfig,
    loss_cfg: "LossConfig",
    params,
    adam: optimizer.AdamState,
    training_iterations: jnp.ndarray,
    map_positions: jnp.ndarray,
    map_orientations: jnp.ndarray,
    target: sampling.Target,
    k_render: jax.Array,
):
    """Render + losses + per-field Adam for a pre-built target. Split out so
    the per-frame scan can batch-build ALL iterations' targets up front
    (target sampling never reads params, so it needn't sit on the sequential
    param chain)."""
    sub_positions = map_positions[target.field_ids]
    sub_orientations = map_orientations[target.field_ids]
    sub_params = fset.gather_fields(params, target.field_ids)

    def loss_fn(sp):
        pred = render.render_rays_vmap(
            fset, sp, sub_positions, sub_orientations, camera, target, k_render, rcfg
        )
        return compute_losses(loss_cfg, rcfg, target, pred)

    (combined, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(sub_params)

    new_params, new_adam = optimizer.adam_slice_update(
        ocfg, params, adam, target.field_ids, target.field_valid, grads, sub_params
    )
    new_training_iterations = training_iterations.at[target.field_ids].add(
        target.field_valid.astype(training_iterations.dtype)
    )
    return new_params, new_adam, new_training_iterations, loss_dict


# NOTE (r3 negative result): jit(in_shardings=out_shardings=Format(Layout.AUTO))
# on the hot per-frame programs removed the donated-table boundary relayout
# copies and measured +4% on the bench — but crashes in production
# ("INVALID_ARGUMENT" at launch) as soon as a DIFFERENT program (field
# allocation / capacity growth) produces the params between frames in the
# default layout. Fixed at the root instead: the table leaf is (N, 2, L, T)
# (feature axis MAJOR), whose default layout tiles the (L, T) minor matrix
# T(8,128) — exactly the layout every consumer wants, so no relayouts exist.
@functools.partial(
    jax.jit,
    static_argnames=(
        "fset", "camera", "rcfg", "ocfg", "loss_cfg", "num_train_fields", "num_iters"
    ),
    donate_argnames=("params", "adam"),
)
def optimization_iterations_scan(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    ocfg: optimizer.AdamConfig,
    loss_cfg: "LossConfig",
    num_train_fields: int,
    num_iters: int,
    params,
    adam: optimizer.AdamState,
    training_iterations: jnp.ndarray,
    map_positions: jnp.ndarray,
    map_orientations: jnp.ndarray,
    allocated_mask: jnp.ndarray,
    observed_mask: jnp.ndarray,
    cache_rgb: jnp.ndarray,
    cache_depth: jnp.ndarray,
    cache_c2w: jnp.ndarray,
    cache_valid: jnp.ndarray,
    key: jax.Array,
):
    """All per-frame optimization iterations fused into one program via
    lax.scan (each iteration resamples targets, exactly like the reference's
    per-iteration loop, run_mapping.py:1232-1233). Amortizes per-dispatch
    overhead (~25 ms through the TPU relay) across the whole frame.

    Note: batching all iterations' targets up front (they never read params)
    was tried and MEASURED SLOWER on v5e (1.59M vs 1.97M rays/s) — the
    materialized (I, F, R, ...) target arrays cost more HBM round-trips than
    the fused in-body sampler; XLA already overlaps the sampler with the
    param chain inside the scan body.
    """

    def body(carry, sub_key):
        params, adam, ti = carry
        new_params, new_adam, new_ti, loss_dict = optimization_iteration(
            fset, camera, rcfg, ocfg, loss_cfg, num_train_fields,
            params, adam, ti, map_positions, map_orientations,
            allocated_mask, observed_mask, cache_rgb, cache_depth,
            cache_c2w, cache_valid, sub_key,
        )
        return (new_params, new_adam, new_ti), loss_dict

    keys = jax.random.split(key, num_iters)
    (params, adam, ti), loss_dicts = jax.lax.scan(
        body, (params, adam, training_iterations), keys,
        unroll=int(os.environ.get("NGM_SCAN_UNROLL", "1")),
    )
    last_losses = jax.tree_util.tree_map(lambda x: x[-1], loss_dicts)
    return params, adam, ti, last_losses


@functools.partial(
    jax.jit,
    static_argnames=(
        "fset", "camera", "rcfg", "ocfg", "loss_cfg", "num_train_fields",
        "num_iters", "write_current", "has_fields",
    ),
    donate_argnames=("params", "adam", "cache_rgb", "cache_depth"),
)
def frame_step(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    ocfg: optimizer.AdamConfig,
    loss_cfg: "LossConfig",
    num_train_fields: int,
    num_iters: int,
    write_current: bool,
    has_fields: bool,
    params,
    adam: optimizer.AdamState,
    training_iterations: jnp.ndarray,
    map_positions: jnp.ndarray,
    map_orientations: jnp.ndarray,
    allocated_mask: jnp.ndarray,
    cache_rgb: jnp.ndarray,
    cache_depth: jnp.ndarray,
    cache_c2w: jnp.ndarray,
    cache_valid: jnp.ndarray,
    rgbd: jnp.ndarray,  # (H, W, 4) current frame
    c2w: jnp.ndarray,  # (4, 4)
    kf_slot: jnp.ndarray,  # scalar int32; < 0 -> not a keyframe
    base_key: jax.Array,
    step: jnp.ndarray,  # scalar int32 frame counter (key = fold_in(base, step))
):
    """One fused device program per frame: keyframe-cache writes, the
    observed-field test, and all optimization iterations. Collapses what used
    to be ~6 separate dispatches (each paying ~25 ms of relay overhead) into
    one (the ingest half of _update_slam_state, run_mapping.py:1599-1640,
    plus the iteration loop :1232-1241). PRNG keys derive on-device from a
    base key + frame counter so the host never dispatches random.split."""
    key = jax.random.fold_in(base_key, step)
    k_obs, k_opt = jax.random.split(key)

    rgb = rgbd[..., :3].astype(cache_rgb.dtype)
    depth = rgbd[..., 3]
    if write_current:
        cache_rgb = cache_rgb.at[0].set(rgb)
        cache_depth = cache_depth.at[0].set(depth)
    # keyframe slot write (no-op when kf_slot < 0 via drop semantics)
    safe_slot = jnp.where(kf_slot >= 0, kf_slot, cache_rgb.shape[0])
    cache_rgb = cache_rgb.at[safe_slot].set(rgb, mode="drop")
    cache_depth = cache_depth.at[safe_slot].set(depth, mode="drop")

    observed = sampling.observed_fields_mask(
        k_obs, camera, depth, c2w, map_positions, allocated_mask, fset.field_radius
    )

    if has_fields:
        params, adam, training_iterations, loss_dict = optimization_iterations_scan(
            fset, camera, rcfg, ocfg, loss_cfg, num_train_fields, num_iters,
            params, adam, training_iterations, map_positions, map_orientations,
            allocated_mask, observed, cache_rgb, cache_depth, cache_c2w,
            cache_valid, k_opt,
        )
    else:
        loss_dict = {}
    return params, adam, training_iterations, cache_rgb, cache_depth, observed, loss_dict


@functools.partial(
    jax.jit,
    static_argnames=(
        "fset", "camera", "rcfg", "ocfg", "loss_cfg", "num_train_fields", "num_iters"
    ),
    donate_argnames=("params", "adam"),
)
def optimization_iterations_scan_sv(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    ocfg: optimizer.AdamConfig,
    loss_cfg: "LossConfig",
    num_train_fields: int,
    num_iters: int,
    params,
    adam: optimizer.AdamState,
    training_iterations: jnp.ndarray,
    map_positions: jnp.ndarray,
    map_orientations: jnp.ndarray,
    active_mask: jnp.ndarray,  # BFS-active fields (run_mapping.py:817-825)
    cache_rgb: jnp.ndarray,
    cache_depth: jnp.ndarray,
    cache_c2w: jnp.ndarray,
    cache_valid: jnp.ndarray,
    key: jax.Array,
):
    """Single-view per-frame optimization (update_mode="single_view"):
    iterations alternate between the current frame (cache slot 0) and a random
    cached keyframe (run_mapping.py:1126-1149), sampling targets by
    intersecting the view's depth cloud with active field spheres
    (_sample_target_sv, run_mapping.py:1463-1583). One fused lax.scan."""

    def body(carry, inp):
        params, adam, ti = carry
        sub_key, iter_idx = inp
        k_slot, k_target, k_render = jax.random.split(sub_key, 3)

        # odd iterations: current frame (slot 0, if valid); even: random kf
        kf_logits = jnp.where(cache_valid.at[0].set(False), 0.0, -jnp.inf)
        random_slot = jax.random.categorical(k_slot, kf_logits)
        use_current = (iter_idx % 2 != 0) & cache_valid[0]
        slot = jnp.where(use_current, 0, random_slot)

        rgbd = jnp.concatenate(
            [cache_rgb[slot].astype(jnp.float32), cache_depth[slot][..., None]],
            axis=-1,
        )
        c2w = cache_c2w[slot]

        target = sampling.sample_target_sv(
            k_target, camera, rgbd, c2w, map_positions, active_mask,
            fset.field_radius, num_train_fields, loss_cfg.num_rays_per_field,
        )

        sub_positions = map_positions[target.field_ids]
        sub_orientations = map_orientations[target.field_ids]
        sub_params = fset.gather_fields(params, target.field_ids)

        def loss_fn(sp):
            pred = render.render_rays_vmap(
                fset, sp, sub_positions, sub_orientations, camera, target,
                k_render, rcfg,
            )
            return compute_losses(loss_cfg, rcfg, target, pred)

        (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(sub_params)
        new_params, new_adam = optimizer.adam_slice_update(
            ocfg, params, adam, target.field_ids, target.field_valid, grads, sub_params
        )
        new_ti = ti.at[target.field_ids].add(target.field_valid.astype(ti.dtype))
        return (new_params, new_adam, new_ti), loss_dict

    keys = jax.random.split(key, num_iters)
    (params, adam, ti), loss_dicts = jax.lax.scan(
        body,
        (params, adam, training_iterations),
        (keys, jnp.arange(num_iters)),
    )
    last_losses = jax.tree_util.tree_map(lambda x: x[-1], loss_dicts)
    return params, adam, ti, last_losses


class LossConfig:
    """Static loss hyperparameters (hashable for jit static args)."""

    def __init__(
        self,
        termination_weight: float = 0.0,
        photometric_weight: float = 1.0,
        photometric_loss: str = "l1",
        depth_weight: float = 1.0,
        depth_loss: str = "huber",
        freespace_weight: float = 40.0,
        tsdf_weight: float = 50.0,
        num_rays_per_field: int = 512,
        single_field_id: Optional[int] = None,
    ) -> None:
        self.termination_weight = termination_weight
        self.photometric_weight = photometric_weight
        self.photometric_loss = photometric_loss
        self.depth_weight = depth_weight
        self.depth_loss = depth_loss
        self.freespace_weight = freespace_weight
        self.tsdf_weight = tsdf_weight
        self.num_rays_per_field = num_rays_per_field
        # Debug filter (reference run_mapping.py:1156-1160): the reference
        # SKIPS iterations whose target doesn't include the chosen field;
        # here selection is RESTRICTED to it (same intent — watch one field
        # train — without wasting the fused-iteration dispatch).
        self.single_field_id = single_field_id
        self._key = (
            termination_weight, photometric_weight, photometric_loss, depth_weight,
            depth_loss, freespace_weight, tsdf_weight, num_rays_per_field,
            single_field_id,
        )

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, LossConfig) and self._key == other._key


def compute_losses(
    cfg: LossConfig,
    rcfg: render.RenderConfig,
    target: sampling.Target,
    pred: render.Prediction,
):
    """Assemble the training loss (run_mapping.py:1769-1872).

    Masks follow the reference: depth/rgb supervised only where the target
    depth is usable AND the predicted termination prob exceeds 0.8
    (run_mapping.py:1787-1788); everything additionally gated by field
    validity.
    """
    depth_mask = target.depth_mask & (pred.term_probs > 0.8)
    rgb_mask = depth_mask

    loss_dict = {}
    combined = 0.0

    termination = losses_mod.termination_loss(
        pred.term_probs, target.term_probs, target.term_mask
    )
    loss_dict["termination"] = termination
    combined = combined + cfg.termination_weight * termination

    photometric = losses_mod.photometric_loss(
        cfg.photometric_loss,
        target.rgbds[..., :3],
        pred.rgbds[..., :3],
        pred.color_vars,
        mask=rgb_mask,
    )
    loss_dict[f"photometric_{cfg.photometric_loss}"] = photometric
    combined = combined + cfg.photometric_weight * photometric

    depth = losses_mod.depth_loss(
        cfg.depth_loss,
        target.rgbds[..., 3],
        pred.rgbds[..., 3],
        pred.depth_vars,
        mask=depth_mask,
    )
    loss_dict[f"depth_{cfg.depth_loss}"] = depth
    combined = combined + cfg.depth_weight * depth

    if cfg.freespace_weight != 0.0:
        freespace = losses_mod.freespace_loss(
            pred.sample_geometries, rcfg.truncation_distance, pred.freespace_mask
        )
        loss_dict["freespace"] = freespace
        combined = combined + cfg.freespace_weight * freespace

    if cfg.tsdf_weight != 0.0:
        deltas = target.gt_distances[..., None] - pred.sample_distances
        tsdf = losses_mod.tsdf_loss(
            pred.sample_geometries, deltas, rcfg.truncation_distance, pred.tsdf_mask
        )
        loss_dict["tsdf"] = tsdf
        combined = combined + cfg.tsdf_weight * tsdf

    # supervision-coverage diagnostics (not losses): fraction of rays whose
    # photometric/depth terms are live, and fields actually trained
    loss_dict["diag_depth_mask_frac"] = jnp.mean(depth_mask.astype(jnp.float32))
    loss_dict["diag_term_mask_frac"] = jnp.mean(
        target.term_mask.astype(jnp.float32)
    )
    loss_dict["diag_valid_fields"] = jnp.sum(
        target.field_valid.astype(jnp.float32)
    )
    loss_dict["combined"] = combined
    return combined, loss_dict


@functools.partial(jax.jit, static_argnames=("camera", "field_radius", "max_new"))
def allocate_fields_jit(
    camera,
    field_radius: float,
    max_new: int,
    depth_image: jnp.ndarray,
    c2w: jnp.ndarray,
    active_positions: jnp.ndarray,
    active_mask: jnp.ndarray,
    base_key: jax.Array,
    step: jnp.ndarray,
):
    """Uncovered-cell field allocation (run_mapping.py:267-345), jitted."""
    key = jax.random.fold_in(base_key, step)
    points_cam, _, valid = camera.depth_to_points_full(depth_image, "opengl")
    points_world = transforms.transform_points(points_cam, c2w)
    points_world = jnp.where(valid[:, None], points_world, 0.0)
    centers, num_new = map_state.uncovered_cells(
        key, points_world, valid, active_positions, active_mask, field_radius, max_new
    )
    bb_min = jnp.min(jnp.where(valid[:, None], points_world, jnp.inf), axis=0)
    bb_max = jnp.max(jnp.where(valid[:, None], points_world, -jnp.inf), axis=0)
    return centers, num_new, bb_min, bb_max


@functools.partial(jax.jit, static_argnames=("camera", "field_radius"))
def observed_fields_jit(
    camera, field_radius, key, depth_image, c2w, positions, allocated_mask
):
    return sampling.observed_fields_mask(
        key, camera, depth_image, c2w, positions, allocated_mask, field_radius
    )


@jax.jit
def reanchor_jit(arrays: map_state.MapArrays, prev_slots, new_slots):
    return map_state.reanchor_field_poses(arrays, prev_slots, new_slots)


@functools.partial(jax.jit, donate_argnames=("cache_rgb", "cache_depth"))
def write_cache_slot(cache_rgb, cache_depth, slot, rgbd):
    """Insert a frame into the keyframe cache (run_mapping.py:1686-1699)."""
    rgb = rgbd[..., :3].astype(cache_rgb.dtype)
    depth = rgbd[..., 3]
    return cache_rgb.at[slot].set(rgb), cache_depth.at[slot].set(depth)


class NeuralGraphMap:
    """Online neural graph mapping (reference run_mapping.py:95).

    Usage mirrors the reference: construct from a config dict, call
    :meth:`fit` to map a dataset online, or drive :meth:`process_frame`
    manually for streaming input.
    """

    def __init__(self, config: dict) -> None:
        self._read_config(config)
        self._init_model()
        self._init_state()

    # -- configuration ---------------------------------------------------------

    def _read_config(self, config: dict) -> None:
        c = dict(config)
        self._config = c
        self._model_kwargs = c["model_kwargs"]
        self._field_radius = float(c.get("field_radius", 1.0))
        self._update_mode = c.get("update_mode", "multi_view")
        self._num_iterations_per_frame = int(c.get("num_iterations_per_frame", 5))
        self._keyframes_only = bool(c.get("keyframes_only", False))
        self._max_depth = c.get("max_depth", None)
        self._disable_relative_fields = bool(c.get("disable_relative_fields", False))
        self._num_kf_slots = int(c.get("num_kf_slots", 1000))
        self._max_new_fields = int(c.get("max_new_fields", 256))
        self._active_max_edges = int(c.get("active_max_edges", 100))

        trunc = c.get("truncation_distance", 0.1)
        range_guided = c.get("range_depth_guided", None)
        if range_guided is None:
            range_guided = trunc  # run_mapping.py:169-171
        self._rcfg = render.RenderConfig(
            geometry_mode=c.get("geometry_mode", "nrgbd"),
            geometry_factor=float(c.get("geometry_factor", 20.0)),
            color_factor=float(c.get("color_factor", 1.0)),
            num_samples_coarse=int(c.get("num_samples_coarse", 8)),
            num_samples_depth_guided=int(c.get("num_samples_depth_guided", 16)),
            range_depth_guided=float(range_guided),
            truncation_distance=float(trunc),
        )
        self._train_near = float(c.get("near_distance", 0.0))
        self._train_far = float(c.get("far_distance", 8.0))
        self._eval_near = float(c.get("eval_near_distance", 0.0))
        self._eval_far = float(c.get("eval_far_distance", 8.0))
        # derived eval sample count (run_mapping.py:199-207)
        if self._rcfg.num_samples_depth_guided > 0:
            self._sample_spacing = (
                2 * self._rcfg.range_depth_guided / self._rcfg.num_samples_depth_guided
            )
        else:
            self._sample_spacing = (
                2 * self._field_radius / self._rcfg.num_samples_coarse
            )
        self._eval_num_samples = int(
            c.get(
                "eval_num_samples",
                (self._eval_far - self._eval_near) / self._sample_spacing,
            )
        )
        # span-restricted render path: samples are placed only inside the
        # per-ray field-intersection interval, so fewer are needed for the
        # same (or better) spacing than the reference's full-range count.
        # The count must keep spacing near the TRAIN guided spacing
        # (2*range_depth_guided/num_samples_depth_guided ~ 1.25 cm): the
        # trained occupancy profile compensates compositing bias at that
        # discretization, and rendering it coarser shifts expected depth
        # backward ~10 cm and costs ~2 dB (measured; see STATUS.md).
        self._eval_span_samples = int(
            min(self._eval_num_samples, int(c.get("eval_span_samples", 512)))
        )

        self._ocfg = optimizer.AdamConfig(
            learning_rate=float(c.get("learning_rate", 1e-3)),
            eps=float(c.get("adam_eps", 1e-15)),
            weight_decay=float(c.get("adam_weight_decay", 0.0)),
        )
        self._loss_cfg = LossConfig(
            termination_weight=float(c.get("termination_weight", 0.0)),
            photometric_weight=float(c.get("photometric_weight", 1.0)),
            photometric_loss=c.get("photometric_loss", "l1"),
            depth_weight=float(c.get("depth_weight", 1.0)),
            depth_loss=c.get("depth_loss", "huber"),
            freespace_weight=float(c.get("freespace_weight", 40.0)),
            tsdf_weight=float(c.get("tsdf_weight", 50.0)),
            num_rays_per_field=int(c.get("num_rays_per_field", 512)),
            single_field_id=(
                int(c["single_field_id"])
                if c.get("single_field_id") is not None
                else None
            ),
        )
        self._num_train_fields = int(c.get("num_train_fields", 32))
        self._pixel_block_size = int(c.get("pixel_block_size", 8192))
        self._seed = int(c.get("seed", 0))
        # multi-chip: shard the field axis of params/adam over a 1-D mesh
        # (SURVEY.md section 2c; the reference is strictly single-device,
        # run_mapping.py:124). 1 = single-chip (default).
        self._num_field_shards = int(c.get("num_field_shards", 1))

    def _init_model(self) -> None:
        self._fset = NeuralFieldSet(**self._model_kwargs)
        self._key = jax.random.PRNGKey(self._seed)
        self._base_key = jax.random.PRNGKey(self._seed + 1)
        self._frame_counter = 0

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _init_state(self) -> None:
        cap = 32
        self._mesh = None
        if self._num_field_shards > 1:
            from neural_graph_mapping_tpu.parallel import sharding as sharding_mod

            if cap % self._num_field_shards != 0:
                raise ValueError(
                    f"field capacity {cap} must be divisible by "
                    f"num_field_shards={self._num_field_shards}"
                )
            self._mesh = sharding_mod.make_field_mesh(self._num_field_shards)
        self._map_arrays = map_state.init_map_arrays(cap)
        self._params = self._fset.init_fields(self._next_key(), cap)
        self._adam = optimizer.init_adam_state(self._params)
        self._reshard_fields()
        self._num_fields = 0

        self._graph: Dict[int, Set[int]] = {}
        self._kf2fields: Dict[int, Set[int]] = {}
        self._kf_ids: Set[int] = set()
        self._last_update: Optional[int] = None
        self._prev_kf2w_slots: Optional[np.ndarray] = None

        # keyframe cache (run_mapping.py:1673-1683); slot 0 = current frame
        self._cache_rgb = None  # allocated lazily once H, W known
        self._cache_depth = None
        self._cache_c2w_np = np.tile(np.eye(4, dtype=np.float32), (self._num_kf_slots, 1, 1))
        self._cache_valid_np = np.zeros((self._num_kf_slots,), bool)
        self._free_slots = list(range(1, self._num_kf_slots))
        self._frame_to_slot: Dict[int, int] = {}
        # device mirrors of the host-side cache bookkeeping: re-uploaded only
        # when actually written, so steady-state frames skip two host->device
        # transfers (the reference keeps these GPU-resident the same way,
        # run_mapping.py:1678-1683)
        self._cache_c2w_dev = None
        self._cache_valid_dev = None
        self._cache_c2w_dirty = True
        self._cache_valid_dirty = True
        # pose-graph change tracking: dataset graphs are stored per-frame but
        # reuse the same dict object while unchanged, so identity is a cheap
        # "graph changed" signal; poses are refreshed incrementally unless the
        # dataset says they may have moved (loop closure / SLAM refinement)
        self._last_graph_obj = None
        self._pending_slot_poses: Optional[np.ndarray] = None
        # per-frame host/device phase accounting (seconds, cumulative)
        self.phase_times: Dict[str, float] = {}

        self._observed_mask = None
        self._bb_min = np.full((3,), np.inf, np.float32)
        self._bb_max = np.full((3,), -np.inf, np.float32)
        self._total_optimization_time = 0.0
        self._frames_processed = 0

    # -- capacity management ----------------------------------------------------

    @property
    def num_fields(self) -> int:
        return self._num_fields

    @property
    def capacity(self) -> int:
        return map_state.capacity(self._map_arrays)

    def _ensure_capacity(self, required: int) -> None:
        cap = self.capacity
        if required <= cap:
            return
        new_cap = cap
        while new_cap < required:
            new_cap *= 2
        logger.info("growing field capacity %d -> %d", cap, new_cap)
        self._map_arrays = map_state.grow_capacity(self._map_arrays, new_cap)
        extra = self._fset.init_fields(self._next_key(), new_cap - cap)
        self._params = {
            k: jnp.concatenate([v, extra[k]], axis=0) for k, v in self._params.items()
        }
        self._adam = optimizer.grow_adam_state(self._adam, self._params)
        self._reshard_fields()

    def _reshard_fields(self) -> None:
        """Re-apply field-axis sharding to the stacked params + Adam state.

        Multi-chip design (SURVEY.md section 2c): the big per-field state
        (hash tables, MLP weights, Adam moments) shards its leading field axis
        over a 1-D "field" mesh; the map registry, keyframe cache, and
        per-iteration targets stay replicated (they are small). Inside the
        jitted step, the active-subset gather ``params[field_ids]`` and the
        post-step scatter become XLA collectives over ICI; on real multi-chip
        hardware, aligning ``field_ids`` with the owning shard makes them
        local (see parallel/sharding.py). Called at init and after capacity
        growth (growth preserves divisibility: capacity doubles).
        """
        if self._mesh is None:
            return
        from neural_graph_mapping_tpu.parallel import sharding as sharding_mod

        fshard = sharding_mod.field_sharding(self._mesh)
        self._params = sharding_mod.shard_field_pytree(self._params, self._mesh)
        self._adam = optimizer.AdamState(
            m=sharding_mod.shard_field_pytree(self._adam.m, self._mesh),
            v=sharding_mod.shard_field_pytree(self._adam.v, self._mesh),
            steps=jax.device_put(self._adam.steps, fshard),
        )

    def _allocated_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self._num_fields

    # -- per-frame pipeline ------------------------------------------------------

    def _init_cache(self, h: int, w: int) -> None:
        s = self._num_kf_slots
        self._cache_rgb = jnp.zeros((s, h, w, 3), jnp.bfloat16)
        self._cache_depth = jnp.zeros((s, h, w), jnp.float32)

    def _update_graph(self, dataset, frame_id: int) -> None:
        """Pose-graph update + keyframe removal handling (run_mapping.py:888-934).

        Steady-state fast paths (VERDICT r3 weak #5: the per-frame host work
        must not eat the 33 ms sensor budget): the O(edges) graph copy runs
        only when the dataset hands over a *different* graph object, and the
        O(keyframes) pose snapshot + compare runs only when poses may actually
        have moved (``dataset.slam_poses_dirty`` — SLAM refinement / loop
        closure) or keyframes were removed. With GT poses and a fixed-freq
        pose graph, a non-keyframe frame does O(1) host work here.
        """
        new_graph = dataset.get_slam_essential_graph(frame_id)

        if self._last_update is None:
            self._graph = {k: set(v) for k, v in new_graph.items()}
            self._last_graph_obj = new_graph
            self._last_update = frame_id
            self._prev_kf2w_slots = self._snapshot_kf_slot_poses(dataset, frame_id)
            self._pending_slot_poses = None
            return

        poses_dirty = dataset.slam_poses_dirty(frame_id)
        graph_changed = new_graph is not self._last_graph_obj

        removed: Set[int] = set()
        if graph_changed:
            prev_kfs = set(self._kf_ids)
            removed = prev_kfs - set(new_graph.keys())
            surviving = prev_kfs - removed
            if dataset.is_keyframe(frame_id):
                surviving.add(frame_id)

            kf_ids_np = kf_slots_np = None
            if removed:  # device->host pulls only when keyframes disappeared
                kf_ids_np = np.array(self._map_arrays.kf_ids)  # mutable copies
                kf_slots_np = np.array(self._map_arrays.kf_slots)
            dirty = False
            for kf in sorted(removed):
                self._kf_ids.discard(kf)
                slot = self._frame_to_slot.pop(kf, None)
                if slot is not None:
                    self._free_slots.append(slot)
                    self._cache_valid_np[slot] = False
                    self._cache_valid_dirty = True
                # re-anchor fields to nearest surviving keyframe (:918-926)
                after = min((i for i in surviving if i >= kf), default=None)
                before = max((i for i in surviving if i <= kf), default=None)
                new_anchor = after if (after is not None and after in prev_kfs) else before
                if new_anchor is None:
                    continue
                if kf in self._kf2fields:
                    self._kf2fields.setdefault(new_anchor, set()).update(
                        self._kf2fields.pop(kf)
                    )
                mask = kf_ids_np == kf
                if mask.any():
                    kf_ids_np[mask] = new_anchor
                    kf_slots_np[mask] = self._frame_to_slot.get(new_anchor, 0)
                    dirty = True
            if dirty:
                self._map_arrays = self._map_arrays._replace(
                    kf_ids=jnp.asarray(kf_ids_np), kf_slots=jnp.asarray(kf_slots_np)
                )

        # loop-closure deformation (run_mapping.py:936-952). The prev snapshot
        # was taken at the END of the previous frame (after that frame's
        # keyframe slot registration), so every field's anchor slot has a real
        # pose on both sides of the delta.
        self._pending_slot_poses = None
        if poses_dirty or removed:
            new_slot_poses = self._snapshot_kf_slot_poses(dataset, frame_id)
            self._pending_slot_poses = new_slot_poses  # reused after kf registration
            if (
                not self._disable_relative_fields
                and self._num_fields > 0
                and not np.array_equal(new_slot_poses, self._prev_kf2w_slots)
            ):
                self._map_arrays = reanchor_jit(
                    self._map_arrays,
                    jnp.asarray(self._prev_kf2w_slots),
                    jnp.asarray(new_slot_poses),
                )
        if graph_changed:
            self._graph = {k: set(v) for k, v in new_graph.items()}
            self._last_graph_obj = new_graph
        self._last_update = frame_id

    def _snapshot_kf_slot_poses(self, dataset, at_frame_id: int) -> np.ndarray:
        """Per-slot keyframe poses at a given frame (identity for free slots)."""
        poses = np.tile(np.eye(4, dtype=np.float32), (self._num_kf_slots, 1, 1))
        for kf, slot in self._frame_to_slot.items():
            c2w = np.asarray(dataset.get_slam_c2ws(kf, at_frame_id))
            if np.isfinite(c2w).all():
                poses[slot] = c2w
        return poses

    def _active_field_ids(self, frame_id: int) -> np.ndarray:
        """Fields of keyframes within BFS distance of the closest keyframe
        (run_mapping.py:817-825)."""
        kfs = [k for k in self._graph.keys() if k <= frame_id]
        if not kfs:
            return np.zeros((0,), np.int64)
        closest = max(kfs)
        neighbors = graph_mod.get_neighbors(
            self._graph, {closest}, max_edges=self._active_max_edges, include_queries=True
        )
        ids: Set[int] = set()
        for kf in neighbors:
            ids |= self._kf2fields.get(kf, set())
        return np.fromiter(ids, np.int64) if ids else np.zeros((0,), np.int64)

    @profiling.benchmark
    def process_frame(
        self,
        dataset,
        frame_id: int,
        rgbd: jnp.ndarray,
        log_fn=None,
    ) -> dict:
        """Ingest one frame and run the per-frame optimization
        (run_mapping.py:1224-1257 + _update_slam_state:1599-1640)."""
        t_start = time.time()
        self._frame_counter += 1
        h, w = rgbd.shape[0], rgbd.shape[1]
        if self._cache_rgb is None:
            self._init_cache(h, w)
            self._camera = dataset.camera

        if self._max_depth is not None:
            depth = rgbd[..., 3]
            rgbd = rgbd.at[..., 3].set(jnp.where(depth > self._max_depth, 0.0, depth))

        c2w_np = np.asarray(dataset.get_slam_c2ws(frame_id))
        c2w_missing = not np.isfinite(c2w_np).all()
        c2w = jnp.asarray(c2w_np if not c2w_missing else np.eye(4, dtype=np.float32))

        t_phase = time.perf_counter()
        self._update_graph(dataset, frame_id)
        self.phase_times["graph"] = (
            self.phase_times.get("graph", 0.0) + time.perf_counter() - t_phase
        )

        t_phase = time.perf_counter()
        is_kf = dataset.is_keyframe(frame_id)
        kf_slot = -1
        if is_kf:
            self._kf_ids.add(frame_id)
            if not self._free_slots:
                raise ValueError("Maximum number of keyframes reached.")
            kf_slot = self._free_slots.pop(0)
            self._frame_to_slot[frame_id] = kf_slot
            self._cache_valid_np[kf_slot] = True
            self._cache_valid_dirty = True
            if not c2w_missing:
                # allocation needs its own dispatch (host reads num_new);
                # writes the keyframe's depth coverage into new fields
                self._allocate_new_fields(frame_id, rgbd[..., 3], c2w, kf_slot)
        self.phase_times["alloc"] = (
            self.phase_times.get("alloc", 0.0) + time.perf_counter() - t_phase
        )

        t_phase = time.perf_counter()
        # current frame occupies slot 0 (run_mapping.py:1686-1692)
        write_current = not self._keyframes_only and not c2w_missing
        if not self._keyframes_only:
            if bool(self._cache_valid_np[0]) != (not c2w_missing):
                self._cache_valid_np[0] = not c2w_missing
                self._cache_valid_dirty = True
            if not c2w_missing:
                self._cache_c2w_np[0] = c2w_np
                self._cache_c2w_dirty = True

        # refresh slot poses (SLAM refines keyframe poses continuously); taken
        # AFTER keyframe registration so the new keyframe's slot is included,
        # and stored as the prev snapshot for the next frame's re-anchoring.
        # Steady state reuses _update_graph's snapshot (or, when poses are
        # static, patches only the newly registered slot) instead of a second
        # O(keyframes) sweep (VERDICT r3 weak #5).
        if self._pending_slot_poses is not None:
            snap = self._pending_slot_poses
            self._pending_slot_poses = None
            if is_kf and not c2w_missing:
                snap[kf_slot] = c2w_np
            self._prev_kf2w_slots = snap
            self._cache_c2w_np[1:] = snap[1:]
            self._cache_c2w_dirty = True
        elif is_kf and not c2w_missing:
            self._prev_kf2w_slots[kf_slot] = c2w_np
            self._cache_c2w_np[kf_slot] = c2w_np
            self._cache_c2w_dirty = True

        if self._cache_c2w_dirty or self._cache_c2w_dev is None:
            self._cache_c2w_dev = jnp.asarray(self._cache_c2w_np)
            self._cache_c2w_dirty = False
        if self._cache_valid_dirty or self._cache_valid_dev is None:
            self._cache_valid_dev = jnp.asarray(self._cache_valid_np)
            self._cache_valid_dirty = False
        cache_c2w = self._cache_c2w_dev
        cache_valid = self._cache_valid_dev
        allocated = self._allocated_mask()
        self.phase_times["host_misc"] = (
            self.phase_times.get("host_misc", 0.0) + time.perf_counter() - t_phase
        )

        if self._update_mode == "multi_view":
            (
                self._params,
                self._adam,
                new_ti,
                self._cache_rgb,
                self._cache_depth,
                self._observed_mask,
                loss_dict,
            ) = frame_step(
                self._fset,
                self._camera,
                self._rcfg,
                self._ocfg,
                self._loss_cfg,
                self._num_train_fields,
                self._num_iterations_per_frame,
                write_current,
                self._num_fields > 0,
                self._params,
                self._adam,
                self._map_arrays.training_iterations,
                self._map_arrays.positions,
                self._map_arrays.orientations,
                allocated,
                self._cache_rgb,
                self._cache_depth,
                cache_c2w,
                cache_valid,
                rgbd,
                c2w,
                np.int32(kf_slot),
                self._base_key,
                np.int32(self._frame_counter),
            )
            self._map_arrays = self._map_arrays._replace(training_iterations=new_ti)
            if log_fn is not None and loss_dict:
                log_fn(loss_dict)
            self._frames_processed += 1
            self._total_optimization_time += time.time() - t_start
            return {k: float(v) for k, v in loss_dict.items()}

        # -- single_view path (separate fused scan) --------------------------
        if is_kf:
            self._cache_rgb, self._cache_depth = write_cache_slot(
                self._cache_rgb, self._cache_depth, kf_slot, rgbd
            )
        if write_current:
            self._cache_rgb, self._cache_depth = write_cache_slot(
                self._cache_rgb, self._cache_depth, 0, rgbd
            )

        loss_dict = {}
        if self._num_fields > 0 and self._update_mode == "single_view":
            active_ids = self._active_field_ids(frame_id)
            active_mask_np = np.zeros((self.capacity,), bool)
            active_mask_np[active_ids] = True
            (
                self._params,
                self._adam,
                new_ti,
                loss_dict,
            ) = optimization_iterations_scan_sv(
                self._fset,
                self._camera,
                self._rcfg,
                self._ocfg,
                self._loss_cfg,
                self._num_train_fields,
                self._num_iterations_per_frame,
                self._params,
                self._adam,
                self._map_arrays.training_iterations,
                self._map_arrays.positions,
                self._map_arrays.orientations,
                jnp.asarray(active_mask_np),
                self._cache_rgb,
                self._cache_depth,
                cache_c2w,
                cache_valid,
                self._next_key(),
            )
            self._map_arrays = self._map_arrays._replace(training_iterations=new_ti)
            if log_fn is not None:
                log_fn(loss_dict)

        self._frames_processed += 1
        self._total_optimization_time += time.time() - t_start
        return {k: float(v) for k, v in loss_dict.items()}

    def _allocate_new_fields(self, frame_id, depth, c2w, kf_slot) -> None:
        active_ids = self._active_field_ids(frame_id)
        # dense active mask over capacity
        active_mask_np = np.zeros((self.capacity,), bool)
        active_mask_np[active_ids] = True
        if self._num_fields == 0:
            active_positions = self._map_arrays.positions
            active_mask = jnp.zeros((self.capacity,), bool)
        else:
            active_positions = self._map_arrays.positions
            active_mask = jnp.asarray(active_mask_np)

        centers, num_new, bb_min, bb_max = allocate_fields_jit(
            self._camera,
            self._field_radius,
            self._max_new_fields,
            depth,
            c2w,
            active_positions,
            active_mask,
            self._base_key,
            np.int32(100000 + self._frame_counter),
        )
        n_new = int(num_new)
        self._bb_min = np.minimum(self._bb_min, np.asarray(bb_min))
        self._bb_max = np.maximum(self._bb_max, np.asarray(bb_max))
        if n_new == 0:
            return
        self._ensure_capacity(self._num_fields + n_new)
        self._map_arrays = map_state.append_fields(
            self._map_arrays, self._num_fields, centers, num_new, frame_id, kf_slot
        )
        self._kf2fields.setdefault(frame_id, set()).update(
            range(self._num_fields, self._num_fields + n_new)
        )
        self._num_fields += n_new

    # -- throughput accounting (run_mapping.py:1225-1251) ------------------------

    @property
    def fps_estimate(self) -> float:
        if self._total_optimization_time == 0:
            return 0.0
        return self._frames_processed / self._total_optimization_time

    @property
    def spf_estimate(self) -> float:
        if self._frames_processed == 0:
            return 0.0
        return self._total_optimization_time / self._frames_processed

    # -- inference ----------------------------------------------------------------

    @profiling.benchmark
    def render_image(
        self,
        c2w: jnp.ndarray,
        camera,
        capacity_per_field: Optional[int] = None,
    ):
        """Render a full RGB-D image with the KNN blend path
        (run_mapping.py:403-437). Chunked over pixel blocks.

        Default path (permutohedral fields): span-restricted sampling + tiled
        MoE dispatch — per-ray samples cover only the interval where the ray
        intersects any field sphere, and all routed pairs are evaluated (no
        per-field capacity, no demand probe, no dropped pairs). Fallback
        (other encodings, or an explicit ``capacity_per_field``): the
        capacity-buffer dispatch with a demand probe.

        Returns (rgbd (H, W, 4), depth_vars (H, W)).
        """
        h, w = camera.height, camera.width
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        ijs_all = jnp.asarray(
            np.stack([ii, jj], -1).reshape(-1, 2).astype(np.float32)
        )
        block = self._pixel_block_size
        # Keep the per-block sample footprint (rays x span samples) constant:
        # at the default 8192 rays x 512 span samples the tiled render program
        # fits HBM with headroom, but e.g. span 1024 at the full block size
        # exceeds it (measured: 16.01G of 15.75G hbm). Shrink the ray block
        # proportionally instead of OOMing.
        if self._eval_span_samples > 512:
            block = max(1024, int(block * 512 / self._eval_span_samples))

        tiled = (
            capacity_per_field is None
            and self._fset.supports_tiled_knn()
            and jax.default_backend() == "tpu"  # CPU falls back (no Pallas)
        )
        if not tiled and capacity_per_field is None:
            probe_ijs = ijs_all[:block]
            if probe_ijs.shape[0] < block:
                probe_ijs = jnp.concatenate(
                    [probe_ijs, jnp.zeros((block - probe_ijs.shape[0], 2))]
                )
            max_count = int(
                render_demand_probe(
                    self._fset,
                    camera,
                    self._eval_num_samples,
                    self._eval_near,
                    self._eval_far,
                    self._params,
                    self._map_arrays.positions,
                    self._allocated_mask(),
                    probe_ijs,
                    jnp.asarray(c2w),
                )
            )
            capacity_per_field = 1 << max(13, int(np.ceil(np.log2(max(max_count, 1) * 1.5))))
            # bound total buffer size (capacity_per_field * field capacity)
            while capacity_per_field * self.capacity > (1 << 25) and capacity_per_field > 8192:
                capacity_per_field //= 2
            logger.info(
                "render dispatch: max demand %d -> capacity %d", max_count, capacity_per_field
            )

        drop_counts = []

        # ijs_all is the row-major pixel grid, so the MoE kernel can
        # regenerate each sample's pixel from (block offset + ray index)
        # instead of carrying coordinates through the dispatch sort
        ks = self._fset.num_knn * self._eval_span_samples
        # NGM_RAY_KERNEL=0 is the kill switch back to carried coordinates
        # (the in-kernel ray path is interpret-verified bit-exact but was
        # committed during a TPU tunnel outage — see STATUS r3)
        use_ray_kernel = (
            tiled
            and (ks & (ks - 1)) == 0
            and os.environ.get("NGM_RAY_KERNEL", "1") != "0"
        )

        def model(ijs, offset=0):
            if tiled:
                rgbd, dv, _tp = render_block_tiled_jit(
                    self._fset,
                    camera,
                    self._rcfg,
                    self._eval_span_samples,
                    self._eval_near,
                    self._eval_far,
                    self._params,
                    self._map_arrays.positions,
                    self._map_arrays.orientations,
                    self._allocated_mask(),
                    ijs,
                    jnp.asarray(c2w),
                    self._next_key(),
                    use_ray_kernel=use_ray_kernel,
                    block_offset=jnp.asarray(offset, jnp.int32),
                    # calibrate eval spacing to the train-time spacing the
                    # reference derives (run_mapping.py:199-207); the nrgbd
                    # bell's transmittance is spacing-dependent
                    sample_spacing=float(self._sample_spacing),
                )
                return rgbd, dv
            # kill-switch fallback: uniform [near, far] sweep at
            # _eval_num_samples. At defaults that count is DERIVED as
            # range / _sample_spacing (engine._read_config), so this path
            # also renders at the calibrated train-time spacing; it only
            # diverges from the tiled path when eval_num_samples is
            # overridden to a non-derived value (ADVICE r4).
            rgbd, dv, _tp, dropped = self._render_ij_block(
                ijs, c2w, camera, capacity_per_field
            )
            drop_counts.append(dropped)
            return rgbd, dv

        rgbds, depth_vars = chunking.batched_evaluation(
            model, ijs_all, block, pass_offset=use_ray_kernel
        )
        if drop_counts:
            chunking.warn_dropped_pairs(
                drop_counts, logger, "render", capacity_per_field
            )
        return rgbds.reshape(h, w, 4), depth_vars.reshape(h, w)

    def _render_ij_block(self, ijs, c2w, camera, capacity_per_field):
        return render_block_jit(
            self._fset,
            camera,
            self._rcfg,
            self._eval_num_samples,
            self._eval_near,
            self._eval_far,
            capacity_per_field,
            self._params,
            self._map_arrays.positions,
            self._map_arrays.orientations,
            self._allocated_mask(),
            ijs,
            jnp.asarray(c2w),
            self._next_key(),
        )


@functools.partial(
    jax.jit,
    static_argnames=("fset", "camera", "num_samples", "near", "far"),
)
def render_demand_probe(
    fset: NeuralFieldSet,
    camera,
    num_samples: int,
    near: float,
    far: float,
    params,
    positions,
    allocated_mask,
    ijs,  # (B, 2)
    c2w,
):
    """Max per-field routed-pair count for one render block (used to size the
    MoE dispatch capacity; see render_image)."""
    from neural_graph_mapping_tpu.ops import dispatch as dispatch_mod

    b = ijs.shape[0]
    dirs = camera.ijs_to_directions(ijs)
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)[:-1]
    distances = near + (far - near) * (edges + 0.5 / num_samples)
    points = (dirs[:, None, :] * distances[None, :, None]).reshape(-1, 3)
    points_world = transforms.transform_points(points, c2w)
    k = fset.num_knn
    knn_dists, knn_idx = dispatch_mod.topk_fields(
        points_world, positions, allocated_mask, k
    )
    inside = knn_dists[:, 0] < fset.field_radius
    pair_valid = jnp.repeat(inside, k) & jnp.isfinite(knn_dists.reshape(-1))
    n_cap = positions.shape[0]
    ids = jnp.where(pair_valid, knn_idx.reshape(-1), n_cap)
    counts = jnp.zeros((n_cap + 1,), jnp.int32).at[ids].add(1)
    return jnp.max(counts[:n_cap])


def span_sample_distances(
    t0: jnp.ndarray,  # (B,) per-ray span start
    t1: jnp.ndarray,  # (B,) per-ray span end
    u: jnp.ndarray,  # (B, S) stratification jitter in [0, 1)
    sample_spacing: float,
) -> jnp.ndarray:
    """Stratified sample distances for the span-restricted render path.

    With ``sample_spacing > 0``: samples step from t0 at the
    reference-calibrated spacing (run_mapping.py:199-207), stretched to
    span/S ONLY when the span outruns the static sample budget — so the
    trained occupancy bell is always evaluated at (or coarser than, never
    finer than) its training discretization. With 0: legacy dense-span
    stratification of [t0, t1].
    """
    num_samples = u.shape[-1]
    if sample_spacing > 0.0:
        per_ray = jnp.maximum(sample_spacing, (t1 - t0) / num_samples)  # (B,)
        return t0[:, None] + (
            jnp.arange(num_samples, dtype=jnp.float32)[None, :] + u
        ) * per_ray[:, None]  # (B, S)
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)[:-1]
    return t0[:, None] + (t1 - t0)[:, None] * (edges + u / num_samples)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fset", "camera", "rcfg", "num_samples", "near", "far", "interpret",
        "use_ray_kernel", "sample_spacing",
    ),
)
def render_block_tiled_jit(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    num_samples: int,
    near: float,
    far: float,
    params,
    positions,
    orientations,
    allocated_mask,
    ijs,  # (B, 2) float
    c2w,  # (4, 4)
    key,
    interpret: bool = False,
    use_ray_kernel: bool = False,
    block_offset=None,  # () int/float: index of ijs[0] in the row-major grid
    sample_spacing: float = 0.0,
):
    """Span-restricted full-image render block with tiled MoE dispatch.

    Per ray, samples start at t0 — the first distance where the ray enters
    any allocated field sphere — instead of the reference's uniform
    [near, far] sweep (most of which lands outside every field). Spacing is
    ``max(sample_spacing, span / num_samples)``: the nrgbd occupancy bell is
    a PER-SAMPLE opacity, so rendered transmittance depends on the sample
    spacing, and the reference calibrates eval spacing to the train-time
    depth-guided spacing (run_mapping.py:199-207 — 2*range/num_guided =
    1.25 cm at defaults). Measured r4 on identical weights: evaluating at
    ~2x the trained density biased depth toward the camera (the silhouette
    halo) and cost ~4 dB PSNR / 2x depth-L1 vs the reference protocol.
    ``sample_spacing=0`` reproduces the legacy dense-span behavior. All
    routed (sample, neighbor) pairs are then evaluated via
    NeuralFieldSet.apply_knn_tiled — no per-field capacity, no dropped
    pairs.
    """
    b = ijs.shape[0]
    dirs = camera.ijs_to_directions(ijs)  # (B, 3) camera frame
    rot = c2w[:3, :3]
    origin = c2w[:3, 3]
    dirs_w = dirs @ rot.T  # (B, 3) world

    # per-ray span over allocated field spheres
    co = positions - origin[None, :]  # (N, 3)
    proj = dirs_w @ co.T  # (B, N) distance along ray to closest approach
    c_sq = jnp.sum(co * co, axis=-1)  # (N,)
    r = float(fset.field_radius)
    disc = proj * proj - (c_sq[None, :] - r * r)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    enter = proj - sq
    exit_ = proj + sq
    hit = (disc > 0.0) & allocated_mask[None, :] & (exit_ > near) & (enter < far)
    enter_c = jnp.clip(enter, near, far)
    exit_c = jnp.clip(exit_, near, far)
    t0 = jnp.min(jnp.where(hit, enter_c, far), axis=-1)  # (B,)
    t1 = jnp.max(jnp.where(hit, exit_c, near), axis=-1)
    any_hit = jnp.any(hit, axis=-1)
    t0 = jnp.where(any_hit, t0, near)
    t1 = jnp.where(any_hit, jnp.maximum(t1, t0), far)

    u = jax.random.uniform(key, (b, num_samples))
    distances = span_sample_distances(t0, t1, u, sample_spacing)

    points_world = (
        origin[None, None, :] + dirs_w[:, None, :] * distances[..., None]
    )

    ray_ctx = None
    if use_ray_kernel:
        # the MoE kernel regenerates each sample point from (pair index,
        # span distance): pack the camera/extrinsics it needs. Requires
        # k * num_samples to be a power of two and ijs to be the row-major
        # pixel grid starting at block_offset (render_image's layout).
        ks = fset.num_knn * num_samples
        log2_ks = int(np.log2(ks))
        assert (1 << log2_ks) == ks, "use_ray_kernel needs power-of-two k*S"
        assert block_offset is not None, "use_ray_kernel needs block_offset"
        fx, fy, cx, cy, _ = camera.get_pinhole_camera_parameters(0.0)
        ray_params = jnp.concatenate(
            [
                rot.reshape(-1),  # R row-major (dir_w = R @ dir_cam)
                origin,
                jnp.asarray([1.0 / fx, 1.0 / fy, cx, cy], jnp.float32),
            ]
        )
        ray_ctx = {
            "dist": distances.reshape(-1),
            "ray_params": ray_params,
            "block_offset": jnp.asarray(block_offset, jnp.int32),
            "log2_ks": log2_ks,
            "width": int(camera.width),
        }

    outs = fset.apply_knn_tiled(
        params,
        points_world.reshape(-1, 3),
        positions,
        orientations,
        allocated_mask,
        interpret=interpret,
        pack_outputs=True,
        ray_ctx=ray_ctx,
    ).reshape(b, num_samples, -1)

    sample_colors = rcfg.color_factor * outs[..., :3]
    sample_geometries = outs[..., 3]
    # depth = -z in camera frame = distance * (-dir_cam_z); dirs are unit
    sample_depths = distances * (-dirs[:, 2])[:, None]
    neus_isds = None
    if rcfg.geometry_mode == "neus":
        neus_isds = 1.0 / jnp.abs(jnp.mean(params["neus_sd"]))

    from neural_graph_mapping_tpu.ops import quadrature as quad_mod

    q = quad_mod.quadrature(
        rcfg.geometry_mode,
        sample_colors,
        sample_geometries,
        distances,
        sample_depths,
        geometry_factor=rcfg.geometry_factor,
        neus_isds=neus_isds,
    )
    rgbd = jnp.concatenate([q.colors, q.depths[..., None]], axis=-1)
    return rgbd, q.depth_vars, q.term_probs


@functools.partial(
    jax.jit,
    static_argnames=("fset", "camera", "rcfg", "num_samples", "near", "far", "capacity"),
)
def render_block_jit(
    fset: NeuralFieldSet,
    camera,
    rcfg: render.RenderConfig,
    num_samples: int,
    near: float,
    far: float,
    capacity: int,
    params,
    positions,
    orientations,
    allocated_mask,
    ijs,  # (B, 2) float
    c2w,  # (4, 4)
    key,
):
    """Full-image render block: uniform eval sampling + KNN field blend
    (run_mapping.py:440-666 with use_vmap=False -> models.py:347-405).

    Spacing note (ADVICE r4): this kill-switch path samples the full
    [near, far] range with ``num_samples = eval_num_samples``, so its spacing
    is (far-near)/eval_num_samples — identical to the calibrated
    ``sample_spacing`` when eval_num_samples takes its derived default
    (run_mapping.py:199-207), exactly like the reference's own eval. It
    diverges from the tiled path's spacing floor only when the user overrides
    ``eval_num_samples`` below the derived count; the tiled path would then
    still render at the trained spacing while this one renders coarser.
    """
    b = ijs.shape[0]
    dirs = camera.ijs_to_directions(ijs)
    edges = jnp.linspace(0.0, 1.0, num_samples + 1)[:-1]
    u = jax.random.uniform(key, (b, num_samples))
    distances = near + (far - near) * (edges + u / num_samples)  # (B, S)
    points_cam = dirs[:, None, :] * distances[..., None]
    points_world = transforms.transform_points(points_cam, c2w)

    n_cap = positions.shape[0]
    # dispatch capacity: total pairs / fields, padded; static per (B, n_cap)
    outs, dropped = fset.apply_knn(
        params,
        points_world.reshape(-1, 3),
        positions,
        orientations,
        allocated_mask,
        capacity=capacity,
        with_stats=True,
    )
    outs = outs.reshape(b, num_samples, -1)

    sample_colors = rcfg.color_factor * outs[..., :3]
    sample_geometries = outs[..., 3]
    sample_depths = -points_cam[..., 2]
    neus_isds = None
    if rcfg.geometry_mode == "neus":
        # eval path: use the mean inv-sd across fields (the reference KNN path
        # has no per-sample neus_isds either; quadrature uses blended geometry)
        neus_isds = 1.0 / jnp.abs(jnp.mean(params["neus_sd"]))

    from neural_graph_mapping_tpu.ops import quadrature as quad_mod

    q = quad_mod.quadrature(
        rcfg.geometry_mode,
        sample_colors,
        sample_geometries,
        distances,
        sample_depths,
        geometry_factor=rcfg.geometry_factor,
        neus_isds=neus_isds,
    )
    rgbd = jnp.concatenate([q.colors, q.depths[..., None]], axis=-1)
    return rgbd, q.depth_vars, q.term_probs, dropped

"""CLI entry point: run online neural graph mapping on a SLAM dataset.

Rebuild of the reference ``run_mapping.py`` orchestration around the engine:
sequence splitting for held-out evaluation, per-chunk online eval, final
render + mesh evaluation, mesh extraction, checkpointing, and the yoco-style
config CLI (``python -m neural_graph_mapping_tpu.run_mapping --config ...``).
"""

from __future__ import annotations

import argparse
import copy
import json
import logging
import math
import os
import pathlib
import time
from collections import defaultdict
from datetime import datetime
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu import config as config_mod
from neural_graph_mapping_tpu.eval import render_metrics
from neural_graph_mapping_tpu.mapping import meshing
from neural_graph_mapping_tpu.mapping.engine import NeuralGraphMap
from neural_graph_mapping_tpu.utils import chunking, observability, profiling
from neural_graph_mapping_tpu.utils.prefetch import FramePrefetcher

logger = logging.getLogger(__name__)


def mean_metric_dicts(dicts: List[dict]) -> dict:
    """Arithmetic mean of metric dicts (reference run_mapping.py:82-92)."""
    sums = defaultdict(float)
    counts = defaultdict(int)
    for d in dicts:
        for k, v in d.items():
            sums[k] += v
            counts[k] += 1
    return {k: sums[k] / counts[k] for k in sums}


class NeuralGraphMapRunner:
    """Orchestrates fit / eval / meshing / checkpointing around the engine."""

    def __init__(self, config: dict) -> None:
        self.config = config
        self.engine = NeuralGraphMap(config)
        self._dataset_type = config_mod.str_to_object(config["dataset_type"])
        self._dataset_config = config.get("dataset_config", {})
        self._eval_ratio = float(config.get("eval_ratio", 0.0))
        self._eval_chunk_freq = config.get("eval_chunk_freq", None)
        self._eval_render_metrics = config.get("eval_metrics", [])
        self._eval_crop = config.get("eval_crop", None)
        self._eval_mesh = bool(config.get("eval_mesh", False))
        self._eval_mesh_num_points = int(config.get("eval_mesh_num_points", 200000))
        self._eval_mesh_alignment = bool(config.get("eval_mesh_alignment", True))
        self._eval_culling_method = config.get("eval_culling_method", "virt_cams")
        self._disable_eval = bool(config.get("disable_eval", False))
        self._extract_final_mesh = bool(config.get("extract_mesh", True))
        self._mesh_resolution = float(config.get("mesh_resolution", 0.02))
        self._keyframes_only = bool(config.get("keyframes_only", False))
        self._log_iteration_freq = int(config.get("log_iteration_freq", 100))
        # observability (reference config/neural_graph_map.yaml:44-54)
        self._render_vis = bool(config.get("render_vis", False))
        self._render_frames = list(config.get("render_frames", []) or [])
        self._render_frame_freq = int(config.get("render_frame_freq", 200))
        self._extract_mesh_frame_freq = int(config.get("extract_mesh_frame_freq", 100))
        self._extract_mesh_frames = set(config.get("extract_mesh_frames", []) or [])
        # per-field debug meshes after the full one (ref run_mapping.py:1107,1755)
        self._extract_mesh_fields = list(config.get("extract_mesh_fields", []) or [])
        # preview downscale (ref run_mapping.py:394-399, yaml default 0.3)
        self._preview_res_factor = float(config.get("preview_res_factor", 0.3))
        # point-chunk size for grid evaluation (ref run_mapping.py:138, :2260)
        self._block_size = int(config.get("block_size", 262144))
        self._store_intermediate_meshes = bool(
            config.get("store_intermediate_meshes", False)
        )
        self._eval_store_details = bool(config.get("eval_store_details", True))
        # frames decoded ahead by the host prefetch thread; 0 = synchronous
        # (reference DataLoader(num_workers=32), run_mapping.py:1006)
        self._prefetch_depth = int(config.get("host_prefetch_depth", 2))
        self._rerun_vis = bool(config.get("rerun_vis", False))
        self._rerun_save = config.get("rerun_save", None)
        self._rerun_connect_addr = config.get("rerun_connect_addr", None)
        self._wandb_project = config.get("wandb_project", "neural_graph_mapping_tpu")
        profiling.benchmark.enabled = bool(config.get("benchmark", False))
        self._run_name: Optional[str] = None
        out_dir = config.get("out_dir", "runs")
        self._out_dir = pathlib.Path(out_dir) / self.run_name
        self.metrics: Dict[str, float] = {}
        self._metric_dicts_for_chunks: List[dict] = []
        self._eval_details: List[list] = []
        self._model_path = config.get("model", None)
        self._wandb = None
        self._rerun = None
        self._iteration = 0

        logging.basicConfig(level=int(config.get("loglevel", 20)))

    @property
    def run_name(self) -> str:
        if self._run_name is None:
            stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
            self._run_name = f"NeuralGraphMap_{stamp}"
        return self._run_name

    # -- sequence splitting (reference run_mapping.py:959-999) ------------------

    def split_sequence(self, dataset) -> None:
        all_frame_ids = list(range(len(dataset)))
        last = all_frame_ids[-1]
        self.eval_frame_ids = set()
        self.train_frame_ids = set()
        self.chunks: List[dict] = []
        if self._eval_ratio == 0.0:
            self.train_frame_ids.update(all_frame_ids)
            return
        eval_freq = math.floor(1.0 / self._eval_ratio)
        self.chunks = [{"eval_frame_ids": set(), "at_frame_id": None}]
        kf_counter = 0
        for frame_id in all_frame_ids:
            if dataset.is_keyframe(frame_id, at_frame_id=last):
                kf_counter += 1
                if self._eval_chunk_freq and kf_counter % self._eval_chunk_freq == 0:
                    self.chunks.append({"eval_frame_ids": set(), "at_frame_id": None})
                self.chunks[-1]["at_frame_id"] = frame_id
                if kf_counter % eval_freq == 0:
                    self.chunks[-1]["eval_frame_ids"].add(frame_id)
                    self.eval_frame_ids.add(frame_id)
                else:
                    self.train_frame_ids.add(frame_id)
            else:
                self.train_frame_ids.add(frame_id)

    # -- main loop -----------------------------------------------------------------

    def fit(self) -> Dict[str, float]:
        dataset = self._dataset_type(self._dataset_config)
        dataset.load_slam_results()
        self.dataset = dataset

        try:
            self.gt_from_est = dataset.gt_from_est_transform("umeyama")
        except (ValueError, AttributeError) as e:
            logger.info("trajectory alignment unavailable (%s); using identity", e)
            self.gt_from_est = None

        self.split_sequence(dataset)
        self._out_dir.mkdir(parents=True, exist_ok=True)
        (self._out_dir / "eval_data").mkdir(exist_ok=True)

        # observability: one wandb run per fit (run_mapping.py:1036-1049) +
        # rerun streaming (run_mapping.py:1054-1059); both degrade to no-ops
        # when the packages are unavailable
        self._wandb = observability.WandbLogger(
            self._wandb_project, self.config, name=self.run_name
        )
        if self._rerun_vis or self._rerun_save or self._rerun_connect_addr:
            self._rerun = observability.RerunLogger(
                rrd_path=(
                    str(self._out_dir / f"{self.run_name}.rrd")
                    if self._rerun_save
                    else None
                ),
                connect_addr=self._rerun_connect_addr,
                spawn=self._rerun_vis and not self._rerun_save,
            )

        if self._model_path:
            self.load_model(self._model_path)

        # decode frame t+1 on a worker thread while the device trains frame t
        # (reference DataLoader(num_workers=32, pin_memory), run_mapping.py:1006)
        prefetcher = None
        if self._prefetch_depth > 0:
            train_seq = [f for f in range(len(dataset)) if f in self.train_frame_ids]
            prefetcher = FramePrefetcher(
                dataset, train_seq, self._prefetch_depth, to_device=True
            )

        chunk_id = 0
        loop_t0 = time.perf_counter()
        try:
            for frame_id in range(len(dataset)):
                if frame_id in self.train_frame_ids:
                    t_data = time.perf_counter()
                    item = (
                        prefetcher.get(frame_id) if prefetcher else dataset[frame_id]
                    )
                    # host wait for the decoded frame — with the prefetch
                    # thread ahead this should be ~0; without it, the full
                    # PNG decode cost lands here (VERDICT r4 item 4 A/B)
                    self.engine.phase_times["data_wait"] = (
                        self.engine.phase_times.get("data_wait", 0.0)
                        + time.perf_counter()
                        - t_data
                    )
                    t_h2d = time.perf_counter()
                    if "rgbd_dev" in item:
                        # prefetch thread already shipped u8 RGB + f32 depth
                        # during the previous frame's device step; reassemble
                        # on device (cheap) instead of uploading 4.9 MB f32
                        rgb_u8, depth = item["rgbd_dev"]
                        rgbd_dev = jnp.concatenate(
                            [
                                rgb_u8.astype(jnp.float32) / 255.0,
                                depth[..., None],
                            ],
                            axis=-1,
                        )
                    else:
                        # synchronous upload (~0.4 s/frame at 640x480 through
                        # the loopback relay — measured r5, the largest
                        # single wall-clock term of the mapping loop)
                        rgbd_dev = jnp.asarray(item["rgbd"])
                    self.engine.phase_times["h2d"] = (
                        self.engine.phase_times.get("h2d", 0.0)
                        + time.perf_counter()
                        - t_h2d
                    )
                    losses = self.engine.process_frame(dataset, frame_id, rgbd_dev)
                    self._iteration += self.engine._num_iterations_per_frame
                    self._log(frame_id, losses, item)
                # chunk-boundary online eval (run_mapping.py:1253-1257)
                if chunk_id < len(self.chunks):
                    chunk = self.chunks[chunk_id]
                    if chunk["at_frame_id"] == frame_id:
                        self.evaluate_chunk(chunk)
                        chunk_id += 1
            # wall-clock mapping rate over the whole frame loop (incl. data
            # wait + host bookkeeping + logging; the reference's fps_estimate
            # excludes logging, run_mapping.py:1225-1251 — report both)
            self._loop_wall_s = time.perf_counter() - loop_t0
        finally:
            if prefetcher is not None:
                prefetcher.close()

        if self._extract_final_mesh or self._eval_mesh:
            mesh_path = self._out_dir / "eval_data" / self._mesh_name()
            self.extract_mesh(mesh_path)
            for fid in self._extract_mesh_fields:
                # per-field debug meshes (ref run_mapping.py:1107-1115)
                self.extract_mesh(
                    mesh_path.with_stem(f"{mesh_path.stem}_{fid}"),
                    only_field=int(fid),
                )

        self.evaluate_full()
        self.save_model()
        if self._wandb is not None:
            self._wandb.log(dict(self.metrics))
            self._wandb.finish()
        return self.metrics

    # -- in-loop logging (reference run_mapping.py:1715-1766) --------------------

    def _log(self, frame_id: int, losses: dict, item: dict) -> None:
        """Loss streaming + rerun telemetry + periodic render previews /
        intermediate meshes (reference _log, run_mapping.py:1715-1766)."""
        new_iters = self.engine._num_iterations_per_frame
        if losses and self._iteration % self._log_iteration_freq < new_iters:
            logger.info(
                "frame %d losses %s",
                frame_id,
                {k: round(v, 4) for k, v in losses.items()},
            )
            if self._wandb is not None and self._wandb.enabled:
                self._wandb.log(
                    {**losses, "current_frame_id": frame_id}, step=self._iteration
                )

        if self._rerun is not None and self._rerun.enabled:
            e = self.engine
            self._rerun.set_frame(frame_id)
            c2w = np.asarray(self.dataset.get_slam_c2ws(frame_id))
            if np.isfinite(c2w).all():
                self._rerun.log_camera(
                    c2w, self.dataset.camera, rgbd=item["rgbd"]
                )
            if e.num_fields > 0:
                self._rerun.log_fields(
                    np.asarray(e._map_arrays.positions)[: e.num_fields],
                    e._field_radius,
                )

        if (
            self._render_vis
            and self._render_frames
            and (frame_id + 1) % self._render_frame_freq == 0
        ):
            self._log_renders(frame_id)

        if (
            (self._rerun is not None and self._rerun.enabled)
            or self._store_intermediate_meshes
        ) and (
            (frame_id + 1) % self._extract_mesh_frame_freq == 0
            or frame_id in self._extract_mesh_frames
        ):
            mesh = self.extract_mesh(
                self._out_dir / "eval_data" / f"mesh_{frame_id:06d}.ply"
                if self._store_intermediate_meshes
                else None
            )
            if mesh is not None and self._rerun is not None and self._rerun.enabled:
                self._rerun.log_mesh(mesh)

    def _log_renders(self, frame_id: int) -> None:
        """Periodic render-preview grid (reference run_mapping.py:1874-1906):
        one row per configured render frame, RGB and depth columns, saved as
        PNG under the run dir (and to wandb when available)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        preview_camera = self.dataset.camera.scaled_camera(self._preview_res_factor)
        n = len(self._render_frames)
        fig, ax = plt.subplots(n, 2, squeeze=False)
        for i, frac in enumerate(self._render_frames):
            fid = min(int(frac * (len(self.dataset) - 1)), frame_id)
            c2w = np.asarray(self.dataset.get_slam_c2ws(fid, frame_id))
            if not np.isfinite(c2w).all():
                continue
            rgbd, _ = self.engine.render_image(jnp.asarray(c2w), preview_camera)
            rgbd = np.asarray(rgbd)
            ax[i, 0].imshow(np.clip(rgbd[..., :3], 0, 1))
            ax[i, 1].imshow(rgbd[..., 3], vmin=0.0, vmax=7.0)
            ax[i, 0].axis("off")
            ax[i, 1].axis("off")
            if self._rerun is not None and self._rerun.enabled:
                self._rerun.log_camera(
                    c2w, preview_camera, rgbd=rgbd, name=f"camera_{i}"
                )
        previews = self._out_dir / "previews"
        previews.mkdir(exist_ok=True)
        png_path = previews / f"render_{frame_id:06d}.png"
        fig.savefig(png_path, dpi=100)
        plt.close(fig)
        if self._wandb is not None and self._wandb.enabled:
            self._wandb.log_image(
                "render_previews", str(png_path), step=self._iteration
            )

    def _mesh_name(self) -> str:
        prefix = "aligned_" if self.gt_from_est is not None else ""
        return f"{prefix}final.ply"

    # -- evaluation ---------------------------------------------------------------

    @profiling.benchmark
    def evaluate_frame(self, frame_id: int, at_frame_id: int) -> dict:
        """Held-out frame render metrics (reference run_mapping.py:1976-2020),
        plus the eval artifact dump: side-by-side target|render PNG and a
        tabulated ``details.txt`` (reference :2007-2015).

        ``eval_render_scale`` (< 1.0) renders at a downscaled camera and
        block-averages the target to match — a knob the reference lacks,
        added so the full held-out protocol stays practical while the
        full-resolution render path is being optimized (full 640x480 renders
        are seconds per frame)."""
        c2w = self.dataset.get_slam_c2ws(frame_id, at_frame_id)
        cam = self.dataset.camera
        scale = float(self.config.get("eval_render_scale", 1.0))
        if scale != 1.0:
            cam = cam.scaled_camera(scale)
        rgbd, _ = self.engine.render_image(jnp.asarray(c2w), cam)
        target = jnp.asarray(self.dataset[frame_id]["rgbd"])
        if scale != 1.0:
            fh = self.dataset.camera.height // cam.height
            fw = self.dataset.camera.width // cam.width
            th, tw = cam.height * fh, cam.width * fw
            blocks = target[:th, :tw].reshape(cam.height, fh, cam.width, fw, 4)
            rgb = blocks[..., :3].mean(axis=(1, 3))
            # depth: masked mean over valid (nonzero) pixels so invalid
            # sensor holes don't drag block averages toward the camera
            d = blocks[..., 3]
            valid = d != 0.0
            cnt = jnp.maximum(valid.sum(axis=(1, 3)), 1)
            depth = jnp.where(
                valid.any(axis=(1, 3)), d.sum(axis=(1, 3)) / cnt, 0.0
            )
            target = jnp.concatenate([rgb, depth[..., None]], axis=-1)
        out = {}
        for metric in self._eval_render_metrics:
            if metric == "psnr":
                out["psnr"] = render_metrics.psnr(
                    rgbd[..., :3], target[..., :3], self._eval_crop
                )
            elif metric == "ssim":
                out["ssim"] = render_metrics.ssim(
                    rgbd[..., :3], target[..., :3], self._eval_crop
                )
            elif metric == "depthl1":
                # the reference's depthl1 accepts crop but never applies it
                # (evaluation.py:59-62) — full-image depth L1; match that
                # protocol quirk exactly (measured r5: crop-10 scored the
                # same reference weights differently than the reference did)
                out["depthl1"] = render_metrics.depthl1(
                    rgbd[..., 3], target[..., 3], None
                )
            elif metric == "lpips":
                try:
                    out["lpips"] = render_metrics.lpips(
                        rgbd[..., :3], target[..., :3], self._eval_crop
                    )
                except FileNotFoundError:
                    logger.warning("LPIPS weights unavailable; skipping lpips")

        if self._eval_store_details and out:
            img_name = f"{frame_id:06d}_{at_frame_id:06d}.png"
            comparison = np.clip(
                np.concatenate(
                    [np.asarray(target[..., :3]), np.asarray(rgbd[..., :3])], axis=1
                ),
                0.0,
                1.0,
            )
            eval_dir = self._out_dir / "eval_data"
            eval_dir.mkdir(parents=True, exist_ok=True)
            chunking.save_image(comparison, eval_dir / img_name)
            self._eval_details.append(
                [img_name] + [float(out.get(m, float("nan"))) for m in self._eval_render_metrics]
            )
            import tabulate

            with open(eval_dir / "details.txt", "w") as f:
                f.write(
                    tabulate.tabulate(
                        self._eval_details,
                        headers=["filename", *self._eval_render_metrics],
                    )
                )
        return out

    @profiling.benchmark
    def evaluate_chunk(self, chunk: dict) -> None:
        if self._disable_eval or not chunk["eval_frame_ids"]:
            return
        dicts = [
            self.evaluate_frame(fid, chunk["at_frame_id"])
            for fid in sorted(chunk["eval_frame_ids"])
        ]
        self._metric_dicts_for_chunks.append(mean_metric_dicts(dicts))

    @profiling.benchmark
    def evaluate_full(self) -> None:
        """Final metrics (reference run_mapping.py:1920-1964).

        ``disable_eval`` skips the render/mesh evaluations but still reports
        the throughput/param accounting (the reference reports fps_estimate
        in final metrics unconditionally, run_mapping.py:1963-1964)."""
        online = mean_metric_dicts(
            self._metric_dicts_for_chunks if not self._disable_eval else []
        )
        final_render = {}
        if not self._disable_eval and self._eval_render_metrics and self.eval_frame_ids:
            dicts = [
                self.evaluate_frame(fid, len(self.dataset) - 1)
                for fid in sorted(self.eval_frame_ids)
            ]
            final_render = mean_metric_dicts(dicts)

        final_mesh = {}
        if (
            not self._disable_eval
            and self._eval_mesh
            and getattr(self.dataset, "has_gt_mesh", False)
        ):
            from neural_graph_mapping_tpu.eval import culling
            from neural_graph_mapping_tpu.utils import meshio

            est_path = self._out_dir / "eval_data" / self._mesh_name()
            if est_path.is_file():
                est_mesh = meshio.load_ply(est_path)
                final_mesh = culling.evaluate_raw_mesh(
                    est_mesh,
                    self.dataset,
                    self._eval_culling_method,
                    align=self._eval_mesh_alignment,
                    num_points=self._eval_mesh_num_points,
                )

        for k, v in online.items():
            self.metrics[f"online_{k}"] = v
        for k, v in final_render.items():
            self.metrics[f"final_{k}"] = v
        for k, v in final_mesh.items():
            self.metrics[f"mesh_{k}"] = v
        self.metrics["num_params_per_field"] = self.engine._fset.numel_per_field()
        self.metrics["num_fields"] = self.engine.num_fields
        self.metrics["num_params"] = (
            self.metrics["num_params_per_field"] * self.metrics["num_fields"]
        )
        self.metrics["fps_estimate"] = self.engine.fps_estimate
        self.metrics["spf_estimate"] = self.engine.spf_estimate
        # cumulative host/device phase split of process_frame (ours; the
        # reference reports only the fps/spf aggregate, run_mapping.py:1225-1251)
        for k, v in sorted(self.engine.phase_times.items()):
            self.metrics[f"phase_{k}_s"] = v
        if getattr(self, "_loop_wall_s", 0.0) > 0 and self.engine._frames_processed:
            self.metrics["wall_fps"] = (
                self.engine._frames_processed / self._loop_wall_s
            )
        logger.info("final metrics: %s", json.dumps(self.metrics, indent=2, default=float))

    # -- meshing -------------------------------------------------------------------

    @profiling.benchmark
    def extract_mesh(
        self,
        path,
        resolution: Optional[float] = None,
        min_iterations: int = 50,
        only_field: Optional[int] = None,
    ):
        e = self.engine
        ti = np.asarray(e._map_arrays.training_iterations)
        valid = (np.arange(e.capacity) < e.num_fields) & (ti >= min_iterations)
        if only_field is not None:
            # single-field debug mesh (ref run_mapping.py:1107-1115): select
            # the field FIRST so the min_iterations fallback applies to it,
            # not to the rest of the map
            valid = (np.arange(e.capacity) < e.num_fields) & (
                np.arange(e.capacity) == only_field
            )
            if not valid.any():
                logger.warning(
                    "extract_mesh(only_field=%s): no such allocated field "
                    "(num_fields=%d); skipping", only_field, e.num_fields,
                )
                return None
        elif not valid.any():
            valid = np.arange(e.capacity) < e.num_fields
        return meshing.extract_mesh(
            e._fset,
            e._params,
            e._map_arrays.positions,
            e._map_arrays.orientations,
            jnp.asarray(valid),
            e._field_radius,
            e._rcfg.geometry_mode,
            e._rcfg.geometry_factor,
            color_factor=e._rcfg.color_factor,
            resolution=resolution or self._mesh_resolution,
            transform=self.gt_from_est,
            eval_chunk=self._block_size,
            mesh_file_path=path,
        )

    # -- checkpointing (reference run_mapping.py:2147-2173) -------------------------

    def save_model(
        self, path: Optional[os.PathLike] = None, full: Optional[bool] = None
    ) -> pathlib.Path:
        """Checkpoint the map. ``full=True`` additionally saves the online
        bookkeeping (pose graph, kf->fields index, keyframe cache, slot
        tables, frame counters) so ``load_model`` can RESUME mapping — the
        reference's checkpoint (run_mapping.py:2147-2164) is render/mesh-only
        and cannot. Defaults to the ``checkpoint_full`` config key."""
        path = pathlib.Path(path) if path else self._out_dir / f"{self.run_name}.npz"
        if full is None:
            full = bool(self.config.get("checkpoint_full", False))
        e = self.engine
        arrays = {f"params.{k}": np.asarray(v) for k, v in e._params.items()}
        arrays.update(
            {
                "map.positions": np.asarray(e._map_arrays.positions),
                "map.orientations": np.asarray(e._map_arrays.orientations),
                "map.kf_ids": np.asarray(e._map_arrays.kf_ids),
                "map.kf_slots": np.asarray(e._map_arrays.kf_slots),
                "map.training_iterations": np.asarray(e._map_arrays.training_iterations),
                "num_fields": np.asarray(e.num_fields),
            }
        )
        if full:
            state = {
                "graph": {int(k): sorted(v) for k, v in e._graph.items()},
                "kf2fields": {int(k): sorted(int(i) for i in v) for k, v in e._kf2fields.items()},
                "kf_ids": sorted(e._kf_ids),
                "last_update": e._last_update,
                "frame_to_slot": {int(k): int(v) for k, v in e._frame_to_slot.items()},
                "free_slots": list(e._free_slots),
                "frames_processed": e._frames_processed,
                "total_optimization_time": e._total_optimization_time,
            }
            arrays["resume.state_json"] = np.frombuffer(
                json.dumps(state).encode(), dtype=np.uint8
            )
            if e._prev_kf2w_slots is not None:
                arrays["resume.prev_kf2w_slots"] = e._prev_kf2w_slots
            arrays["resume.cache_c2w"] = e._cache_c2w_np
            arrays["resume.cache_valid"] = e._cache_valid_np
            arrays["resume.bb_min"] = e._bb_min
            arrays["resume.bb_max"] = e._bb_max
            if e._cache_rgb is not None:
                # bf16 -> fp16 is exact for [0, 1] imagery
                arrays["resume.cache_rgb"] = np.asarray(
                    e._cache_rgb.astype(jnp.float16)
                )
                arrays["resume.cache_depth"] = np.asarray(e._cache_depth)
            # Optimizer state: without it a resumed run restarts Adam warmup
            # (zeroed moments, bias-correction t back at 1) on already-trained
            # fields, diverging from an uninterrupted run.
            for k, v in e._adam.m.items():
                arrays[f"resume.adam_m.{k}"] = np.asarray(v)
            for k, v in e._adam.v.items():
                arrays[f"resume.adam_v.{k}"] = np.asarray(v)
            arrays["resume.adam_steps"] = np.asarray(e._adam.steps)
            arrays["resume.rng_key"] = np.asarray(e._key)
            arrays["resume.base_key"] = np.asarray(e._base_key)
        np.savez_compressed(path, **arrays)

        model_config = copy.deepcopy(self.config)
        model_config["model"] = str(path)
        if self.metrics:
            model_config["results"] = self.metrics
        config_mod.save_config_to_file(path.with_suffix(".yaml"), model_config)
        config_mod.save_config_to_file(path.parent / "latest_run.yaml", model_config)
        logger.info("saved model to %s", path)
        return path

    def load_model(self, path: os.PathLike) -> None:
        logger.info("loading model from %s", path)
        data = np.load(path)
        e = self.engine
        params = {
            k[len("params."):]: jnp.asarray(v)
            for k, v in data.items()
            if k.startswith("params.")
        }
        if "enc.table" in params:
            # layout guard: tables are (N, F, L, T) feature-axis-MAJOR since
            # the c22e28f layout flip. A pre-flip (N, L, F, T) checkpoint has
            # the same element count, so every consumer's reshape would
            # silently interleave levels into features — renders/meshes
            # would be garbage with no error. Fail loudly instead.
            enc = e._fset.prototype.encoding
            t = params["enc.table"]
            want = (enc.nr_feat_per_level, enc.nr_levels)
            if t.ndim == 4 and t.shape[1:3] != want:
                raise ValueError(
                    f"checkpoint enc.table has shape {t.shape}; expected "
                    f"(N, F={want[0]}, L={want[1]}, T) — this looks like a "
                    "pre-layout-flip checkpoint (level-major tables); "
                    "re-save it or transpose axes 1 and 2"
                )
        e._params = params
        e._map_arrays = e._map_arrays.__class__(
            positions=jnp.asarray(data["map.positions"]),
            orientations=jnp.asarray(data["map.orientations"]),
            kf_ids=jnp.asarray(data["map.kf_ids"]),
            kf_slots=jnp.asarray(data["map.kf_slots"]),
            training_iterations=jnp.asarray(data["map.training_iterations"]),
        )
        e._num_fields = int(data["num_fields"])
        from neural_graph_mapping_tpu.mapping import optimizer

        e._adam = optimizer.init_adam_state(params)

        if "resume.state_json" in data:  # full checkpoint: restore mapping state
            state = json.loads(bytes(data["resume.state_json"]).decode())
            e._graph = {int(k): set(v) for k, v in state["graph"].items()}
            e._kf2fields = {
                int(k): set(v) for k, v in state["kf2fields"].items()
            }
            e._kf_ids = set(state["kf_ids"])
            e._last_update = state["last_update"]
            e._frame_to_slot = {
                int(k): int(v) for k, v in state["frame_to_slot"].items()
            }
            e._free_slots = list(state["free_slots"])
            e._frames_processed = int(state["frames_processed"])
            e._total_optimization_time = float(state["total_optimization_time"])
            if "resume.prev_kf2w_slots" in data:
                e._prev_kf2w_slots = data["resume.prev_kf2w_slots"]
            e._cache_c2w_np = data["resume.cache_c2w"]
            e._cache_valid_np = data["resume.cache_valid"]
            e._cache_c2w_dirty = True  # force re-upload of the device mirrors
            e._cache_valid_dirty = True
            e._bb_min = data["resume.bb_min"]
            e._bb_max = data["resume.bb_max"]
            if "resume.cache_rgb" in data:
                e._cache_rgb = jnp.asarray(data["resume.cache_rgb"]).astype(
                    jnp.bfloat16
                )
                e._cache_depth = jnp.asarray(data["resume.cache_depth"])
            if "resume.adam_steps" in data:
                e._adam = optimizer.AdamState(
                    m={
                        k[len("resume.adam_m."):]: jnp.asarray(v)
                        for k, v in data.items()
                        if k.startswith("resume.adam_m.")
                    },
                    v={
                        k[len("resume.adam_v."):]: jnp.asarray(v)
                        for k, v in data.items()
                        if k.startswith("resume.adam_v.")
                    },
                    steps=jnp.asarray(data["resume.adam_steps"]),
                )
            if "resume.rng_key" in data:
                e._key = jnp.asarray(data["resume.rng_key"])
                e._base_key = jnp.asarray(data["resume.base_key"])


def enable_compilation_cache() -> None:
    """Persist compiled XLA programs across processes. The online loop
    recompiles O(log N) times as field capacity doubles; without a persistent
    cache every run pays all of them again (~30 s each on TPU), which is what
    used to dominate fps_estimate."""
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/neural_graph_mapping_tpu/xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knob: run uncached
        logger.warning("persistent compilation cache unavailable")


def main(argv=None) -> None:
    """Entry point (reference run_mapping.py:2396-2407)."""
    enable_compilation_cache()
    config = config_mod.load_config_from_args(
        argv, default_config=["neural_graph_map.yaml"]
    )
    runner = NeuralGraphMapRunner(config)
    metrics = runner.fit()
    print(json.dumps(metrics, default=float))


if __name__ == "__main__":
    main()

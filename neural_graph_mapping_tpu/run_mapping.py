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
        self._run_name: Optional[str] = None
        out_dir = config.get("out_dir", "runs")
        self._out_dir = pathlib.Path(out_dir) / self.run_name
        self.metrics: Dict[str, float] = {}
        self._metric_dicts_for_chunks: List[dict] = []
        self._model_path = config.get("model", None)

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

        if self._model_path:
            self.load_model(self._model_path)

        chunk_id = 0
        iteration = 0
        for frame_id in range(len(dataset)):
            if frame_id in self.train_frame_ids:
                item = dataset[frame_id]
                losses = self.engine.process_frame(
                    dataset, frame_id, jnp.asarray(item["rgbd"])
                )
                iteration += self.engine._num_iterations_per_frame
                if losses and iteration % self._log_iteration_freq < self.engine._num_iterations_per_frame:
                    logger.info("frame %d losses %s", frame_id, {k: round(v, 4) for k, v in losses.items()})
            # chunk-boundary online eval (run_mapping.py:1253-1257)
            if chunk_id < len(self.chunks):
                chunk = self.chunks[chunk_id]
                if chunk["at_frame_id"] == frame_id:
                    self.evaluate_chunk(chunk)
                    chunk_id += 1

        if self._extract_final_mesh or self._eval_mesh:
            self.extract_mesh(self._out_dir / "eval_data" / self._mesh_name())

        self.evaluate_full()
        self.save_model()
        return self.metrics

    def _mesh_name(self) -> str:
        prefix = "aligned_" if self.gt_from_est is not None else ""
        return f"{prefix}final.ply"

    # -- evaluation ---------------------------------------------------------------

    def evaluate_frame(self, frame_id: int, at_frame_id: int) -> dict:
        """Held-out frame render metrics (reference run_mapping.py:1976-2020)."""
        c2w = self.dataset.get_slam_c2ws(frame_id, at_frame_id)
        rgbd, _ = self.engine.render_image(jnp.asarray(c2w), self.dataset.camera)
        target = jnp.asarray(self.dataset[frame_id]["rgbd"])
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
                out["depthl1"] = render_metrics.depthl1(
                    rgbd[..., 3], target[..., 3], self._eval_crop
                )
            elif metric == "lpips":
                try:
                    out["lpips"] = render_metrics.lpips(
                        rgbd[..., :3], target[..., :3], self._eval_crop
                    )
                except FileNotFoundError:
                    logger.warning("LPIPS weights unavailable; skipping lpips")
        return out

    def evaluate_chunk(self, chunk: dict) -> None:
        if self._disable_eval or not chunk["eval_frame_ids"]:
            return
        dicts = [
            self.evaluate_frame(fid, chunk["at_frame_id"])
            for fid in sorted(chunk["eval_frame_ids"])
        ]
        self._metric_dicts_for_chunks.append(mean_metric_dicts(dicts))

    def evaluate_full(self) -> None:
        """Final metrics (reference run_mapping.py:1920-1964)."""
        if self._disable_eval:
            return
        online = mean_metric_dicts(self._metric_dicts_for_chunks)
        final_render = {}
        if self._eval_render_metrics and self.eval_frame_ids:
            dicts = [
                self.evaluate_frame(fid, len(self.dataset) - 1)
                for fid in sorted(self.eval_frame_ids)
            ]
            final_render = mean_metric_dicts(dicts)

        final_mesh = {}
        if self._eval_mesh and getattr(self.dataset, "has_gt_mesh", False):
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
        logger.info("final metrics: %s", json.dumps(self.metrics, indent=2, default=float))

    # -- meshing -------------------------------------------------------------------

    def extract_mesh(self, path, resolution: Optional[float] = None, min_iterations: int = 50):
        e = self.engine
        ti = np.asarray(e._map_arrays.training_iterations)
        valid = (np.arange(e.capacity) < e.num_fields) & (ti >= min_iterations)
        if not valid.any():
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
            mesh_file_path=path,
        )

    # -- checkpointing (reference run_mapping.py:2147-2173) -------------------------

    def save_model(self, path: Optional[os.PathLike] = None) -> pathlib.Path:
        path = pathlib.Path(path) if path else self._out_dir / f"{self.run_name}.npz"
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


def main(argv=None) -> None:
    """Entry point (reference run_mapping.py:2396-2407)."""
    config = config_mod.load_config_from_args(
        argv, default_config=["neural_graph_map.yaml"]
    )
    runner = NeuralGraphMapRunner(config)
    metrics = runner.fit()
    print(json.dumps(metrics, default=float))


if __name__ == "__main__":
    main()

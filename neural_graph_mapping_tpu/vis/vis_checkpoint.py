"""Interactive checkpoint inspector: load a saved model, render views, and
stream fields + renders to rerun.

Functional rebuild of the reference's Blender-based viewer (vis_blender.py):
the reference embeds itself in Blender (bpy) for draggable field spheres and
renders via matplotlib; this version uses rerun for the 3D view (no Blender
dependency in this environment) and renders from dataset poses.

Usage:
  python -m neural_graph_mapping_tpu.vis.vis_checkpoint --config run.yaml \
      [--frames "[0, 50, 100]"]
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from neural_graph_mapping_tpu import config as config_mod
from neural_graph_mapping_tpu.run_mapping import NeuralGraphMapRunner
from neural_graph_mapping_tpu.utils.observability import RerunLogger


def main(argv=None) -> None:
    config = config_mod.load_config_from_args(argv)
    runner = NeuralGraphMapRunner(config)
    dataset_type = config_mod.str_to_object(config["dataset_type"])
    dataset = dataset_type(config.get("dataset_config", {}))
    dataset.load_slam_results()
    runner.dataset = dataset
    runner.engine._camera = dataset.camera
    runner.engine._init_cache(dataset.camera.height, dataset.camera.width)
    runner.load_model(config["model"])

    rrl = RerunLogger("ngm_checkpoint_vis")
    e = runner.engine
    positions = np.asarray(e._map_arrays.positions[: e.num_fields])
    if rrl.enabled:
        rrl.log_fields(positions, e._field_radius)

    for frame_id in config.get("frames", [0]):
        c2w = dataset.get_slam_c2ws(frame_id, len(dataset) - 1)
        rgbd, _ = e.render_image(jnp.asarray(c2w), dataset.camera)
        rrl.set_frame(frame_id)
        rrl.log_camera(c2w, dataset.camera, np.asarray(rgbd), name=f"render_{frame_id}")
        print(f"rendered frame {frame_id}: depth mean {float(rgbd[..., 3].mean()):.2f} m")


if __name__ == "__main__":
    main()

"""Interactive checkpoint inspector/editor: load a saved model, render
views, stream fields + renders to rerun, and write field-pose edits back.

Functional rebuild of the reference's Blender-based viewer (vis_blender.py):
the reference embeds itself in Blender (bpy) for draggable field spheres
whose moved positions are written back into the loaded map
(vis_blender.py:149-170); this version has no Blender in the environment,
so the same write-back capability is exposed headlessly — pose edits come
from the config/CLI (``edits``) or the :func:`edit_fields` API, the map is
re-rendered to inspect the effect, and ``save`` persists the edited
checkpoint. The 3D view streams to rerun when available.

Usage:
  python -m neural_graph_mapping_tpu.vis.vis_checkpoint --config run.yaml \
      [--frames "[0, 50]"] \
      [--edits "[{'field_id': 3, 'position': [1.0, 0.5, 0.0]}, \
                 {'field_ids': [0, 1], 'translate': [0.1, 0, 0]}]"] \
      [--save edited.npz]
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu import config as config_mod
from neural_graph_mapping_tpu.run_mapping import NeuralGraphMapRunner
from neural_graph_mapping_tpu.utils import transforms
from neural_graph_mapping_tpu.utils.observability import RerunLogger


def edit_fields(map_arrays, edits: Sequence[dict], num_fields: int):
    """Apply field-pose edits to a map-arrays pytree (write-back analog of
    the reference's draggable spheres, vis_blender.py:149-170).

    Each edit dict supports:
      - ``field_id`` + ``position`` (3,): set one field's position;
      - ``field_id``/``field_ids`` + ``translate`` (3,): shift position(s);
      - ``field_id``/``field_ids`` + ``transform`` (4, 4): rigid transform of
        position AND orientation (what loop-closure re-anchoring does).

    Returns a new map_arrays with updated positions/orientations.
    """
    positions = np.array(map_arrays.positions)
    orientations = np.array(map_arrays.orientations)
    for edit in edits:
        ids = edit.get("field_ids")
        if ids is None:
            ids = [edit["field_id"]]
        ids = np.asarray(ids, np.int64)
        if (ids < 0).any() or (ids >= num_fields).any():
            raise ValueError(f"edit targets out-of-range field ids {ids}")
        if "position" in edit:
            if ids.shape[0] != 1:
                raise ValueError("'position' edit targets exactly one field")
            positions[ids[0]] = np.asarray(edit["position"], np.float32)
        elif "translate" in edit:
            positions[ids] += np.asarray(edit["translate"], np.float32)
        elif "transform" in edit:
            t = np.asarray(edit["transform"], np.float32)
            positions[ids] = positions[ids] @ t[:3, :3].T + t[:3, 3]
            orientations[ids] = np.asarray(
                transforms.transform_quaternions(
                    jnp.asarray(orientations[ids]), jnp.asarray(t)
                )
            )
        else:
            raise ValueError(f"edit needs position/translate/transform: {edit}")
    return map_arrays.__class__(
        positions=jnp.asarray(positions),
        orientations=jnp.asarray(orientations),
        kf_ids=map_arrays.kf_ids,
        kf_slots=map_arrays.kf_slots,
        training_iterations=map_arrays.training_iterations,
    )


def main(argv: Optional[List[str]] = None) -> None:
    config = config_mod.load_config_from_args(argv)
    runner = NeuralGraphMapRunner(config)
    dataset_type = config_mod.str_to_object(config["dataset_type"])
    dataset = dataset_type(config.get("dataset_config", {}))
    dataset.load_slam_results()
    runner.dataset = dataset
    runner.engine._camera = dataset.camera
    runner.engine._init_cache(dataset.camera.height, dataset.camera.width)
    runner.load_model(config["model"])

    e = runner.engine
    edits = config.get("edits") or []
    if edits:
        e._map_arrays = edit_fields(e._map_arrays, edits, e.num_fields)
        print(f"applied {len(edits)} field edit(s)")

    rrl = RerunLogger("ngm_checkpoint_vis")
    positions = np.asarray(e._map_arrays.positions[: e.num_fields])
    if rrl.enabled:
        rrl.log_fields(positions, e._field_radius)

    for frame_id in config.get("frames", [0]):
        c2w = dataset.get_slam_c2ws(frame_id, len(dataset) - 1)
        rgbd, _ = e.render_image(jnp.asarray(c2w), dataset.camera)
        rrl.set_frame(frame_id)
        rrl.log_camera(c2w, dataset.camera, np.asarray(rgbd), name=f"render_{frame_id}")
        print(f"rendered frame {frame_id}: depth mean {float(rgbd[..., 3].mean()):.2f} m")

    if config.get("save"):
        out = runner.save_model(config["save"])
        print(f"saved edited checkpoint to {out}")


if __name__ == "__main__":
    main()

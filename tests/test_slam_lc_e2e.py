"""End-to-end loop-closure run on ORB-SLAM2-shaped SLAM files.

The always-clean fixed_kf_freq path never exercises the JSON → essential
graph → map-deformation chain on loop-closure-shaped data (reference
slam_dataset.py:424-547 feeding run_mapping.py:888-952). Here a drifted
trajectory with a global correction + keyframe culling at the loop-closure
frame runs through the full runner: the test asserts the parsed graph carries
the LC edge, the map deforms (field positions jump by the per-keyframe drift
correction) at the LC frame, re-anchoring moves the culled keyframe's fields
to a surviving anchor, and the run completes with a valid checkpoint.
"""

import numpy as np
import pytest
import yaml

from scripts.make_slam_fixture import write_slam_fixture
from scripts.refrun.export_synthetic_nrgbd import export

N_FRAMES = 40
KF_FREQ = 5
LC_FRAME = 30
REMOVED_KF = 15
MAX_DRIFT = 0.4
W, H, FX = 48, 36, 42.0


@pytest.fixture(scope="module")
def slam_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("slamdata")
    scene_dir = export(root, N_FRAMES, W, H, FX)
    from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset

    ds = SyntheticDataset(
        {"num_frames": N_FRAMES, "width": W, "height": H, "fx": FX, "fy": FX}
    )
    info = write_slam_fixture(
        scene_dir,
        np.asarray(ds.gt_c2ws),
        kf_freq=KF_FREQ,
        lc_frame=LC_FRAME,
        max_drift=MAX_DRIFT,
        removed_kfs=(REMOVED_KF,),
    )
    assert info["lc_frame"] == LC_FRAME
    return root


def _dataset_config(root):
    return {
        "root_dir": str(root),
        "scene": "synthetic",
        "images_dir": "images",
        "depth_dir": "depth",
        "poses_file": "poses.txt",
        "slam_c2w_file": "orbslam2_c2w.json",
        "slam_pg_file": "orbslam2_pg.json",
        "slam_final_file": "orbslam2_final.txt",
        "pose_source": "slam",
        "pg_source": "slam",
        "fps": 30,
        "up_axis": "y",
        "camera": {
            "width": W, "height": H, "fx": FX, "fy": FX,
            "cx": W / 2.0, "cy": H / 2.0, "pixel_center": 0.0,
        },
    }


def test_parsed_graph_carries_loop_closure(slam_scene):
    from neural_graph_mapping_tpu.datasets.nrgbd import NRGBDDataset

    ds = NRGBDDataset(_dataset_config(slam_scene))
    ds.load_slam_results()

    pre = ds.get_slam_essential_graph(LC_FRAME - 1)
    post = ds.get_slam_essential_graph(N_FRAMES - 1)
    # culled keyframe live before the rewrite, gone after
    assert REMOVED_KF in pre
    assert REMOVED_KF not in post
    # the loop edge exists only after the closure
    assert LC_FRAME not in pre.get(0, set())
    assert LC_FRAME in post[0] and 0 in post[LC_FRAME]

    # online pose drifts before the closure, snaps to ground truth after
    drifted = np.asarray(ds.get_slam_c2ws(LC_FRAME - KF_FREQ, LC_FRAME - 1))
    corrected = np.asarray(ds.get_slam_c2ws(LC_FRAME - KF_FREQ, LC_FRAME))
    jump = np.linalg.norm(drifted[:3, 3] - corrected[:3, 3])
    expected = MAX_DRIFT * (LC_FRAME - KF_FREQ) / LC_FRAME
    np.testing.assert_allclose(jump, expected, rtol=1e-4)


def test_full_runner_deforms_map_on_loop_closure(slam_scene, tmp_path):
    from tests.test_engine import tiny_config
    from neural_graph_mapping_tpu.run_mapping import NeuralGraphMapRunner

    config = dict(tiny_config())
    config.update(
        {
            "model_type": "neural_graph_mapping_tpu.models.fields.NeuralFieldSet",
            "dataset_type": "neural_graph_mapping_tpu.datasets.nrgbd.NRGBDDataset",
            "dataset_config": _dataset_config(slam_scene),
            "disable_eval": True,
            "extract_mesh": False,
            "num_iterations_per_frame": 1,
            "out_dir": str(tmp_path / "runs"),
        }
    )
    runner = NeuralGraphMapRunner(config)
    engine = runner.engine

    snaps = {}
    orig = engine.process_frame

    def spy(dataset, frame_id, rgbd):
        if frame_id == LC_FRAME:
            snaps["before"] = (
                np.array(engine._map_arrays.positions[: engine.num_fields]),
                np.array(engine._map_arrays.kf_ids[: engine.num_fields]),
            )
        out = orig(dataset, frame_id, rgbd)
        if frame_id == LC_FRAME:
            snaps["after"] = (
                np.array(engine._map_arrays.positions[: len(snaps["before"][0])]),
                np.array(engine._map_arrays.kf_ids[: len(snaps["before"][0])]),
            )
        return out

    engine.process_frame = spy
    runner.fit()

    pos_before, kf_before = snaps["before"]
    pos_after, kf_after = snaps["after"]
    assert len(pos_before) > 0

    # the loop-closure correction undoes the anchor keyframe's creation-time
    # drift: fields anchored to kf k move by ~k/LC_FRAME * MAX_DRIFT along -x
    # (map deformation, reference run_mapping.py:937-952). The culled
    # keyframe's fields re-anchor BEFORE the pose update (:907-929), so their
    # correction is the surviving anchor's — use the post-update anchor ids.
    expected = -np.stack(
        [kf_after / LC_FRAME * MAX_DRIFT, np.zeros_like(kf_after, np.float64),
         np.zeros_like(kf_after, np.float64)], -1
    )
    moved = pos_after - pos_before
    np.testing.assert_allclose(moved, expected, atol=2e-3)
    assert np.linalg.norm(moved, axis=-1).max() > 0.5 * MAX_DRIFT

    # the culled keyframe's fields re-anchor to a surviving keyframe
    assert (kf_before == REMOVED_KF).any()
    assert not (kf_after == REMOVED_KF).any()
    assert REMOVED_KF not in engine._kf_ids
    assert REMOVED_KF not in engine._kf2fields

    # run completed with a checkpoint
    ckpts = list((tmp_path / "runs").glob("*/*.npz"))
    assert len(ckpts) == 1
    assert int(np.load(ckpts[0])["num_fields"]) == engine.num_fields

"""End-to-end CLI run over an on-disk NRGBD-layout fixture.

Closes the gap between the loader fixtures (parsing only) and the synthetic
CLI runs (no filesystem dataset): the full ``run_mapping.main`` pipeline —
config CLI, loader, SLAM-result synthesis, online mapping, checkpointing —
driven from a real directory tree.
"""

import json

import numpy as np
import PIL.Image
import pytest
import yaml


W, H = 32, 24
N_FRAMES = 6


@pytest.fixture
def nrgbd_scene(tmp_path):
    scene = tmp_path / "data" / "tinyroom"
    (scene / "images").mkdir(parents=True)
    (scene / "depth_filtered").mkdir()
    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        PIL.Image.fromarray(rgb).save(scene / "images" / f"img{i}.png")
        depth = np.full((H, W), 1800 + 40 * i, np.uint16)  # mm
        PIL.Image.fromarray(depth).save(scene / "depth_filtered" / f"depth{i}.png")
    poses = np.tile(np.eye(4, dtype=np.float64), (N_FRAMES, 1, 1))
    poses[:, 0, 3] = 0.05 * np.arange(N_FRAMES)
    np.savetxt(scene / "poses.txt", poses.reshape(-1, 4))
    (scene / "gt_mesh.ply").write_bytes(b"")
    return tmp_path


def test_cli_nrgbd_fixture_end_to_end(nrgbd_scene, tmp_path):
    from tests.test_engine import tiny_config
    from neural_graph_mapping_tpu import run_mapping

    config = dict(tiny_config())
    config.update(
        {
            "model_type": "neural_graph_mapping_tpu.models.fields.NeuralFieldSet",
            "dataset_type": "neural_graph_mapping_tpu.datasets.nrgbd.NRGBDDataset",
            "dataset_config": {
                "root_dir": str(nrgbd_scene / "data"),
                "scene": "tinyroom",
                "camera": {
                    "width": W, "height": H,
                    "fx": 28.0, "fy": 28.0, "cx": 16.0, "cy": 12.0,
                },
                # no SLAM export files: synthesize from ground truth, the
                # reference's no-SLAM test path (slam_dataset.py:407-422)
                "pose_source": "gt",
                "pg_source": "fixed_kf_freq",
                "fixed_kf_freq": 2,
            },
            "disable_eval": True,
            "extract_mesh": False,
            "num_iterations_per_frame": 1,
            "out_dir": str(tmp_path / "runs"),
        }
    )
    config_path = tmp_path / "cfg.yaml"
    config_path.write_text(yaml.safe_dump(config))

    run_mapping.main(["--config", str(config_path)])

    runs = list((tmp_path / "runs").iterdir())
    assert len(runs) == 1
    run_dir = runs[0]
    ckpts = list(run_dir.glob("*.npz"))
    assert len(ckpts) == 1
    data = np.load(ckpts[0])
    assert int(data["num_fields"]) > 0
    # re-runnable yaml points back at the checkpoint
    rerun = yaml.safe_load((run_dir / "latest_run.yaml").read_text())
    assert rerun["model"] == str(ckpts[0])

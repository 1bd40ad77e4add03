"""Full-resume checkpointing: save mid-run, load into a fresh runner, and
continue mapping (beyond the reference's render/mesh-only checkpoint,
run_mapping.py:2147-2173)."""

import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset
from neural_graph_mapping_tpu.run_mapping import NeuralGraphMapRunner


def _runner_config(out_dir):
    from tests.test_engine import tiny_config

    cfg = dict(tiny_config())
    cfg.update(
        {
            "dataset_type": "neural_graph_mapping_tpu.datasets.synthetic.SyntheticDataset",
            "dataset_config": {
                "num_frames": 10, "width": 40, "height": 30, "fx": 35.0, "fy": 35.0
            },
            "disable_eval": True,
            "extract_mesh": False,
            "out_dir": str(out_dir),
            "model_type": "neural_graph_mapping_tpu.models.fields.NeuralFieldSet",
        }
    )
    return cfg


def test_full_checkpoint_resume(tmp_path):
    cfg = _runner_config(tmp_path)
    runner = NeuralGraphMapRunner(cfg)
    ds = SyntheticDataset(cfg["dataset_config"])
    ds.load_slam_results()
    runner.dataset = ds
    e = runner.engine
    e._camera = ds.camera
    e._init_cache(ds.camera.height, ds.camera.width)

    for fid in range(6):
        e.process_frame(ds, fid, jnp.asarray(ds[fid]["rgbd"]))
    assert e.num_fields > 0
    n_fields = e.num_fields
    graph_before = {k: set(v) for k, v in e._graph.items()}
    kf2fields_before = {k: set(v) for k, v in e._kf2fields.items()}

    path = runner.save_model(tmp_path / "ckpt.npz", full=True)

    # fresh runner; restore and verify the bookkeeping round-trips
    runner2 = NeuralGraphMapRunner(_runner_config(tmp_path / "b"))
    runner2.dataset = ds
    e2 = runner2.engine
    e2._camera = ds.camera
    e2._init_cache(ds.camera.height, ds.camera.width)
    runner2.load_model(path)

    assert e2.num_fields == n_fields
    assert e2._graph == graph_before
    assert e2._kf2fields == kf2fields_before
    assert e2._frame_to_slot == e._frame_to_slot
    assert e2._frames_processed == e._frames_processed
    np.testing.assert_array_equal(e2._cache_valid_np, e._cache_valid_np)
    np.testing.assert_allclose(
        np.asarray(e2._cache_depth), np.asarray(e._cache_depth)
    )
    # bf16 imagery round-trips exactly through fp16
    np.testing.assert_array_equal(
        np.asarray(e2._cache_rgb.astype(jnp.float32)),
        np.asarray(e._cache_rgb.astype(jnp.float32)),
    )
    # optimizer state round-trips: moments and per-field steps, so a resumed
    # run does NOT restart Adam warmup on already-trained fields
    np.testing.assert_array_equal(
        np.asarray(e2._adam.steps), np.asarray(e._adam.steps)
    )
    assert np.asarray(e._adam.steps).max() > 0
    for k in e._adam.m:
        np.testing.assert_array_equal(
            np.asarray(e2._adam.m[k]), np.asarray(e._adam.m[k])
        )
        np.testing.assert_array_equal(
            np.asarray(e2._adam.v[k]), np.asarray(e._adam.v[k])
        )
    np.testing.assert_array_equal(np.asarray(e2._key), np.asarray(e._key))

    # and mapping CONTINUES from the checkpoint
    for fid in range(6, 10):
        losses = e2.process_frame(ds, fid, jnp.asarray(ds[fid]["rgbd"]))
    assert losses and np.isfinite(list(losses.values())).all()
    assert e2.num_fields >= n_fields


def test_plain_checkpoint_still_loads(tmp_path):
    """A non-full checkpoint restores the render-capable state only."""
    cfg = _runner_config(tmp_path)
    runner = NeuralGraphMapRunner(cfg)
    ds = SyntheticDataset(cfg["dataset_config"])
    ds.load_slam_results()
    runner.dataset = ds
    e = runner.engine
    e._camera = ds.camera
    e._init_cache(ds.camera.height, ds.camera.width)
    for fid in range(4):
        e.process_frame(ds, fid, jnp.asarray(ds[fid]["rgbd"]))
    path = runner.save_model(tmp_path / "plain.npz", full=False)

    runner2 = NeuralGraphMapRunner(_runner_config(tmp_path / "b"))
    runner2.load_model(path)
    assert runner2.engine.num_fields == e.num_fields
    assert runner2.engine._graph == {}  # bookkeeping not included


def test_pre_layout_flip_checkpoint_rejected(tmp_path):
    """A checkpoint whose enc.table is level-major (pre-c22e28f layout) has
    the same element count as the feature-major layout, so every consumer's
    reshape would silently interleave levels into features; load_model must
    refuse it loudly."""
    import numpy as np

    cfg = _runner_config(tmp_path)
    runner = NeuralGraphMapRunner(cfg)
    ds = SyntheticDataset(cfg["dataset_config"])
    ds.load_slam_results()
    runner.dataset = ds
    e = runner.engine
    e._camera = ds.camera
    e._init_cache(ds.camera.height, ds.camera.width)
    for fid in range(3):
        e.process_frame(ds, fid, jnp.asarray(ds[fid]["rgbd"]))
    path = runner.save_model(tmp_path / "ok.npz", full=False)

    data = dict(np.load(path))
    t = data["params.enc.table"]  # (N, F, L, T)
    assert t.shape[1] != t.shape[2], "fixture ambiguous: F == L"
    data["params.enc.table"] = np.swapaxes(t, 1, 2)  # fake old layout
    bad = tmp_path / "old_layout.npz"
    np.savez(bad, **data)

    runner2 = NeuralGraphMapRunner(_runner_config(tmp_path / "c"))
    import pytest

    with pytest.raises(ValueError, match="layout-flip"):
        runner2.load_model(bad)

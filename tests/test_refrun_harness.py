"""CI smoke for the reference cross-check harness (scripts/refrun/).

The harness runs the REFERENCE implementation (/root/reference, PyTorch, on
CPU through local shims) against a scene exported from our SyntheticDataset.
It reaches deep into the reference's ``fit()`` preconditions
(run_mapping.py:1001-1092), so a reference-side path change or a shim drift
would break it silently; this test pins it end-to-end at toy scale (6 frames,
48x36, 2 iters/frame) and asserts the metrics the reference writes to its
run yaml come back finite.
"""

import pathlib
import subprocess
import sys

import pytest
import yaml

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference/src/neural_graph_mapping")


@pytest.mark.skipif(not REFERENCE.is_dir(), reason="reference checkout absent")
def test_reference_runs_through_shims(tmp_path):
    export_dir = tmp_path / "export"
    run_dir = tmp_path / "run"
    run_dir.mkdir()

    # deterministic tiny scene in NRGBD on-disk layout
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/refrun/export_synthetic_nrgbd.py"),
         str(export_dir), "6", "48", "36", "42.0"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    overrides = [
        "--dataset_config.root_dir", str(export_dir),
        "--dataset_config.camera.width", "48",
        "--dataset_config.camera.height", "36",
        "--dataset_config.camera.fx", "42.0",
        "--dataset_config.camera.fy", "42.0",
        "--dataset_config.camera.cx", "24.0",
        "--dataset_config.camera.cy", "18.0",
        "--num_iterations_per_frame", "2",
        "--num_train_fields", "4",
        "--num_rays_per_field", "32",
        "--num_samples_coarse", "4",
        "--num_samples_depth_guided", "4",
        # every 2nd keyframe held out -> exactly one eval frame on 6 frames
        "--eval_ratio", "0.5",
        "--eval_chunk_freq", "1000000",
    ]
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts/refrun/run_reference.py")]
        + overrides,
        cwd=run_dir, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])

    yamls = list(run_dir.glob("wandb/*/files/latest_run.yaml"))
    assert len(yamls) == 1, f"expected one run yaml, found {yamls}"
    results = yaml.safe_load(yamls[0].read_text())["results"]
    # the reference's own _evaluate_full keys (run_mapping.py:1920-1964)
    for key in ("final_psnr", "final_depthl1", "num_fields"):
        assert key in results, results
        v = float(results[key])
        assert v == v and abs(v) < 1e9, (key, v)
    assert results["num_fields"] >= 1

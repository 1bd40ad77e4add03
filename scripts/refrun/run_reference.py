"""Run the REFERENCE implementation (/root/reference, PyTorch) on CPU against
the exported synthetic scene — the direct quality cross-check (VERDICT r4
item 2).

Shims in ./shims stand in for the CUDA/unavailable deps (permutohedral CUDA
kernel -> pure-torch port of our lattice; pytorch3d/yoco/evo/torchmetrics/
open3d/... -> minimal local implementations). The reference's own engine code
runs unmodified.

Usage:
  python scripts/refrun/export_synthetic_nrgbd.py /tmp/ngm_nrgbd_export 240
  cd /tmp/refrun_work && python /root/repo/scripts/refrun/run_reference.py \
      --num_iterations_per_frame 20 --eval_ratio 0.2

Extra CLI args are yoco-style dotted overrides passed through to the
reference config.
"""

import os
import pathlib
import sys

_HERE = pathlib.Path(__file__).resolve().parent
_REPO = _HERE.parents[1]
# shims FIRST so they shadow any real-but-broken packages; then the reference
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_HERE / "shims"))
sys.path.insert(0, "/root/reference/src")

# keep JAX (imported transitively by shims) off the TPU
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402
import random  # noqa: E402

# the reference hard-codes a dummy Adam param on "cuda" (run_mapping.py:358);
# reroute explicit cuda device requests to cpu on this CUDA-less box
_orig_tensor = torch.tensor


def _tensor_cpu(*args, **kwargs):
    if str(kwargs.get("device", "")).startswith("cuda"):
        kwargs["device"] = "cpu"
    return _orig_tensor(*args, **kwargs)


torch.tensor = _tensor_cpu
torch.cuda.synchronize = lambda *a, **k: None  # called unconditionally in the loop

BASE_CONFIG = {
    "dataset_type": "neural_graph_mapping.slam_datasets.nrgbd_dataset.NRGBDDataset",
    "dataset_config": {
        "root_dir": "/tmp/ngm_nrgbd_export",
        "scene": "synthetic",
        "image_dir": "images",
        "depth_dir": "depth",  # NOT depth_filtered: keeps de-bias poly off
        "poses_file": "poses.txt",
        "slam_final_file": None,
        "slam_c2w_file": None,
        "slam_pg_file": None,
        "pose_source": "gt",
        "pg_source": "fixed_kf_freq",
        "fixed_kf_freq": 5,
        "fps": 30,
        "frame_skip": 0,
        "scale": 1,
        "prefetch": False,
        "device": "cpu",
        "up_axis": "y",
        "depth_bias": 0.0,
        "camera": {
            "width": 160,
            "height": 120,
            "fx": 140.0,
            "fy": 140.0,
            "cx": 80.0,
            "cy": 60.0,
            "pixel_center": 0.0,
        },
    },
    "device": "cpu",
    "eval_ratio": 0.2,
    "eval_near_distance": 0.0,
    "eval_far_distance": 8.0,
    "eval_chunk_freq": 50,
    "eval_metrics": ["psnr", "depthl1"],
    "eval_crop": 10,
    "eval_store_details": True,
    "keyframes_only": True,
    "eval_mesh": False,
    "num_iterations_per_frame": 20,
    "render_frame_freq": 1000000,  # no intermediate previews on CPU
    "extract_mesh_frame_freq": 1000000,
    "store_intermediate_meshes": False,
}


def build_config(args):
    """Reference yaml defaults -> BASE cross-check pins -> CLI overrides."""
    from neural_graph_mapping_tpu import config as cfg

    search_paths = ["", "/root/reference/src/neural_graph_mapping/config"]
    config = cfg.load_config("neural_graph_map.yaml", search_paths=search_paths)
    config = cfg.load_config(BASE_CONFIG, current_dict=config)
    i = 0
    while i < len(args):
        key = args[i]
        assert key.startswith("--"), f"override {key!r} must start with --"
        cfg._set_dotted(config, key[2:], cfg._parse_override_value(args[i + 1]))
        i += 2

    # YAML 1.1 `no` -> False; the reference means the string "no" (yoco quirk)
    fk = config["model_kwargs"]["field_kwargs"]
    if fk.get("skip_mode") is False:
        fk["skip_mode"] = "no"
    # YAML 1.1 parses bare `1e-3` as a string; coerce numeric-looking scalars
    for k, v in list(config.items()):
        if isinstance(v, str):
            try:
                config[k] = float(v)
            except ValueError:
                pass
    return config


def main():
    from neural_graph_mapping.run_mapping import NeuralGraphMap

    config = build_config(sys.argv[1:])
    torch.manual_seed(0)
    random.seed(0)
    ngm = NeuralGraphMap(config)
    ngm.fit()


if __name__ == "__main__":
    main()

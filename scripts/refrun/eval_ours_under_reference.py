"""Evaluate OUR trained checkpoint under the REFERENCE's eval protocol.

The decisive direction of the quality cross-check (VERDICT r4 item 2): export
a neural_graph_mapping_tpu npz checkpoint into the reference's
``{map_dict, all_fields_params}`` layout and drive the reference's own
``_evaluate_frame`` (render_image -> evaluation.psnr/depthl1,
run_mapping.py:1977-2020) over the same held-out keyframe split. This
direction is exact by construction: our encoding's static per-level shifts /
scales equal the shim's (seed-0), and the shim's ``level_capacities`` buffer
replicates our compacted coarse-level hashing — so if scores under the
reference eval match scores under ours, any remaining quality gap is
training dynamics, not eval protocol.

Usage:
  cd /tmp/somewhere && python scripts/refrun/eval_ours_under_reference.py \
      /path/to/ours.npz [--dotted.overrides ...]
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import run_reference  # noqa: E402  (bootstraps shims + reference paths)

import numpy as np  # noqa: E402
import torch  # noqa: E402


def params_from_npz(npz_path, prototype, level_capacities):
    """Our npz layout -> the reference's stacked all_fields_params dict."""
    z = np.load(npz_path)
    n = int(z["num_fields"])

    def t(key):
        return torch.from_numpy(np.asarray(z[key][:n]).astype(np.float32))

    proto_sd = prototype.state_dict()
    params = {
        # ours (N, F, L, T) feature-major -> torch (N, L, T, F)
        "_encoding.lattice_values": t("params.enc.table").permute(0, 2, 3, 1).contiguous(),
        # ours (N, in, out) -> torch (N, out, in)
        "_linears.0.weight": t("params.w0").permute(0, 2, 1).contiguous(),
        "_linears.0.bias": t("params.b0"),
        "_linears.1.weight": t("params.w1").permute(0, 2, 1).contiguous(),
        "_linears.1.bias": t("params.b1"),
        "_neus_sd": t("params.neus_sd"),
    }
    # broadcast the prototype's (shim seed-0 == ours) lattice geometry buffers
    for k, v in proto_sd.items():
        if k not in params:
            params[k] = v[None].repeat((n,) + (1,) * v.dim()).clone()
    params["_encoding._cap_mask"] = (
        torch.as_tensor(level_capacities, dtype=torch.float32)[None].repeat(n, 1)
        - 1.0
    )
    map_dict = {
        "positions": t("map.positions"),
        "orientations": t("map.orientations"),
        "kf_ids": torch.from_numpy(np.asarray(z["map.kf_ids"][:n]).astype(np.int64)),
        "training_iterations": torch.from_numpy(
            np.asarray(z["map.training_iterations"][:n]).astype(np.int64)
        ),
        "num": n,
    }
    return params, map_dict


def main():
    from neural_graph_mapping.run_mapping import NeuralGraphMap

    npz_path = sys.argv[1]
    config = run_reference.build_config(sys.argv[2:])
    ngm = NeuralGraphMap(config)

    # our checkpoint's per-level hash capacities (power-of-two masks)
    from neural_graph_mapping_tpu.ops.encodings import (
        PermutohedralEncoding as OursEnc,
    )

    enc_kwargs = dict(config["model_kwargs"]["field_kwargs"]["encoding_kwargs"])
    enc_kwargs.pop("init_scale", None)
    caps = OursEnc(**enc_kwargs).level_capacities
    print("level capacities:", caps)

    params, map_dict = params_from_npz(
        npz_path, ngm._model._prototype_field, caps
    )
    print(f"loaded {map_dict['num']} fields from {npz_path}")

    # fit() preamble (run_mapping.py:1002-1053) without training
    ngm._dataset = ngm._dataset_type(ngm._dataset_config)
    ngm._dataset.load_slam_results()
    ngm._dataset.set_mode("sequence")
    ngm._split_sequence()
    ngm._camera = ngm._dataset.camera
    ngm._run_dir = os.path.join("wandb", "cross_eval", "files")
    os.makedirs(ngm._run_dir, exist_ok=True)
    ngm._eval_data_dir = pathlib.Path(ngm._run_dir).parent / "eval_data"
    os.makedirs(ngm._eval_data_dir, exist_ok=True)

    ngm._global_map_dict = map_dict
    ngm._model.all_fields_params = params

    last = len(ngm._dataset) - 1
    ngm._current_frame_id = last
    rows = []
    for fid in sorted(ngm._eval_frame_ids):
        m = ngm._evaluate_frame(fid, last)
        rows.append(m)
        print(f"frame {fid}: " + "  ".join(f"{k}={v:.4f}" for k, v in m.items()))
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print("MEAN under reference eval:", mean)


if __name__ == "__main__":
    main()

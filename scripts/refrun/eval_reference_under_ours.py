"""Evaluate a converted REFERENCE checkpoint under OUR eval protocol.

Row (b) of the cross-check table (VERDICT r4 item 1): the reference trains on
CPU via scripts/refrun/run_reference.py, import_reference_ckpt.py converts its
``{map_dict, all_fields_params}`` to our npz layout, and this script renders
the held-out keyframes of the SAME exported scene through our engine
(run_mapping.NeuralGraphMapRunner.evaluate_frame -> engine.render_image) and
prints per-frame + mean PSNR / depth-L1.

If these scores match what the reference's own eval recorded for the same
weights (reference run_mapping.py:1976-2020 / evaluation.py:20-62), the two
eval protocols are equivalent and any fit-vs-fit gap is training dynamics.

Usage:
  PYTHONPATH=/root/repo python scripts/refrun/eval_reference_under_ours.py \
      /tmp/ref_converted.npz [--dotted.overrides ...]
"""

import json
import pathlib
import sys

_REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_REPO))


def main():
    import numpy as np

    from neural_graph_mapping_tpu import config as config_mod
    from neural_graph_mapping_tpu.run_mapping import (
        NeuralGraphMapRunner,
        mean_metric_dicts,
    )

    npz_path = sys.argv[1]
    config = config_mod.load_config_from_args(
        ["--config", "neural_graph_map.yaml",
         str(_REPO / "config" / "refrun_synthetic.yaml")] + sys.argv[2:],
    )
    runner = NeuralGraphMapRunner(config)

    # fit() preamble without training (mirrors run_mapping.fit:144-176)
    dataset = runner._dataset_type(runner._dataset_config)
    dataset.load_slam_results()
    runner.dataset = dataset
    runner.gt_from_est = None  # gt poses: identity alignment
    runner.split_sequence(dataset)
    runner._out_dir.mkdir(parents=True, exist_ok=True)
    (runner._out_dir / "eval_data").mkdir(exist_ok=True)

    runner.load_model(npz_path)
    print(f"loaded {runner.engine.num_fields} fields from {npz_path}")

    last = len(dataset) - 1
    rows = []
    for fid in sorted(runner.eval_frame_ids):
        m = {k: float(v) for k, v in runner.evaluate_frame(fid, last).items()}
        rows.append(m)
        print(f"frame {fid}: " + "  ".join(f"{k}={v:.4f}" for k, v in m.items()))
    mean = mean_metric_dicts(rows)
    print("MEAN under ours eval:", json.dumps(mean))


if __name__ == "__main__":
    main()

"""Export torchmetrics/LPIPS AlexNet weights to the .npz format consumed by
neural_graph_mapping_tpu.eval.render_metrics.lpips.

Run this on a machine WITH internet access + torchmetrics installed (this
deployment image has no egress, so pretrained weights must be shipped in):

    python scripts/export_lpips.py lpips_alex.npz
    NGM_LPIPS_WEIGHTS=lpips_alex.npz python -m neural_graph_mapping_tpu.run_mapping ...

Exports: conv{0..4}_w (OIHW), conv{0..4}_b, lin{0..4}_w (1, C, 1, 1).
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

    lpips = LearnedPerceptualImagePatchSimilarity(net_type="alex", normalize=True)
    net = lpips.net.net  # AlexNet feature slices
    arrays = {}
    convs = [m for m in net.modules() if m.__class__.__name__ == "Conv2d"]
    for i, conv in enumerate(convs[:5]):
        arrays[f"conv{i}_w"] = conv.weight.detach().numpy()
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lpips.net.lins):
        arrays[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: {sorted(arrays)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")

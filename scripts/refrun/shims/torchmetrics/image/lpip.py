"""LPIPS stand-in: no pretrained weights exist in this image (zero egress),
so the metric returns nan. ``.to("cuda")`` is a no-op so evaluation.py's
module-level ``.to("cuda")`` doesn't crash on CPU."""

import torch


class LearnedPerceptualImagePatchSimilarity(torch.nn.Module):
    def __init__(self, normalize=True, net_type="alex", **kwargs):
        super().__init__()

    def to(self, *args, **kwargs):  # tolerate .to("cuda") on a CPU box
        return self

    def forward(self, pred, target):
        return torch.tensor(float("nan"))

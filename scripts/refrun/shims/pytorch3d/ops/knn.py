"""Brute-force knn_points: returns (squared dists, indices, nn)."""

import torch


def knn_points(p1, p2, K=1, return_nn=False, return_sorted=True):
    d2 = torch.cdist(p1, p2) ** 2  # (B, P, N)
    dists, idx = torch.topk(d2, k=K, dim=-1, largest=False, sorted=return_sorted)
    nn = None
    if return_nn:
        nn = torch.gather(
            p2.unsqueeze(1).expand(-1, p1.shape[1], -1, -1),
            2,
            idx.unsqueeze(-1).expand(*idx.shape, p2.shape[-1]),
        )
    return dists, idx, nn

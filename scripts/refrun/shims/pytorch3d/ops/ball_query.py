"""Brute-force ball_query matching pytorch3d's contract: idx -1 where no
neighbor within radius (only K=1, return_nn=False used by the reference)."""

import torch


def ball_query(p1, p2, K=1, radius=1.0, return_nn=False):
    # p1 (B, P, 3), p2 (B, N, 3)
    d2 = torch.cdist(p1, p2) ** 2  # (B, P, N)
    vals, idx = torch.topk(d2, k=min(K, p2.shape[1]), dim=-1, largest=False)
    if idx.shape[-1] < K:  # pad (pytorch3d pads with -1/zeros)
        pad = K - idx.shape[-1]
        idx = torch.cat([idx, idx.new_full((*idx.shape[:-1], pad), -1)], -1)
        vals = torch.cat([vals, vals.new_full((*vals.shape[:-1], pad), float("inf"))], -1)
    inside = vals <= radius * radius
    idx = torch.where(inside, idx, torch.full_like(idx, -1))
    vals = torch.where(inside, vals, torch.zeros_like(vals))
    nn = None
    if return_nn:
        safe = idx.clamp(min=0)
        nn = torch.gather(
            p2.unsqueeze(1).expand(-1, p1.shape[1], -1, -1),
            2,
            safe.unsqueeze(-1).expand(*safe.shape, p2.shape[-1]),
        )
    return vals, idx, nn

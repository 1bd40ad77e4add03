"""Marching cubes via this repo's native marching-tetrahedra kernel.

The reference calls ``marching_cubes(volume, isolevel)`` with volume
(1, D, H, W) and expects ([verts], [faces]) in *voxel index* coordinates
(reference run_mapping.py:2294-2310 rescales by voxel_size afterwards).
"""

import sys
import pathlib

import numpy as np
import torch

_REPO = pathlib.Path(__file__).resolve().parents[5]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def marching_cubes(volume: torch.Tensor, isolevel: float = 0.0):
    from neural_graph_mapping_tpu.ops import native

    vol = np.ascontiguousarray(volume[0].detach().cpu().numpy(), dtype=np.float32)
    verts, faces = native.marching_tetrahedra(vol, float(isolevel))
    return [torch.from_numpy(np.asarray(verts))], [torch.from_numpy(np.asarray(faces))]

"""Minimal evo PosePath3D shim: align (Umeyama, no scale) + align_origin.

Backed by this repo's umeyama_alignment (utils/transforms.py); only the two
methods the reference calls (slam_dataset.py:303-316) exist. align() returns
(rot, trans, scale) like evo's, with scale fixed to 1.0 when
correct_scale=False (the reference asserts scale == 1.0).
"""

import sys
import pathlib

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parents[4]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


class PosePath3D:
    def __init__(self, poses_se3=None):
        self.poses_se3 = [np.asarray(p, dtype=np.float64) for p in poses_se3]

    @property
    def positions_xyz(self):
        return np.stack([p[:3, 3] for p in self.poses_se3])

    def transform(self, t):
        t = np.asarray(t)
        self.poses_se3 = [t @ p for p in self.poses_se3]

    def align(self, traj_ref, correct_scale=False):
        from neural_graph_mapping_tpu.utils.transforms import umeyama_alignment

        # aligns self onto traj_ref (evo semantics)
        t = umeyama_alignment(
            self.positions_xyz, traj_ref.positions_xyz, with_scale=correct_scale
        )
        self.transform(t)
        return t[:3, :3], t[:3, 3], 1.0

    def align_origin(self, traj_ref):
        t = traj_ref.poses_se3[0] @ np.linalg.inv(self.poses_se3[0])
        self.transform(t)
        return t

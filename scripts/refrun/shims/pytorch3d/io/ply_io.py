"""PLY writer shim delegating to this repo's meshio."""

import sys
import pathlib

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parents[5]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _save_ply(f, verts, faces, verts_normals=None, verts_colors=None, ascii=False,
              decimal_places=None, colors_as_uint8=False):
    from neural_graph_mapping_tpu.utils import meshio

    v = np.asarray(verts.detach().cpu().numpy(), dtype=np.float32)
    fc = np.asarray(faces.detach().cpu().numpy(), dtype=np.int32)
    colors = None
    if verts_colors is not None and len(verts_colors):
        colors = np.asarray(verts_colors.detach().cpu().numpy(), dtype=np.float32)
    path = f if isinstance(f, (str, pathlib.Path)) else getattr(f, "name", None)
    mesh = meshio.Mesh(v, fc, vertex_colors=colors)
    meshio.save_ply(path, mesh, colors_as_uint8=colors_as_uint8)

"""Tiny numpy-backed open3d stand-in: just enough surface for the reference's
slam_dataset.Mesh wrapper to import and hold vertex/triangle arrays."""

import numpy as np


class _Vector:
    def __init__(self, data=None):
        self._data = np.asarray(data) if data is not None else np.zeros((0, 3))

    def __array__(self, dtype=None):
        return np.asarray(self._data, dtype=dtype)

    def __len__(self):
        return len(self._data)


class utility:
    class Vector3dVector(_Vector):
        def __init__(self, data=None):
            super().__init__(np.asarray(data, dtype=np.float64) if data is not None else None)

    class Vector3iVector(_Vector):
        def __init__(self, data=None):
            super().__init__(np.asarray(data, dtype=np.int64) if data is not None else None)


class geometry:
    class TriangleMesh:
        def __init__(self, vertices=None, triangles=None):
            self.vertices = vertices if vertices is not None else utility.Vector3dVector()
            self.triangles = triangles if triangles is not None else utility.Vector3iVector()
            self.vertex_colors = utility.Vector3dVector()
            self.vertex_normals = utility.Vector3dVector()

        def compute_vertex_normals(self):
            return self

        def has_vertex_colors(self):
            return len(self.vertex_colors) > 0

        def simplify_vertex_clustering(self, voxel_size):
            return self


class camera:
    class PinholeCameraParameters:
        def __init__(self):
            self.intrinsic = None
            self.extrinsic = np.eye(4)

    class PinholeCameraIntrinsic:
        def __init__(self, width=0, height=0, fx=0.0, fy=0.0, cx=0.0, cy=0.0):
            self.width = width
            self.height = height
            self.intrinsic_matrix = np.array(
                [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float64
            )


class io:
    @staticmethod
    def read_triangle_mesh(path):
        import sys
        import pathlib

        repo = pathlib.Path(__file__).resolve().parents[3]
        if str(repo) not in sys.path:
            sys.path.insert(0, str(repo))
        from neural_graph_mapping_tpu.utils import meshio

        m = meshio.load_ply(path)
        mesh = geometry.TriangleMesh(
            utility.Vector3dVector(m.vertices), utility.Vector3iVector(m.faces)
        )
        if m.vertex_colors is not None:
            mesh.vertex_colors = utility.Vector3dVector(m.vertex_colors)
        return mesh

    @staticmethod
    def write_triangle_mesh(path, mesh):
        raise NotImplementedError("open3d shim: write_triangle_mesh")


class visualization:
    @staticmethod
    def draw_geometries(*a, **k):
        return None

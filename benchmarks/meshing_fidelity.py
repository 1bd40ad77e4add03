"""Quantify the marching-tetrahedra triangulation against analytic surfaces.

The reference extracts meshes with pytorch3d marching *cubes*
(run_mapping.py:2294); our native kernel marches tetrahedra (6 tets/cube,
native/src/ngm_native.cpp) — same isosurface, different triangulation.
Neither marching cubes (256-case tables) nor skimage exists in this image,
so instead of a cubes-vs-tets A/B this measures the thing the A/B would
bound: the absolute error of the tets mesh against *closed-form* ground
truth (sphere and box SDFs sampled at the production 2 cm grid), in the
exact acc/comp/F1 metrics of the CO-SLAM protocol (evaluation.py:65-130).
Any cubes-vs-tets metric delta is bounded by the sum of the two methods'
absolute errors, so tets errors far below the 1 cm F1 threshold retire the
"untested metric delta" risk (VERDICT r3 weak #7).

Both algorithms place vertices on grid edges by identical linear
interpolation of the field; they differ only in how the interpolated edge
points are triangulated inside each cube, so their vertex sets lie on the
same trilinear zero-crossing locus.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from neural_graph_mapping_tpu.eval.mesh_metrics import accuracy_completion_metrics
from neural_graph_mapping_tpu.ops import native
from neural_graph_mapping_tpu.utils.meshio import Mesh


def sphere_sdf(pts, r=0.5):
    return np.linalg.norm(pts, axis=-1) - r


def box_sdf(pts, half=(0.4, 0.3, 0.25)):
    q = np.abs(pts) - np.asarray(half)
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(q.max(-1), 0.0)
    return outside + inside


def sphere_surface_points(n, r=0.5, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True) * r


def box_surface_points(n, half=(0.4, 0.3, 0.25), seed=0):
    """Area-weighted uniform samples on the box surface."""
    rng = np.random.default_rng(seed)
    h = np.asarray(half)
    areas = np.array([h[1] * h[2], h[0] * h[2], h[0] * h[1]]) * 8.0
    axis = rng.choice(3, size=n, p=areas / areas.sum())
    sign = rng.choice([-1.0, 1.0], size=n)
    pts = rng.uniform(-1.0, 1.0, size=(n, 3)) * h
    pts[np.arange(n), axis] = sign * h[axis]
    return pts


def extract(sdf, resolution=0.02, extent=0.8):
    xs = np.arange(-extent, extent + resolution / 2, resolution, np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    vol = sdf(grid.reshape(-1, 3)).reshape(grid.shape[:3]).astype(np.float32)
    verts, tris = native.marching_tetrahedra(vol, 0.0)
    verts = verts * resolution + np.array([-extent] * 3, np.float32)
    return Mesh(verts, tris)


def run(num_points=200_000, resolution=0.02):
    results = {}
    for name, sdf, surf in (
        ("sphere", sphere_sdf, sphere_surface_points),
        ("box", box_sdf, box_surface_points),
    ):
        mesh = extract(sdf, resolution)
        est_pts, _ = mesh.sample_surface(num_points, seed=1)
        gt_pts = surf(num_points)
        m = accuracy_completion_metrics(est_pts, gt_pts)
        # exact point-to-surface accuracy (no GT sampling noise)
        m["accuracy_exact"] = float(np.abs(sdf(est_pts)).mean())
        m["accuracy_exact_max"] = float(np.abs(sdf(est_pts)).max())
        results[name] = m
        print(f"{name}: verts={len(mesh.vertices)} tris={len(mesh.faces)}")
        for k, v in m.items():
            print(f"  {k}: {v:.6f}")
    return results


if __name__ == "__main__":
    run()

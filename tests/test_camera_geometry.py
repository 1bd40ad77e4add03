"""Tests for the pinhole camera and geometric predicates."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu import geometry
from neural_graph_mapping_tpu.camera import Camera


def make_camera():
    return Camera.create(width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


class TestCamera:
    def test_pixel_center_convention(self):
        cam0 = Camera.create(4, 4, 1.0, 1.0, 2.0, 2.0, pixel_center=0.0)
        cam5 = Camera.create(4, 4, 1.0, 1.0, 2.5, 2.5, pixel_center=0.5)
        assert cam0.cx == cam5.cx and cam0.cy == cam5.cy
        fx, fy, cx, cy, _ = cam0.get_pinhole_camera_parameters(0.0)
        assert cx == 2.0 and cy == 2.0

    def test_project_backproject_roundtrip(self):
        cam = make_camera()
        pts = jnp.asarray([[0.3, -0.2, -2.0], [0.0, 0.0, -1.0]])  # opengl, in front
        uv, in_front = cam.project_points(pts, "opengl", pixel_center=0.0)
        assert bool(in_front.all())
        # back through ijs_to_directions: direction through that pixel matches
        ijs = jnp.stack([uv[:, 1], uv[:, 0]], axis=-1)  # (row, col)
        dirs = cam.ijs_to_directions(ijs, convention="opengl")
        scale = pts[:, 2:3] / dirs[:, 2:3]
        np.testing.assert_allclose(np.asarray(dirs * scale), np.asarray(pts), atol=1e-4)

    def test_depth_distance_roundtrip(self):
        cam = make_camera()
        ijs = jnp.asarray([[10, 20], [47, 63], [0, 0]], dtype=jnp.float32)
        depths = jnp.asarray([1.0, 2.5, 4.0])
        distances = cam.depth_to_distance(depths, ijs)
        assert bool((distances >= depths).all())
        back = cam.distance_to_depth(distances, ijs)
        np.testing.assert_allclose(np.asarray(back), np.asarray(depths), atol=1e-5)

    def test_depth_to_points_full(self):
        cam = make_camera()
        depth = jnp.zeros((48, 64)).at[24, 32].set(2.0)
        points, ijs, valid = cam.depth_to_points_full(depth, convention="opengl")
        assert points.shape == (48 * 64, 3)
        assert int(valid.sum()) == 1
        pt = points[jnp.argmax(valid)]
        # center pixel -> on the optical axis, z = -depth (opengl)
        np.testing.assert_allclose(np.asarray(pt), [2.0 / 60 * 0.5, -2.0 / 60 * 0.5, -2.0], atol=0.05)
        assert abs(float(pt[2]) + 2.0) < 1e-6

    def test_sample_ijs_uniform_stratified(self):
        cam = make_camera()
        key = jax.random.PRNGKey(0)
        ijs = jnp.asarray([[24, 32]] * 4, dtype=jnp.float32)
        pts, dists = cam.sample_ijs_uniform(key, ijs, 8, 1.0, 3.0)
        assert pts.shape == (4, 8, 3) and dists.shape == (4, 8)
        assert bool((dists >= 1.0).all() and (dists <= 3.0).all())
        # stratified: sorted within each ray
        np.testing.assert_array_equal(
            np.asarray(dists), np.sort(np.asarray(dists), axis=-1)
        )
        # points lie at the right distances
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), np.asarray(dists), atol=1e-5
        )

    def test_sample_per_ray_near_far(self):
        cam = make_camera()
        key = jax.random.PRNGKey(1)
        ijs = jnp.zeros((3, 2))
        near = jnp.asarray([0.0, 1.0, 2.0])
        far = jnp.asarray([1.0, 2.0, 4.0])
        _, dists = cam.sample_ijs_uniform(key, ijs, 16, near, far)
        assert bool((dists >= near[:, None]).all())
        assert bool((dists <= far[:, None]).all())

    def test_sample_weighted_bins(self):
        """Weighted-bin mode (reference camera.py:278-288): samples land only
        in positive-weight bins, uniformly within each, at bin frequencies
        matching the weights."""
        cam = make_camera()
        key = jax.random.PRNGKey(2)
        ijs = jnp.zeros((2, 2))
        boundaries = jnp.broadcast_to(
            jnp.asarray([1.0, 2.0, 3.0, 4.0]), (2, 4)
        )
        weights = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.5]), (2, 3))
        pts, dists = cam.sample_ijs_uniform(
            key, ijs, 512, weights=weights, boundaries=boundaries
        )
        assert pts.shape == (2, 512, 3) and dists.shape == (2, 512)
        d = np.asarray(dists)
        assert (d >= 1.0).all() and (d <= 4.0).all()
        # zero-weight middle bin receives (almost) nothing
        mid = ((d > 2.0) & (d < 3.0)).mean()
        assert mid < 0.01
        # ~half the mass in each outer bin
        lo = (d <= 2.0).mean()
        assert 0.4 < lo < 0.6
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), d, atol=1e-5
        )

    def test_sample_weighted_requires_both(self):
        cam = make_camera()
        try:
            cam.sample_ijs_uniform(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2)),
                4,
                weights=jnp.ones((1, 3)) / 3,
            )
            raised = False
        except ValueError:
            raised = True
        assert raised


class TestGeometry:
    def test_aabbs_intersect(self):
        min_a = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
        max_a = jnp.asarray([[1.0, 1.0, 1.0], [6.0, 6.0, 6.0]])
        min_b = jnp.asarray([[0.5, 0.5, 0.5]])
        max_b = jnp.asarray([[2.0, 2.0, 2.0]])
        got = geometry.aabbs_intersect(min_a, max_a, min_b, max_b)
        np.testing.assert_array_equal(np.asarray(got), [[True, False]])

    def test_spheres_to_aabbs(self):
        centers = jnp.asarray([[1.0, 2.0, 3.0]])
        mins, maxs = geometry.spheres_to_aabbs(centers, 0.5)
        np.testing.assert_allclose(np.asarray(mins), [[0.5, 1.5, 2.5]])
        np.testing.assert_allclose(np.asarray(maxs), [[1.5, 2.5, 3.5]])

    def test_closest_points_on_segments(self):
        p1 = jnp.asarray([[0.0, 0.0, 0.0]])
        p2 = jnp.asarray([[2.0, 0.0, 0.0]])
        queries = jnp.asarray([[1.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [5.0, 0.0, 1.0]])
        got = geometry.closest_points_on_segments(p1, p2, queries)
        want = np.asarray([[[1.0, 0, 0]], [[0.0, 0, 0]], [[2.0, 0, 0]]])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_zero_length_segment(self):
        p = jnp.asarray([[1.0, 1.0, 1.0]])
        got = geometry.closest_points_on_segments(p, p, jnp.asarray([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(got), [[[1.0, 1.0, 1.0]]])

    def test_segments_intersect_spheres(self):
        origin = jnp.zeros((1, 3))
        ends = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0]])
        centers = jnp.asarray([[2.0, 0.3, 0.0], [10.0, 0.0, 0.0]])
        got = geometry.segments_intersect_spheres(
            jnp.broadcast_to(origin, ends.shape), ends, centers, 0.5
        )
        np.testing.assert_array_equal(np.asarray(got), [[True, False], [False, False]])

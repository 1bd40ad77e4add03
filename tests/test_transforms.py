"""Unit tests for quaternion / transform math against closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from neural_graph_mapping_tpu.utils import transforms as tf


def random_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_wxyz_to_scipy(q):
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)  # xyzw


class TestQuaternions:
    def test_apply_matches_scipy(self):
        q = random_quats(32)
        pts = np.random.RandomState(1).randn(32, 3)
        got = np.asarray(tf.quaternion_apply(jnp.asarray(q), jnp.asarray(pts)))
        want = Rotation.from_quat(quat_wxyz_to_scipy(q)).apply(pts)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_multiply_matches_scipy(self):
        a = random_quats(16, seed=2)
        b = random_quats(16, seed=3)
        got = np.asarray(tf.quaternion_multiply(jnp.asarray(a), jnp.asarray(b)))
        want_rot = Rotation.from_quat(quat_wxyz_to_scipy(a)) * Rotation.from_quat(
            quat_wxyz_to_scipy(b)
        )
        want = want_rot.as_quat()  # xyzw
        want = np.concatenate([want[..., 3:], want[..., :3]], axis=-1)
        # sign ambiguity
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-5)

    def test_invert_is_inverse(self):
        q = jnp.asarray(random_quats(8, seed=4))
        pts = jnp.asarray(np.random.RandomState(5).randn(8, 3))
        roundtrip = tf.quaternion_apply(tf.quaternion_invert(q), tf.quaternion_apply(q, pts))
        np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(pts), atol=1e-5)

    def test_matrix_roundtrip(self):
        q = jnp.asarray(random_quats(64, seed=6))
        m = tf.quaternion_to_matrix(q)
        q2 = tf.matrix_to_quaternion(m)
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(q), atol=1e-5)

    def test_matrix_to_quaternion_near_pi_rotations(self):
        # rotations by ~pi stress the branchless selection
        for axis in np.eye(3):
            rot = Rotation.from_rotvec(np.pi * axis).as_matrix()
            q = tf.matrix_to_quaternion(jnp.asarray(rot))
            m = tf.quaternion_to_matrix(q)
            np.testing.assert_allclose(np.asarray(m), rot, atol=1e-5)


class TestComplex:
    def test_apply_rotates(self):
        theta = 0.7
        c = jnp.asarray([np.cos(theta), np.sin(theta)])
        pt = jnp.asarray([1.0, 0.0])
        got = tf.complex_apply(c, pt)
        np.testing.assert_allclose(np.asarray(got), [np.cos(theta), np.sin(theta)], atol=1e-6)

    def test_invert(self):
        c = jnp.asarray([np.cos(0.3), np.sin(0.3)])
        pt = jnp.asarray([0.4, -1.2])
        roundtrip = tf.complex_apply(tf.complex_invert(c), tf.complex_apply(c, pt))
        np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(pt), atol=1e-6)


class TestTransforms:
    def _random_rigid(self, seed=0):
        rng = np.random.RandomState(seed)
        t = np.eye(4)
        t[:3, :3] = Rotation.random(random_state=rng).as_matrix()
        t[:3, 3] = rng.randn(3)
        return jnp.asarray(t, dtype=jnp.float32)

    def test_transform_points_inverse_roundtrip(self):
        t = self._random_rigid(7)
        pts = jnp.asarray(np.random.RandomState(8).randn(10, 3), jnp.float32)
        fwd = tf.transform_points(pts, t)
        back = tf.transform_points(fwd, t, inv=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_invert_rigid(self):
        t = self._random_rigid(9)
        ident = np.asarray(t @ tf.invert_rigid(t))
        np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)

    def test_transform_quaternions_rotates_orientation(self):
        t = self._random_rigid(10)
        q = jnp.asarray(random_quats(5, seed=11), jnp.float32)
        q_t = tf.transform_quaternions(q, t)
        # applying the transformed quat equals rotating by R then original quat
        pts = jnp.asarray(np.random.RandomState(12).randn(5, 3), jnp.float32)
        lhs = tf.quaternion_apply(q_t, pts)
        rhs = jnp.einsum("dk,nk->nd", t[:3, :3], tf.quaternion_apply(q, pts))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    def test_homogeneous(self):
        x = jnp.asarray([[1.0, 2.0, 3.0]])
        h = tf.to_homogeneous(x)
        assert h.shape == (1, 4) and h[0, 3] == 1.0
        np.testing.assert_allclose(np.asarray(tf.to_inhomogeneous(h)), np.asarray(x))


class TestUmeyama:
    def test_recovers_known_transform(self):
        rng = np.random.RandomState(13)
        src = rng.randn(50, 3)
        rot = Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        dst = src @ rot.T + t
        est = tf.umeyama_alignment(src, dst)
        np.testing.assert_allclose(est[:3, :3], rot, atol=1e-8)
        np.testing.assert_allclose(est[:3, 3], t, atol=1e-8)

    def test_with_scale(self):
        rng = np.random.RandomState(14)
        src = rng.randn(50, 3)
        rot = Rotation.random(random_state=rng).as_matrix()
        dst = 2.5 * src @ rot.T + np.array([1.0, -2.0, 0.5])
        est = tf.umeyama_alignment(src, dst, with_scale=True)
        aligned = src @ est[:3, :3].T + est[:3, 3]
        np.testing.assert_allclose(aligned, dst, atol=1e-8)

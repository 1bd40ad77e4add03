"""Tests for the map registry: allocation, growth, re-anchoring."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.mapping import map_state
from neural_graph_mapping_tpu.utils import transforms


class TestMapArrays:
    def test_init_and_grow(self):
        arrays = map_state.init_map_arrays(4)
        assert map_state.capacity(arrays) == 4
        grown = map_state.grow_capacity(arrays, 9)
        assert map_state.capacity(grown) == 16
        np.testing.assert_allclose(np.asarray(grown.orientations[:, 0]), 1.0)

    def test_append_fields(self):
        arrays = map_state.init_map_arrays(8)
        centers = jnp.asarray([[1.0, 0, 0], [0, 2.0, 0], [9, 9, 9]])
        arrays = map_state.append_fields(arrays, 2, centers, 2, frame_id=7, kf_slot=3)
        np.testing.assert_allclose(np.asarray(arrays.positions[2]), [1, 0, 0])
        np.testing.assert_allclose(np.asarray(arrays.positions[3]), [0, 2, 0])
        # third row was beyond num_new -> not written
        np.testing.assert_allclose(np.asarray(arrays.positions[4]), 0.0)
        assert int(arrays.kf_ids[2]) == 7 and int(arrays.kf_slots[3]) == 3


class TestUncoveredCells:
    def test_allocates_over_uncovered_points(self):
        key = jax.random.PRNGKey(0)
        pts = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
        valid = jnp.ones(2, bool)
        field_pos = jnp.zeros((4, 3))
        field_valid = jnp.zeros(4, bool)  # no fields yet
        centers, n = map_state.uncovered_cells(
            key, pts, valid, field_pos, field_valid, 1.0, max_new=8
        )
        assert int(n) == 2
        # each point should be covered by its cell center (within radius)
        c = np.asarray(centers[: int(n)])
        d0 = np.linalg.norm(c - np.asarray([0.0, 0, 0]), axis=-1).min()
        d1 = np.linalg.norm(c - np.asarray([5.0, 5, 5]), axis=-1).min()
        assert d0 <= 1.0 + 1e-5 and d1 <= 1.0 + 1e-5

    def test_covered_points_allocate_nothing(self):
        key = jax.random.PRNGKey(1)
        pts = jax.random.normal(key, (100, 3)) * 0.2
        valid = jnp.ones(100, bool)
        field_pos = jnp.zeros((1, 3))
        field_valid = jnp.ones(1, bool)  # one field at origin covers all
        _, n = map_state.uncovered_cells(
            key, pts, valid, field_pos, field_valid, 1.0, max_new=8
        )
        assert int(n) == 0

    def test_dedupes_cells(self):
        key = jax.random.PRNGKey(2)
        # many points in one small cluster -> exactly 1-2 cells
        pts = jax.random.normal(key, (500, 3)) * 0.05
        valid = jnp.ones(500, bool)
        centers, n = map_state.uncovered_cells(
            key, pts, valid, jnp.zeros((1, 3)), jnp.zeros(1, bool), 1.0, max_new=32
        )
        assert 1 <= int(n) <= 4

    def test_invalid_points_ignored(self):
        key = jax.random.PRNGKey(3)
        pts = jnp.asarray([[50.0, 0, 0]])
        valid = jnp.zeros(1, bool)
        _, n = map_state.uncovered_cells(
            key, pts, valid, jnp.zeros((1, 3)), jnp.zeros(1, bool), 1.0, max_new=8
        )
        assert int(n) == 0


class TestReanchoring:
    def test_identity_update_is_noop(self):
        arrays = map_state.init_map_arrays(4)
        arrays = arrays._replace(
            positions=jnp.asarray([[1.0, 2, 3]] * 4),
            kf_slots=jnp.asarray([0, 1, 0, 1]),
        )
        slots = jnp.tile(jnp.eye(4), (8, 1, 1))
        out = map_state.reanchor_field_poses(arrays, slots, slots)
        np.testing.assert_allclose(np.asarray(out.positions), np.asarray(arrays.positions), atol=1e-6)

    def test_abs_rel_abs_roundtrip_matches_delta(self):
        """abs->rel(prev)->abs(new) == applying new @ inv(prev) directly."""
        rng = np.random.RandomState(0)
        from scipy.spatial.transform import Rotation

        def rand_pose(rs):
            t = np.eye(4, dtype=np.float32)
            t[:3, :3] = Rotation.random(random_state=rs).as_matrix()
            t[:3, 3] = rs.randn(3)
            return t

        prev = np.stack([rand_pose(rng) for _ in range(4)])
        new = np.stack([rand_pose(rng) for _ in range(4)])
        arrays = map_state.init_map_arrays(4)
        q = np.stack(
            [Rotation.random(random_state=rng).as_quat()[[3, 0, 1, 2]] for _ in range(4)]
        ).astype(np.float32)
        arrays = arrays._replace(
            positions=jnp.asarray(rng.randn(4, 3).astype(np.float32)),
            orientations=jnp.asarray(q),
            kf_slots=jnp.asarray([0, 1, 2, 3]),
        )
        out = map_state.reanchor_field_poses(
            arrays, jnp.asarray(prev), jnp.asarray(new)
        )
        # check field 2 manually: rel = inv(prev) @ pos; abs = new @ rel
        rel = np.linalg.inv(prev[2]) @ np.append(np.asarray(arrays.positions[2]), 1.0)
        want = (new[2] @ rel)[:3]
        np.testing.assert_allclose(np.asarray(out.positions[2]), want, atol=1e-4)

    def test_nan_pose_leaves_field_untouched(self):
        arrays = map_state.init_map_arrays(2)
        arrays = arrays._replace(
            positions=jnp.asarray([[1.0, 0, 0], [2.0, 0, 0]]),
            kf_slots=jnp.asarray([0, 1]),
        )
        prev = jnp.tile(jnp.eye(4), (2, 1, 1))
        new = prev.at[1].set(jnp.nan)
        out = map_state.reanchor_field_poses(arrays, prev, new)
        np.testing.assert_allclose(np.asarray(out.positions[1]), [2.0, 0, 0])
        assert bool(jnp.isfinite(out.positions).all())

    def test_cell_code_roundtrip(self):
        ijk = jnp.asarray([[-5, 3, 499], [0, 0, 0], [-500, 500, -17]])
        codes = map_state._cell_code(ijk)
        back = map_state._code_to_cell(codes)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(ijk))

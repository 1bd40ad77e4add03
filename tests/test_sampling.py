"""Unit tests for the target samplers and field selection."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.camera import Camera
from neural_graph_mapping_tpu.mapping import sampling


def make_camera():
    return Camera.create(width=64, height=48, fx=55.0, fy=55.0, cx=32.0, cy=24.0)


class TestMaskedChoice:
    def test_distinct_and_valid(self):
        mask = jnp.zeros(100, bool).at[jnp.asarray([3, 7, 50])].set(True)
        idx, valid = sampling.masked_choice_without_replacement(
            jax.random.PRNGKey(0), mask, 5
        )
        chosen = set(np.asarray(idx)[np.asarray(valid)].tolist())
        assert chosen <= {3, 7, 50}
        assert int(valid.sum()) == 3
        assert len(chosen) == 3  # distinct

    def test_empty_mask(self):
        idx, valid = sampling.masked_choice_without_replacement(
            jax.random.PRNGKey(1), jnp.zeros(10, bool), 4
        )
        assert not bool(valid.any())


class TestSelectTargetFields:
    def test_half_observed_half_random(self):
        allocated = jnp.arange(64) < 40
        observed = jnp.zeros(64, bool).at[jnp.arange(10)].set(True)
        ids, valid = sampling.select_target_fields(
            jax.random.PRNGKey(2), observed, allocated, 8
        )
        assert ids.shape == (8,) and bool(valid.all())
        ids_np = np.asarray(ids)
        assert len(set(ids_np.tolist())) == 8  # distinct
        assert (ids_np < 40).all()  # allocated only
        # first half drawn from observed fields
        assert (ids_np[:4] < 10).all()

    def test_backfill_invalid_observed_slots_with_extra_random(self):
        """Reference run_mapping.py:1300-1310: when fewer than F/2 fields are
        observed, the missing observed slots are backfilled with EXTRA random
        fields so all min(F, num_fields) slots train — not just F/2 + valid
        observed."""
        allocated = jnp.arange(64) < 40
        observed = jnp.zeros(64, bool).at[jnp.asarray([5])].set(True)  # 1 < F/2
        for seed in range(8):
            ids, valid = sampling.select_target_fields(
                jax.random.PRNGKey(seed), observed, allocated, 8
            )
            assert bool(valid.all()), f"seed {seed}: backfill left invalid slots"
            ids_np = np.asarray(ids)
            assert len(set(ids_np.tolist())) == 8, f"seed {seed}: duplicates"
            assert (ids_np < 40).all()
            assert 5 in ids_np[:4].tolist()  # the one observed field trains

    def test_backfill_zero_observed(self):
        """Zero observed fields -> all slots filled with distinct random
        allocated fields (num_random = min(F, num_fields))."""
        allocated = jnp.arange(32) < 20
        observed = jnp.zeros(32, bool)
        ids, valid = sampling.select_target_fields(
            jax.random.PRNGKey(7), observed, allocated, 8
        )
        assert bool(valid.all())
        ids_np = np.asarray(ids)
        assert len(set(ids_np.tolist())) == 8
        assert (ids_np < 20).all()

    def test_backfill_bounded_by_num_fields(self):
        """With observed ∪ random exhausted (num_fields < F), exactly
        num_fields distinct slots are valid (reference: num_random =
        min(num_missing, num_fields - num_observed))."""
        allocated = jnp.arange(16) < 6
        observed = jnp.zeros(16, bool).at[jnp.asarray([0, 1])].set(True)
        ids, valid = sampling.select_target_fields(
            jax.random.PRNGKey(9), observed, allocated, 8
        )
        assert int(valid.sum()) == 6
        chosen = np.asarray(ids)[np.asarray(valid)]
        assert len(set(chosen.tolist())) == 6
        assert (chosen < 6).all()

    def test_fewer_fields_than_requested(self):
        allocated = jnp.arange(16) < 3
        observed = jnp.zeros(16, bool)
        ids, valid = sampling.select_target_fields(
            jax.random.PRNGKey(3), observed, allocated, 8
        )
        assert int(valid.sum()) == 3
        assert (np.asarray(ids)[np.asarray(valid)] < 3).all()


class TestSampleTargetMV:
    def _setup(self):
        cam = make_camera()
        s, h, w = 4, cam.height, cam.width
        key = jax.random.PRNGKey(4)
        cache_rgb = jax.random.uniform(key, (s, h, w, 3)).astype(jnp.bfloat16)
        cache_depth = jnp.full((s, h, w), 3.0)
        # cameras on a circle looking at origin-ish: use identity + offsets
        cache_c2w = jnp.tile(jnp.eye(4), (s, 1, 1))
        cache_c2w = cache_c2w.at[:, 2, 3].set(jnp.asarray([2.0, 2.5, 3.0, 3.5]))
        cache_valid = jnp.asarray([True, True, True, False])
        positions = jnp.asarray([[0.0, 0.0, 0.0], [50.0, 50.0, 50.0]])
        field_ids = jnp.asarray([0, 1])
        field_valid = jnp.asarray([True, True])
        return cam, field_ids, field_valid, positions, cache_rgb, cache_depth, cache_c2w, cache_valid

    def test_visible_field_gets_rays(self):
        cam, fids, fval, pos, crgb, cdep, cc2w, cval = self._setup()
        t = sampling.sample_target_mv(
            jax.random.PRNGKey(5), cam, fids, fval, pos, crgb, cdep, cc2w, cval,
            field_radius=1.0, num_rays_per_field=16,
        )
        # field 0 at origin is in front of all cameras -> valid
        assert bool(t.field_valid[0])
        # field 1 far away is invisible -> masked out
        assert not bool(t.field_valid[1])
        # rays land inside the image
        assert int(t.ijs[..., 0].min()) >= 0 and int(t.ijs[..., 0].max()) < cam.height
        assert int(t.ijs[..., 1].min()) >= 0 and int(t.ijs[..., 1].max()) < cam.width
        # near/far bracket the field center distance (2..3.5 +- radius)
        nears = np.asarray(t.near_distances[0])
        fars = np.asarray(t.far_distances[0])
        assert (fars > nears).all()
        assert (nears >= 0).all()

    def test_invalid_slots_never_sampled(self):
        cam, fids, fval, pos, crgb, cdep, cc2w, cval = self._setup()
        t = sampling.sample_target_mv(
            jax.random.PRNGKey(6), cam, fids, fval, pos, crgb, cdep, cc2w, cval,
            field_radius=1.0, num_rays_per_field=64,
        )
        # targets for the valid field must use c2ws of valid slots only:
        # slot 3 has z-offset 3.5 and is invalid
        z_offsets = np.asarray(t.c2ws[0, :, 2, 3])
        assert not np.any(np.isclose(z_offsets, 3.5))

    def test_depth_mask_semantics(self):
        cam, fids, fval, pos, crgb, cdep, cc2w, cval = self._setup()
        t = sampling.sample_target_mv(
            jax.random.PRNGKey(7), cam, fids, fval, pos, crgb, cdep, cc2w, cval,
            field_radius=1.0, num_rays_per_field=32,
        )
        # gt distance 3.0-ish: depth mask requires near < gt < far
        dm = np.asarray(t.depth_mask[0])
        gt = np.asarray(t.gt_distances[0])
        near = np.asarray(t.near_distances[0])
        far = np.asarray(t.far_distances[0])
        expect = (gt > near) & (gt < far) & (gt != 0)
        np.testing.assert_array_equal(dm, expect)


class TestSampleTargetSV:
    def test_basic(self):
        cam = make_camera()
        h, w = cam.height, cam.width
        rgbd = jnp.concatenate(
            [jnp.full((h, w, 3), 0.5), jnp.full((h, w, 1), 2.0)], axis=-1
        )
        c2w = jnp.eye(4)
        positions = jnp.asarray([[0.0, 0.0, -2.0], [90.0, 0.0, 0.0]])
        active = jnp.asarray([True, True])
        t = sampling.sample_target_sv(
            jax.random.PRNGKey(8), cam, rgbd, c2w, positions, active,
            field_radius=1.0, num_train_fields=2, num_rays_per_field=8,
        )
        # field 0 (on the optical axis, opengl -z) intersects view rays
        valid_ids = set(np.asarray(t.field_ids)[np.asarray(t.field_valid)].tolist())
        assert 0 in valid_ids and 1 not in valid_ids

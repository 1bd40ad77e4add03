"""Tests for auxiliary utils: chunking, profiling, observability."""

import pytest

import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.utils import chunking, profiling
from neural_graph_mapping_tpu.utils.observability import (
    WandbLogger,
    prepare_dict_for_wandb,
)


class TestChunking:
    def test_batched_evaluation_matches_direct(self):
        f = lambda x: x * 2.0 + 1.0
        x = jnp.arange(103, dtype=jnp.float32).reshape(-1, 1)
        out = chunking.batched_evaluation(f, x, block_size=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(f(x)))

    def test_pass_offset(self):
        """pass_offset hands each block its start index (render blocks
        regenerate pixel ids from it)."""
        f = lambda x, off: x + float(off)
        x = jnp.zeros((10, 1))
        out = chunking.batched_evaluation(f, x, block_size=4, pass_offset=True)
        want = np.concatenate([np.zeros(4), np.full(4, 4.0), np.full(2, 8.0)])
        np.testing.assert_allclose(np.asarray(out)[:, 0], want)

    def test_tuple_outputs(self):
        f = lambda x: (x + 1.0, x.sum(axis=-1))
        x = jnp.ones((10, 3))
        a, b = chunking.batched_evaluation(f, x, block_size=4)
        assert a.shape == (10, 3) and b.shape == (10,)

    def test_save_image(self, tmp_path):
        img = jnp.ones((8, 8, 3)) * 0.5
        chunking.save_image(img, tmp_path / "x.png")
        assert (tmp_path / "x.png").is_file()


class TestProfiling:
    def test_benchmark_decorator_toggles(self, capsys):
        @profiling.benchmark
        def work():
            return jnp.ones(4).sum()

        profiling.benchmark.enabled = False
        work()
        assert "finished" not in capsys.readouterr().out
        profiling.benchmark.enabled = True
        work()
        assert "work finished" in capsys.readouterr().out
        profiling.benchmark.enabled = False

    def test_throughput_tracker(self):
        t = profiling.ThroughputTracker()
        t.add_frame(0.5)
        t.add_frame(0.5)
        assert abs(t.fps_estimate - 2.0) < 1e-9
        assert abs(t.spf_estimate - 0.5) < 1e-9


class TestObservability:
    def test_prepare_dict(self):
        d = {"a": np.float32(1.5), "b": {"c": np.int64(3)}, "d": "x"}
        out = prepare_dict_for_wandb(d)
        assert type(out["a"]) is float and type(out["b"]["c"]) is int

    def test_wandb_logger_degrades(self):
        # wandb is not installed in this image: must become a no-op
        wl = WandbLogger("test", {"a": 1})
        assert not wl.enabled
        wl.log({"x": 1.0})  # no crash
        wl.finish()


class TestFieldEditing:
    """Checkpoint field-pose editing with write-back (the headless analog of
    the reference's draggable Blender spheres, vis_blender.py:149-170)."""

    def _map(self):
        from neural_graph_mapping_tpu.mapping import map_state

        m = map_state.init_map_arrays(4)
        m = m._replace(
            positions=jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
            orientations=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (4, 1)),
        )
        return m

    def test_set_position(self):
        from neural_graph_mapping_tpu.vis.vis_checkpoint import edit_fields

        m = edit_fields(self._map(), [{"field_id": 1, "position": [9, 9, 9]}], 4)
        np.testing.assert_allclose(np.asarray(m.positions[1]), [9, 9, 9])
        np.testing.assert_allclose(np.asarray(m.positions[0]), [0, 1, 2])

    def test_translate_many(self):
        from neural_graph_mapping_tpu.vis.vis_checkpoint import edit_fields

        m = edit_fields(
            self._map(), [{"field_ids": [0, 2], "translate": [1, 0, 0]}], 4
        )
        np.testing.assert_allclose(np.asarray(m.positions[0]), [1, 1, 2])
        np.testing.assert_allclose(np.asarray(m.positions[2]), [7, 7, 8])
        np.testing.assert_allclose(np.asarray(m.positions[1]), [3, 4, 5])

    def test_rigid_transform_rotates_orientation(self):
        from neural_graph_mapping_tpu.vis.vis_checkpoint import edit_fields

        t = np.eye(4, dtype=np.float32)
        t[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]  # 90deg about z
        m = edit_fields(self._map(), [{"field_id": 0, "transform": t}], 4)
        np.testing.assert_allclose(np.asarray(m.positions[0]), [-1, 0, 2], atol=1e-6)
        q = np.asarray(m.orientations[0])
        s = np.sin(np.pi / 4)
        np.testing.assert_allclose(np.abs(q), [s, 0, 0, s], atol=1e-6)

    def test_out_of_range_rejected(self):
        from neural_graph_mapping_tpu.vis.vis_checkpoint import edit_fields

        with pytest.raises(ValueError):
            edit_fields(self._map(), [{"field_id": 7, "position": [0, 0, 0]}], 4)


class TestFramePrefetcher:
    class _DS:
        """Counts decodes; item is just the frame id."""

        def __init__(self):
            self.decodes = []

        def __getitem__(self, fid):
            self.decodes.append(fid)
            return {"fid": fid}

    def test_in_order_delivery(self):
        from neural_graph_mapping_tpu.utils.prefetch import FramePrefetcher

        ds = self._DS()
        ids = [0, 2, 3, 7]
        pf = FramePrefetcher(ds, ids, depth=2)
        for fid in ids:
            assert pf.get(fid)["fid"] == fid
        pf.close()
        assert ds.decodes == ids

    def test_mismatch_falls_back_to_sync(self):
        from neural_graph_mapping_tpu.utils.prefetch import FramePrefetcher

        ds = self._DS()
        pf = FramePrefetcher(ds, [0, 1], depth=2)
        # out-of-schedule id served synchronously, queue stays consistent
        assert pf.get(5)["fid"] == 5
        assert pf.get(0)["fid"] == 0
        assert pf.get(1)["fid"] == 1
        pf.close()

    def test_worker_exception_reraised(self):
        from neural_graph_mapping_tpu.utils.prefetch import FramePrefetcher

        class Boom:
            def __getitem__(self, fid):
                raise ValueError("decode failed")

        pf = FramePrefetcher(Boom(), [0], depth=1)
        with pytest.raises(ValueError, match="decode failed"):
            pf.get(0)
        pf.close()

    def test_close_stops_early_without_decoding_rest(self):
        """close() on an early abort must not decode the remaining sequence
        (ADVICE r4: stop flag checked before each decode)."""
        import threading
        import time

        from neural_graph_mapping_tpu.utils.prefetch import FramePrefetcher

        gate = threading.Event()

        class SlowDS:
            def __init__(self):
                self.decodes = []

            def __getitem__(self, fid):
                if fid > 0:
                    gate.wait(timeout=10.0)
                self.decodes.append(fid)
                return {"fid": fid}

        ds = SlowDS()
        pf = FramePrefetcher(ds, list(range(50)), depth=1)
        assert pf.get(0)["fid"] == 0
        t0 = time.monotonic()
        pf._stop.set()
        gate.set()  # release the in-flight decode only after stop is visible
        pf.close()
        assert time.monotonic() - t0 < 5.0
        # at most the in-flight items got decoded, not all 50
        assert len(ds.decodes) <= 4

"""Tests for auxiliary utils: chunking, profiling, observability."""

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

"""Capture a jax.profiler trace of the full training iteration and print the
top self-time ops (parsed from the perfetto trace JSON — see _traceutil)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from bench import build_engine
from neural_graph_mapping_tpu.mapping.engine import optimization_iterations_scan


def main():
    ds, ngm = build_engine()
    allocated = ngm._allocated_mask()
    cache_c2w = jnp.asarray(ngm._cache_c2w_np)
    cache_valid = jnp.asarray(ngm._cache_valid_np)

    def one_frame(params, adam, ti, key):
        return optimization_iterations_scan(
            ngm._fset, ngm._camera, ngm._rcfg, ngm._ocfg, ngm._loss_cfg,
            ngm._num_train_fields, ngm._num_iterations_per_frame,
            params, adam, ti,
            ngm._map_arrays.positions, ngm._map_arrays.orientations,
            allocated, ngm._observed_mask,
            ngm._cache_rgb, ngm._cache_depth, cache_c2w, cache_valid,
            key,
        )

    params, adam, ti = ngm._params, ngm._adam, ngm._map_arrays.training_iterations
    key = jax.random.PRNGKey(7)
    key, sub = jax.random.split(key)
    params, adam, ti, _ = one_frame(params, adam, ti, sub)
    jax.block_until_ready(params["w0"])

    trace_dir = "/tmp/jax_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            params, adam, ti, _ = one_frame(params, adam, ti, sub)
        jax.block_until_ready(params["w0"])

    from _traceutil import print_top_ops

    print_top_ops(trace_dir, n_iters=3)


if __name__ == "__main__":
    main()

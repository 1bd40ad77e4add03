"""Capture a jax.profiler trace of the full training iteration and print the
top self-time ops (parsed with tensorboard_plugin_profile, no UI needed)."""

import glob
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

    # parse the xplane proto into op stats
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    import json

    prof = json.loads(data) if isinstance(data, (str, bytes)) else data

    def walk(node, depth=0, out=None):
        out = [] if out is None else out
        m = node.get("metrics", {})
        out.append((m.get("time", 0.0), node.get("name", "?"), depth))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)
        return out

    root = prof.get("byProgram") or prof.get("byCategory") or {}
    rows = walk(root)
    rows.sort(reverse=True)
    for t, name, depth in rows[:60]:
        print(f"{t:10.6f}  {'  ' * depth}{name[:110]}")


if __name__ == "__main__":
    main()

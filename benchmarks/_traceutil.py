"""Parse a jax.profiler perfetto trace into per-op device self-times.

The tensorboard_plugin_profile parser is broken against the image's TF/protobuf
combination (Descriptors / xspace_to_tools_data mismatches), so we read the
`*.trace.json.gz` that jax.profiler writes alongside the xplane: plain chrome
trace-event JSON with complete ('X') events per device op.
"""

import collections
import glob
import gzip
import json


def device_op_times(trace_dir):
    """Return (total_us, [(us, count, name)]) for TPU-device ops, newest trace.

    Aggregates duration by op name across all complete events on device pids.
    """
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "GPU" in n}
    if not device_pids:  # CPU fallback (interpret runs)
        device_pids = set(pid_names)
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    rows = [(t, cnt[name], name) for name, t in agg.most_common()]
    return sum(agg.values()), rows


def print_top_ops(trace_dir, n_iters=1, top=40):
    total, rows = device_op_times(trace_dir)
    print(f"total device op time: {total / 1e3 / n_iters:.1f} ms per iter")
    for t, c, name in rows[:top]:
        print(f"{t / 1e3 / n_iters:9.2f} ms  x{c:6d}  {name[:100]}")

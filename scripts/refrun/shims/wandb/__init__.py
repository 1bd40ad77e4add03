"""No-op wandb shim for running the reference offline (run_mapping.py:1036-1049).

`init` returns a disabled run so the reference falls into its own
`run.disabled` branch and creates wandb/<run_name>/files itself.

The reference wraps this module's `log` with a function that calls
`wandb.log` (run_mapping.py:72-79) — with a no-op `log` that self-wrap
recurses infinitely, so the module ignores rebinds of `log`.
"""

import json
import os
import sys
import types


class _Module(types.ModuleType):
    def __setattr__(self, key, value):
        if key == "log":
            return
        super().__setattr__(key, value)


sys.modules[__name__].__class__ = _Module


class _Run:
    disabled = True
    dir = "wandb/offline/files"


run = _Run()


def init(*args, **kwargs):
    return run


def log(*args, **kwargs):
    # optional scalar capture for training-dynamics cross-checks: set
    # NGM_SHIM_WANDB_LOG=/path/file.jsonl to append every scalar dict the
    # reference logs (losses every log_iteration_freq iters)
    path = os.environ.get("NGM_SHIM_WANDB_LOG")
    if path and args and isinstance(args[0], dict):
        row = {
            k: float(v)
            for k, v in args[0].items()
            if isinstance(v, (int, float)) or hasattr(v, "item")
        }
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    return None


class Image:  # reference may wrap figures; keep attribute access harmless
    def __init__(self, *a, **k):
        pass

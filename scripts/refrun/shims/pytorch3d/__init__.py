"""Pure-torch CPU shim of the pytorch3d APIs the reference uses.

Only for running the reference implementation on CPU as a quality
cross-check (scripts/refrun/run_reference.py); see shims/README.md.
"""
from . import ops, io, transforms  # noqa: F401

"""trimesh import-only stub (mesh eval is not exercised in the CPU
cross-check; anything actually called raises)."""


def __getattr__(name):
    raise NotImplementedError(f"trimesh shim: {name} not available in the CPU cross-check")

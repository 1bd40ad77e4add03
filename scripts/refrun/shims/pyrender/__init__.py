"""pyrender import-only stub (mesh culling is not exercised in the CPU
cross-check; anything actually called raises)."""


def __getattr__(name):
    raise NotImplementedError(
        f"pyrender shim: {name} not available in the CPU cross-check"
    )

from . import lpip  # noqa: F401

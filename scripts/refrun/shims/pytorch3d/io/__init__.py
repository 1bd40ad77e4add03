from . import ply_io  # noqa: F401

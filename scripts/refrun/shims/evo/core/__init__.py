from . import trajectory  # noqa: F401

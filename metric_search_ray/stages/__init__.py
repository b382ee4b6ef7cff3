from . import assign, decode  # noqa: F401

from . import codec, decode  # noqa: F401

from .stream import StreamingCDC  # noqa: F401

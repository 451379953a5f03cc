from .stateful import sessionize  # noqa: F401
from .stream import StreamingCDC  # noqa: F401

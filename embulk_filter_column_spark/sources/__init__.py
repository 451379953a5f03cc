from .events import web_change_events, write_wal  # noqa: F401
from .files import read_embulk_file, strftime_to_java  # noqa: F401

from .events import web_change_events, write_wal  # noqa: F401

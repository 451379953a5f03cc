from .checkpoint import Checkpoint  # noqa: F401
from .dedup import (  # noqa: F401
    hot_keys,
    last_writer_wins,
    salted_last_writer_wins,
)
from .lake import LakeTable  # noqa: F401
from .pipeline import CDCPipeline  # noqa: F401
from .sink import IcebergSink, Sink  # noqa: F401
from .wal import WalReader  # noqa: F401

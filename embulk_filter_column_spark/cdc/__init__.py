from .checkpoint import Checkpoint  # noqa: F401
from .dedup import last_writer_wins  # noqa: F401
from .lake import LakeTable  # noqa: F401
from .pipeline import CDCPipeline  # noqa: F401
from .wal import WalReader  # noqa: F401

from aqp_tpu.utils.timing import (
    PhaseTimer,
    Timings,
    ensure_platform_from_env,
    hard_sync,
)
from aqp_tpu.utils.logging import get_logger

__all__ = [
    "PhaseTimer",
    "Timings",
    "get_logger",
    "hard_sync",
    "ensure_platform_from_env",
]

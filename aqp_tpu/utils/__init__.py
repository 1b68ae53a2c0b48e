from aqp_tpu.utils.timing import PhaseTimer, Timings
from aqp_tpu.utils.logging import get_logger

__all__ = ["PhaseTimer", "Timings", "get_logger"]

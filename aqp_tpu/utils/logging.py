"""Leveled, colored, seconds-since-start logger.

Analog of lib/Logger/src/Logger.cpp:41-76 (rdtscp-relative timestamps, level
colors) without the enclave print OCALL indirection.
"""

from __future__ import annotations

import logging
import sys
import time

_START = time.perf_counter()
_COLORS = {"DEBUG": "\033[36m", "INFO": "\033[32m", "WARNING": "\033[33m", "ERROR": "\033[31m"}
_RESET = "\033[0m"


class _RelativeFormatter(logging.Formatter):
    def format(self, record):
        rel = time.perf_counter() - _START
        color = _COLORS.get(record.levelname, "") if sys.stderr.isatty() else ""
        reset = _RESET if color else ""
        return f"{color}[{rel:10.6f}] {record.levelname:7s}{reset} {record.getMessage()}"


def get_logger(name: str = "aqp_tpu", level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(_RelativeFormatter())
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    return logger

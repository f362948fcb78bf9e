"""Structured logging for audiotoken_tpu.

Reference analog: /root/reference/audiotoken/logger.py:7-32 (rotating file
handler + stderr console). Differences: handlers are installed once per
process (the reference re-created them on every call), and the log directory
is configurable via AUDIOTOKEN_LOG_DIR instead of a hardcoded ``logs/``.
"""

import logging
import os
import sys
from logging.handlers import RotatingFileHandler
from typing import Optional

_FORMAT = (
    "%(asctime)s | %(processName)s | %(levelname)-8s | "
    "%(filename)s:%(lineno)d | %(message)s"
)


def get_logger(
    name: str,
    log_file: Optional[str] = None,
    level: str = "WARNING",
) -> logging.Logger:
    """Return a logger with a stderr handler (and optional rotating file)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)

    if getattr(logger, "_audiotoken_configured", False):
        return logger

    formatter = logging.Formatter(_FORMAT, datefmt="%Y-%m-%d %H:%M:%S")

    if log_file:
        log_dir = os.environ.get("AUDIOTOKEN_LOG_DIR", "logs")
        os.makedirs(log_dir, exist_ok=True)
        file_handler = RotatingFileHandler(
            os.path.join(log_dir, log_file),
            maxBytes=10 * 1024 * 1024,
            backupCount=5,
        )
        file_handler.setLevel(logging.INFO)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)

    console = logging.StreamHandler(sys.stderr)
    console.setLevel(getattr(logging, level.upper(), logging.WARNING))
    console.setFormatter(formatter)
    logger.addHandler(console)
    logger.propagate = False
    logger._audiotoken_configured = True  # type: ignore[attr-defined]

    return logger

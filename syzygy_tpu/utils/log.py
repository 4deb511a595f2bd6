"""Engine logging: console + ``Syzygy.log`` file sink.

Mirrors ``Logger::initLogging`` (``core/log.cpp:16-35``): two sinks, flushed
per message (``delay=False`` + flush-on-emit), level set at init.
"""

from __future__ import annotations

import logging


class _FlushingFileHandler(logging.FileHandler):
    def emit(self, record):
        super().emit(record)
        self.flush()


def init_logging(
    level: int = logging.INFO, log_file: str = "Syzygy.log"
) -> logging.Logger:
    """Initialize the engine logger; returns the 'syzygy' logger."""
    logger = logging.getLogger("syzygy")
    logger.setLevel(level)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    try:
        file_handler = _FlushingFileHandler(log_file)
        file_handler.setFormatter(fmt)
        logger.addHandler(file_handler)
    except OSError:
        logger.warning("could not open %s for logging", log_file)
    return logger

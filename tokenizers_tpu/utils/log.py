"""Logging init from the ``TOKENIZERS_LOG`` env var (reference: the Python
binding initializes env_logger from TOKENIZERS_LOG,
`bindings/python/src/lib.rs:63`).

Levels accepted: trace/debug/info/warn/error (env_logger spellings).
``trace`` maps to DEBUG with a dedicated 5-level below DEBUG.

Loggers used across the package:
  tokenizers_tpu.engine  — device-engine build decisions (why a pipeline
                            did or did not compile to the TPU path)
  tokenizers_tpu.model   — vocab-hole warnings etc. (`models/mod.rs:54`)
  tokenizers_tpu.perf    — per-stage throughput counters
"""

from __future__ import annotations

import logging
import os

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_LEVELS = {
    "trace": TRACE,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "off": logging.CRITICAL + 10,
}

_initialized = False


def init_from_env() -> None:
    """Configure the package logger once, from TOKENIZERS_LOG."""
    global _initialized
    if _initialized:
        return
    _initialized = True
    spec = os.environ.get("TOKENIZERS_LOG")
    logger = logging.getLogger("tokenizers_tpu")
    if spec is None:
        # mirror env_logger's default: errors only, no handler spam
        logger.addHandler(logging.NullHandler())
        return
    level = _LEVELS.get(spec.strip().lower(), logging.INFO)
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("[%(levelname)s %(name)s] %(message)s")
    )
    logger.addHandler(handler)
    logger.setLevel(level)


def get_logger(name: str) -> logging.Logger:
    init_from_env()
    return logging.getLogger(f"tokenizers_tpu.{name}")

"""Rank-aware logging (utils/general.py:46-53 role).

On multi-host runs only process 0 emits INFO-level logs; other hosts log
warnings and errors. ``colorstr`` gives the reference's ANSI highlighting
(general.py:472-494 role) for terminals that support it.
"""

from __future__ import annotations

import logging
import sys

_ANSI = {
    "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
    "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
    "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
    "end": "\033[0m",
}


def colorstr(*args) -> str:
    """colorstr('blue', 'bold', 'text') -> ANSI-wrapped text."""
    *styles, text = args if len(args) > 1 else ("blue", "bold", args[0])
    return "".join(_ANSI.get(s, "") for s in styles) + str(text) + _ANSI["end"]


def _rank() -> int:
    """Process rank WITHOUT initializing the JAX backend.

    Calling ``jax.process_index()`` at import time would pick the default
    backend (the pinned axon TPU: ~50 s init) before any CLI can run
    ``setup_platform('--platform cpu')`` — so rank is resolved lazily and
    only once a backend already exists; pre-init records assume rank 0
    (multi-host runs log after distributed init anyway)."""
    try:
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            return 0
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover
        return 0


class _RankFilter(logging.Filter):
    """Only rank 0 emits sub-WARNING records (DistributedSampler-era
    rank-aware logging, general.py:46-53 role)."""

    def filter(self, record: logging.LogRecord) -> bool:
        return record.levelno >= logging.WARNING or _rank() == 0


def get_logger(name: str = "podtpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.addFilter(_RankFilter())
    logger.propagate = False
    return logger


LOGGER = get_logger()

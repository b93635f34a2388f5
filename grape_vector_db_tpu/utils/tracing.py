"""Tracing / profiling hooks (reference SURVEY.md §5: tracing + QueryTimer ->
'structured host logging + JAX profiler traces hooked at the same points').

- ``setup_logging``: structured host logging (the analog of the reference's
  tracing-subscriber env-filter init, examples/embedded_mode_simple.rs:12-14);
  level from $GRAPE_LOG (error|warn|info|debug|trace).
- ``trace_span``: context manager that both logs span duration and annotates
  the JAX profiler timeline (xplane) when a capture is active.
- ``profile_to``: capture a JAX profiler trace directory around a block —
  viewable in TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator, Optional

import jax

__all__ = ["setup_logging", "trace_span", "profile_to", "logger"]

logger = logging.getLogger("grape_vector_db_tpu")

_LEVELS = {"error": logging.ERROR, "warn": logging.WARNING, "info": logging.INFO,
           "debug": logging.DEBUG, "trace": logging.DEBUG}


def setup_logging(level: Optional[str] = None) -> logging.Logger:
    level = level or os.environ.get("GRAPE_LOG", "info")
    logging.basicConfig(
        format="%(asctime)s %(levelname)-7s %(name)s %(message)s",
        datefmt="%H:%M:%S",
    )
    logger.setLevel(_LEVELS.get(level.lower(), logging.INFO))
    return logger


@contextlib.contextmanager
def trace_span(name: str, log_threshold_ms: float = 0.0) -> Iterator[None]:
    """Annotate the profiler timeline + log the span's wall time."""
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        ms = (time.perf_counter() - t0) * 1e3
        if ms >= log_threshold_ms:
            logger.debug("span %s took %.2f ms", name, ms)


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a JAX profiler trace (xplane) for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)

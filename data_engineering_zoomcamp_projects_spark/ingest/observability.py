"""Pipeline observability (SURVEY.md §2 A20/A21).

Fresh implementation of the reference's logging/metering ideas
(reference citibike_project/tests/safe_run.py:8-24 decorator,
tests/logger_factory.py:4-20 logger factory, etl/ingest_data.py:173-182
per-chunk wall-clock timing) — pure driver-side Python, Spark-agnostic."""

from __future__ import annotations

import functools
import logging
import time
from contextlib import contextmanager
from typing import Any, Callable

_FORMAT = "%(asctime)s %(levelname)s %(name)s :: %(message)s"


def make_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


def guarded_stage(
    logger: logging.Logger | None = None,
) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Decorator logging start/success/failure of a pipeline stage and
    re-raising on error (the reference's @safe_run contract)."""

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        log = logger or make_logger(fn.__module__)

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            log.info("stage %s: start", fn.__name__)
            t0 = time.perf_counter()
            try:
                result = fn(*args, **kwargs)
            except Exception:
                log.exception(
                    "stage %s: FAILED after %.3fs", fn.__name__, time.perf_counter() - t0
                )
                raise
            log.info("stage %s: ok in %.3fs", fn.__name__, time.perf_counter() - t0)
            return result

        return wrapper

    return deco


@contextmanager
def stopwatch(label: str, sink: dict[str, float] | None = None):
    """Wall-clock metering around an action (reference A20 timed each
    to_sql chunk); optionally records into `sink`."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - t0
        if sink is not None:
            sink[label] = elapsed


def observed(df, name: str, *metric_cols):
    """Attach in-flight metrics to a DataFrame via ``df.observe``: the
    metrics are computed DURING the job that consumes `df` (no second
    scan — the difference from running a separate count()). Returns
    (observed_df, Observation); read ``obs.get`` after an action.

    The pipeline-observability pattern at scale: row counts / null
    counts / value sums ride along the existing shuffle-free pass, so
    a 100 TB load gets its data-quality counters for free.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metric_cols), obs

"""Retry with exponential backoff for ingest fetches.

The reference wraps every BrightSky HTTP GET in tenacity —
``@retry(stop=stop_after_attempt(3), wait=wait_exponential(multiplier=1,
min=2, max=10))`` (reference ``src/ingestion/brightsky_client.py:31-35``) —
so any transient 5xx/timeout is absorbed before a row is lost. tenacity is
not installed here, so this module is a dependency-free equivalent with the
same wait schedule: attempt *i* (0-based) sleeps
``clamp(multiplier * 2**i, min_wait, max_wait)`` seconds before retrying,
and the final failure re-raises the original exception.

Two placements, matching where fetches actually run in this engine:

- **driver-side** (the reference's shape): decorate any fetch callable with
  :func:`with_retry` before looping locations/dates on the driver.
- **per-partition** (the Spark-native shape): the
  ``brightsky_fixture`` Data Source wraps each partition's fetch in
  :func:`retry_call`, so on a 1000-executor cluster every (station, day)
  task retries independently — a transient failure re-fetches one
  partition, not the whole batch.
"""

from __future__ import annotations

import functools
import time
from collections.abc import Callable
from typing import Any, TypeVar

T = TypeVar("T")

DEFAULT_ATTEMPTS = 3
DEFAULT_MULTIPLIER = 1.0
DEFAULT_MIN_WAIT = 2.0
DEFAULT_MAX_WAIT = 10.0


def backoff_schedule(
    attempts: int = DEFAULT_ATTEMPTS,
    multiplier: float = DEFAULT_MULTIPLIER,
    min_wait: float = DEFAULT_MIN_WAIT,
    max_wait: float = DEFAULT_MAX_WAIT,
) -> list[float]:
    """Sleep (seconds) before each retry — ``attempts - 1`` entries.

    Mirrors tenacity's ``wait_exponential(multiplier, min, max)``:
    2, 2, 4, 8, 10, 10, … for the defaults."""
    return [
        min(max_wait, max(min_wait, multiplier * (2.0**i)))
        for i in range(max(attempts - 1, 0))
    ]


def retry_call(
    fn: Callable[..., T],
    *args: Any,
    attempts: int = DEFAULT_ATTEMPTS,
    multiplier: float = DEFAULT_MULTIPLIER,
    min_wait: float = DEFAULT_MIN_WAIT,
    max_wait: float = DEFAULT_MAX_WAIT,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    **kwargs: Any,
) -> T:
    """Call ``fn(*args, **kwargs)``; on ``retry_on`` retry up to
    ``attempts`` total tries with exponential backoff, then re-raise the
    last exception. ``sleep`` is injectable so tests run instantly."""
    waits = backoff_schedule(attempts, multiplier, min_wait, max_wait)
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except retry_on:
            if i >= attempts - 1:
                raise
            sleep(waits[i])
    raise AssertionError("unreachable")  # attempts >= 1 always returns/raises


def with_retry(
    attempts: int = DEFAULT_ATTEMPTS,
    multiplier: float = DEFAULT_MULTIPLIER,
    min_wait: float = DEFAULT_MIN_WAIT,
    max_wait: float = DEFAULT_MAX_WAIT,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Decorator form of :func:`retry_call` — the drop-in stand-in for the
    reference's ``@retry(stop=stop_after_attempt(3), wait=wait_exponential(
    multiplier=1, min=2, max=10))``."""

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapped(*args: Any, **kwargs: Any) -> T:
            return retry_call(
                fn,
                *args,
                attempts=attempts,
                multiplier=multiplier,
                min_wait=min_wait,
                max_wait=max_wait,
                retry_on=retry_on,
                sleep=sleep,
                **kwargs,
            )

        return wrapped

    return deco

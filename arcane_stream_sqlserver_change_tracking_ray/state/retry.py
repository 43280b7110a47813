"""Merge/commit retry policy (F5, SURVEY.md §2.7).

Mirrors the reference's merge-query retry contract (CRD
``crd-microsoft-sql-server-stream.yaml:181-211``; ``docs/crd.md:97-105``;
``dev.env.example:81-94``): bounded exponential backoff
``base * scaleFactor^attempt`` with ``maxAttempts``, gated by a mode
(``never`` | ``always`` | ``backfillOnly``) and optional exception-
message substring filters (``queryRetryOnMessageContents`` — e.g.
``"No worker nodes available"``, ``"Query killed"``).

Ray task retries already cover worker loss; this wrapper covers the
driver-side side-effecting steps (flush, manifest commit, filesystem
ops) where a transient FS/object-store error would otherwise kill the
cycle.  Non-transient control-flow errors (CAS conflicts, the watermark
gate) are never retried — a conflict means another writer won and the
cycle must re-plan, not re-commit.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Callable, TypeVar

from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    CommitConflictError,
    InvalidWatermarkError,
)

logger = logging.getLogger("arcane_ray.retry")

T = TypeVar("T")

#: error types that are control flow, not transience — never retried
NON_RETRYABLE = (CommitConflictError, InvalidWatermarkError, ValueError, TypeError)


@dataclass(frozen=True)
class RetryPolicy:
    #: never | always | backfillOnly (reference queryRetryMode)
    mode: str = "never"
    #: seconds; reference queryRetryBaseDuration ("1 second")
    base_duration: float = 1.0
    #: reference queryRetryScaleFactor
    scale_factor: float = 3.0
    #: total attempts including the first (reference queryRetryMaxAttempts)
    max_attempts: int = 3
    #: retry only when the exception message contains one of these
    #: substrings; empty = retry any retryable error
    #: (reference queryRetryOnMessageContents)
    on_message_contents: tuple[str, ...] = ()

    def __post_init__(self):
        if self.mode not in ("never", "always", "backfillOnly"):
            raise ValueError(
                f"unknown retry mode: {self.mode!r} "
                "(expected 'never', 'always' or 'backfillOnly')"
            )

    @classmethod
    def from_sink(cls, sink) -> "RetryPolicy":
        return cls(
            mode=sink.query_retry_mode,
            base_duration=sink.query_retry_base_duration,
            scale_factor=sink.query_retry_scale_factor,
            max_attempts=sink.query_retry_max_attempts,
            on_message_contents=tuple(sink.query_retry_on_message_contents),
        )

    # ------------------------------------------------------------------
    def active(self, backfill: bool = False) -> bool:
        if self.mode == "always":
            return True
        if self.mode == "backfillOnly":
            return backfill
        return False

    def matches(self, exc: BaseException) -> bool:
        if isinstance(exc, NON_RETRYABLE):
            return False
        if not self.on_message_contents:
            return True
        msg = str(exc)
        return any(s in msg for s in self.on_message_contents)

    def delay(self, attempt: int) -> float:
        """Backoff before retry *attempt* (1-based): base * scale^(a-1)."""
        return self.base_duration * (self.scale_factor ** (attempt - 1))

    def call(
        self,
        fn: Callable[..., T],
        *args,
        backfill: bool = False,
        sleep: Callable[[float], None] = time.sleep,
        **kwargs,
    ) -> T:
        """Run *fn*, retrying matching failures per the policy."""
        if not self.active(backfill):
            return fn(*args, **kwargs)
        attempt = 0
        while True:
            try:
                return fn(*args, **kwargs)
            except BaseException as exc:  # noqa: BLE001 — filtered below
                attempt += 1
                if attempt >= self.max_attempts or not self.matches(exc):
                    raise
                d = self.delay(attempt)
                logger.warning(
                    "retryable failure in %s (attempt %d/%d, backing off %.2fs): %s",
                    getattr(fn, "__name__", fn), attempt, self.max_attempts, d, exc,
                )
                sleep(d)

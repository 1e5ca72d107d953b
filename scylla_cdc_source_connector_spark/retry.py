"""Transient-error retry with exponential backoff + jitter (SURVEY K6).

Reference: ScyllaStreamingChangeEventSource.java:137-290 retries transient
CQL errors with backoff from `worker.retry.backoff.base` (50 ms) doubling
to `worker.retry.backoff.cap` (30 000 ms), subtractive jitter up to 20%
(`worker.retry.backoff.jitter.percentage`), max `worker.retry.attempts`
(20; -1 = unlimited), walking the full cause chain to classify
(ScyllaConnectorConfig.java:369-423,756-761).

Spark's task retries (spark.task.maxFailures) + restart-from-checkpoint
cover executor-side transience; this utility covers DRIVER-side sink I/O
(lineage commits, catalog calls) where a naked exception would kill the
streaming query.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class RetryPolicy:
    """Defaults mirror the reference's (ScyllaConnectorConfig.java:369-423)."""

    base_ms: int = 50
    cap_ms: int = 30_000
    jitter_pct: int = 20
    max_attempts: int = 20  # -1 = unlimited

    def backoff_ms(self, attempt: int, rng: random.Random) -> int:
        """Backoff before retry `attempt` (1-based): base × 2^(attempt-1)
        capped, minus up to jitter_pct% (subtractive jitter — the reference
        subtracts, never adds, so the cap is a hard bound)."""
        raw = min(self.base_ms * (2 ** (attempt - 1)), self.cap_ms)
        jitter = rng.uniform(0, self.jitter_pct / 100.0)
        return int(raw * (1 - jitter))


def _default_transient(exc: BaseException) -> bool:
    """Cause-chain walk (the reference unwraps wrapped/shaded causes,
    ScyllaStreamingChangeEventSource.java:200-255): OS-level I/O hiccups
    are transient; programming errors are not."""
    seen = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        if isinstance(e, (OSError, TimeoutError, ConnectionError)):
            return True
        e = e.__cause__ or e.__context__
    return False


def with_retries(
    fn: Callable,
    *,
    policy: RetryPolicy = RetryPolicy(),
    is_transient: Callable[[BaseException], bool] = _default_transient,
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
):
    """Run fn(); on transient failure, back off and retry up to
    policy.max_attempts.  Non-transient errors and exhausted attempts
    re-raise the last error."""
    rng = rng or random.Random()
    attempt = 0
    while True:
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — classification decides
            attempt += 1
            exhausted = (
                policy.max_attempts >= 0 and attempt >= policy.max_attempts
            )
            if not is_transient(e) or exhausted:
                raise
            sleep(policy.backoff_ms(attempt, rng) / 1000.0)

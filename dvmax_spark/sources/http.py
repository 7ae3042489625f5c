"""HTTP transport with the reference's resilience semantics
(`fetcher/base.py:16-114`): bounded retries with exponential backoff +
jitter capped at 30s, Retry-After honored, 404 -> empty result, typed
errors. The transport callable is injectable so tests (and the batch
runners) never touch the network.

At cluster scale the same policy object rides inside mapInPandas
partition fetchers (one token-bucket per partition) — the policy is
pure data, safe to pickle into tasks.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Any, Callable


class HttpError(Exception):
    """Typed transport error carrying the status code."""

    def __init__(self, status: int, message: str = "") -> None:
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


@dataclass(frozen=True)
class RetryPolicy:
    max_retries: int = 3
    base_backoff: float = 1.5
    backoff_cap: float = 30.0
    jitter: float = 0.25
    retry_statuses: tuple[int, ...] = (429, 500, 502, 503, 504)

    def backoff(self, attempt: int, retry_after: float | None = None) -> float:
        if retry_after is not None:
            return min(float(retry_after), self.backoff_cap)
        raw = self.base_backoff**attempt + random.uniform(0, self.jitter)
        return min(raw, self.backoff_cap)


class HttpClient:
    """fetch(url) -> decoded JSON (or None for 404-as-empty).

    ``transport(url, timeout)`` returns (status, payload, retry_after);
    inject a fake in tests, wire `requests` in production.
    """

    def __init__(
        self,
        transport: Callable[[str, float], tuple[int, Any, float | None]],
        policy: RetryPolicy = RetryPolicy(),
        timeout: float = 30.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.transport = transport
        self.policy = policy
        self.timeout = timeout
        self.sleep = sleep

    def fetch(self, url: str) -> Any:
        last: HttpError | None = None
        for attempt in range(self.policy.max_retries + 1):
            status, payload, retry_after = self.transport(url, self.timeout)
            if status == 200:
                return payload
            if status == 404:
                return None  # 404 -> empty (base.py 404 handling)
            last = HttpError(status, str(payload)[:200])
            if status not in self.policy.retry_statuses or attempt == self.policy.max_retries:
                raise last
            self.sleep(self.policy.backoff(attempt + 1, retry_after))
        raise last  # pragma: no cover

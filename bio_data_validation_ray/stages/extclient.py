"""Rate-limited external-lookup client for ``EnrichStage`` fallbacks.

The reference's networked enrichment clients enforce a per-process request
rate (3 req/s without an API key, 10 req/s with one —
bio_lookups.py:54-61), exponential-backoff retries on failure/429
(bio_lookups.py:91-129), and OR-batch keys ~50 per request
(bio_lookups.py:679-681). This engine is no-network by design, so the
HTTP call is an injected callable — but the CLIENT DISCIPLINE (token
bucket, backoff, batching) is the part a user wiring a real API needs,
and it lives here, composable as ``EnrichStage``'s ``fallback``.

Clock and sleep are injectable so tests pin the timing math exactly; the
defaults are monotonic wall time. One client instance belongs to one
actor (construct it in the stage's ``__init__``): the token bucket is a
per-process limit, mirroring the reference's per-client session.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Iterable

import pandas as pd

logger = logging.getLogger(__name__)


class TokenBucketLimiter:
    """Token bucket: ``rate_per_s`` sustained, ``burst`` tokens of slack.

    ``acquire()`` blocks (via the injected ``sleep``) until a token is
    available, then consumes it. With burst=1 this degenerates to the
    reference's min-interval pacing (bio_lookups.py:81-90: sleep until
    1/rate since the last request)."""

    def __init__(self, rate_per_s: float, burst: int = 1, *,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        if rate_per_s <= 0:
            raise ValueError("rate_per_s must be > 0")
        self.rate = float(rate_per_s)
        self.capacity = max(1, int(burst))
        self._clock, self._sleep = clock, sleep
        self._tokens = float(self.capacity)
        self._last = clock()

    def _refill(self) -> None:
        now = self._clock()
        self._tokens = min(self.capacity,
                           self._tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self) -> None:
        self._refill()
        if self._tokens < 1.0:
            self._sleep((1.0 - self._tokens) / self.rate)
            self._refill()
            # injected clocks may under-advance; never go negative
            self._tokens = max(self._tokens, 1.0)
        self._tokens -= 1.0


class RateLimitedClient:
    """Batched, rate-limited, retrying lookup around a user ``fetch``.

    ``fetch(keys: list) -> DataFrame`` performs one remote request for up
    to ``batch_size`` keys (the reference OR-joins 50 gene symbols per
    NCBI query, bio_lookups.py:679-681) and returns one row per resolved
    key. A raising or None-returning fetch is retried ``max_retries``
    times with exponential backoff 2^attempt seconds (bio_lookups.py:
    91-129); keys of a chunk that never succeeds are dropped from the
    result — ``EnrichStage`` then marks them ``miss``, the degraded-mode
    analog of the reference waterfall.

    The instance is itself a valid ``EnrichStage`` fallback::

        client = RateLimitedClient(fetch=my_api_call, rate_per_s=3)
        EnrichStage(..., fallback=client)
    """

    def __init__(self, fetch: Callable[[list], pd.DataFrame | None], *,
                 rate_per_s: float = 3.0, burst: int = 1,
                 batch_size: int = 50, max_retries: int = 3,
                 backoff_base: float = 2.0,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self.fetch = fetch
        self.batch_size = int(batch_size)
        self.max_retries = int(max_retries)
        self.backoff_base = float(backoff_base)
        self._sleep = sleep
        self.limiter = TokenBucketLimiter(rate_per_s, burst,
                                          clock=clock, sleep=sleep)
        self.stats = {"requests": 0, "retries": 0, "failed_chunks": 0}

    def _fetch_chunk(self, chunk: list) -> pd.DataFrame | None:
        for attempt in range(self.max_retries):
            self.limiter.acquire()
            self.stats["requests"] += 1
            try:
                out = self.fetch(chunk)
            except Exception as ex:  # noqa: BLE001 — remote errors retry
                logger.warning("extclient fetch error (attempt %d/%d): %s",
                               attempt + 1, self.max_retries, ex)
                out = None
            if out is not None:
                return out
            if attempt < self.max_retries - 1:
                self.stats["retries"] += 1
                self._sleep(self.backoff_base ** attempt)
        self.stats["failed_chunks"] += 1
        return None

    def lookup(self, keys: Iterable) -> pd.DataFrame:
        """Resolve the DEDUPLICATED keys in ``batch_size`` chunks; returns
        the concatenated fetch results (possibly missing keys whose chunk
        exhausted its retries — never raises for remote failure)."""
        uniq = pd.Series(list(keys)).drop_duplicates().tolist()
        frames = []
        for i in range(0, len(uniq), self.batch_size):
            out = self._fetch_chunk(uniq[i:i + self.batch_size])
            if out is not None and len(out):
                frames.append(out)
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    # EnrichStage fallback protocol: fallback(keys: Series) -> DataFrame
    def __call__(self, keys: pd.Series) -> pd.DataFrame:
        return self.lookup(keys)

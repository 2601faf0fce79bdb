"""Rate-limited external-client utility (stages/extclient.py): token
bucket pacing, exponential backoff, K-key batching, EnrichStage fallback
integration — the reference's client discipline (bio_lookups.py:54-129,
679-681) with the HTTP call injected."""
import pandas as pd
import pytest

from bio_data_validation_ray.stages.extclient import (
    RateLimitedClient,
    TokenBucketLimiter,
)


class FakeTime:
    """Deterministic clock: sleep() advances the clock exactly."""

    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        assert s >= 0
        self.sleeps.append(round(s, 9))
        self.t += s


class TestTokenBucket:
    def test_paces_to_rate(self):
        ft = FakeTime()
        lim = TokenBucketLimiter(2.0, clock=ft.clock, sleep=ft.sleep)
        for _ in range(5):
            lim.acquire()
        # first token free (full bucket), each further one waits 0.5 s
        assert ft.t == pytest.approx(2.0)
        assert len(ft.sleeps) == 4
        assert all(s == pytest.approx(0.5) for s in ft.sleeps)

    def test_burst_tokens_are_free_then_pacing_resumes(self):
        ft = FakeTime()
        lim = TokenBucketLimiter(10.0, burst=3, clock=ft.clock,
                                 sleep=ft.sleep)
        for _ in range(3):
            lim.acquire()
        assert ft.t == 0.0  # burst is free
        lim.acquire()
        assert ft.t == pytest.approx(0.1)

    def test_idle_time_refills(self):
        ft = FakeTime()
        lim = TokenBucketLimiter(1.0, clock=ft.clock, sleep=ft.sleep)
        lim.acquire()
        ft.t += 10.0  # idle — but capacity 1 caps the refill
        lim.acquire()
        assert ft.sleeps == []  # refilled, no wait
        lim.acquire()
        assert ft.sleeps == [pytest.approx(1.0)]

    def test_rejects_nonpositive_rate(self):
        with pytest.raises(ValueError):
            TokenBucketLimiter(0.0)


class TestRateLimitedClient:
    def test_batches_and_dedupes_keys(self):
        ft = FakeTime()
        calls = []

        def fetch(keys):
            calls.append(list(keys))
            return pd.DataFrame({"k": keys, "v": [f"v{k}" for k in keys]})

        cli = RateLimitedClient(fetch, rate_per_s=1000.0, batch_size=50,
                                clock=ft.clock, sleep=ft.sleep)
        out = cli.lookup(list(range(120)) + [0, 1, 2])  # dups collapse
        assert [len(c) for c in calls] == [50, 50, 20]
        assert len(out) == 120
        assert cli.stats["requests"] == 3

    def test_exponential_backoff_then_success(self):
        ft = FakeTime()
        attempts = []

        def fetch(keys):
            attempts.append(ft.t)
            if len(attempts) < 3:
                raise ConnectionError("boom")
            return pd.DataFrame({"k": keys})

        cli = RateLimitedClient(fetch, rate_per_s=1000.0, max_retries=3,
                                backoff_base=2.0, clock=ft.clock,
                                sleep=ft.sleep)
        out = cli.lookup([1, 2])
        assert len(out) == 2
        # backoff sleeps 2^0 then 2^1 (limiter waits are ~0.001)
        big = [s for s in ft.sleeps if s >= 1.0]
        assert big == [pytest.approx(1.0), pytest.approx(2.0)]
        assert cli.stats["retries"] == 2

    def test_exhausted_retries_drop_chunk_not_raise(self):
        ft = FakeTime()

        def fetch(keys):
            return None  # permanent failure

        cli = RateLimitedClient(fetch, rate_per_s=1000.0, max_retries=2,
                                clock=ft.clock, sleep=ft.sleep)
        out = cli.lookup([1, 2, 3])
        assert len(out) == 0
        assert cli.stats["failed_chunks"] == 1
        assert cli.stats["requests"] == 2

    def test_as_enrich_stage_fallback(self, ray_session):
        """End to end: keys missing from the reference resolve through the
        rate-limited client and get status 'fallback'; keys the client
        cannot resolve stay 'miss'. cust_enrich semantics untouched."""
        import ray.data as rd

        from bio_data_validation_ray.stages.enrich import EnrichStage

        ref = pd.DataFrame({"k": [1, 2], "seg": ["a", "b"]})

        def fetch(keys):
            known = [k for k in keys if k in (3, 4)]
            if not known:
                return pd.DataFrame({"k": [], "seg": []})
            return pd.DataFrame({"k": known,
                                 "seg": [f"ext{k}" for k in known]})

        ft = FakeTime()
        cli = RateLimitedClient(fetch, rate_per_s=1000.0,
                                clock=ft.clock, sleep=ft.sleep)
        stage = EnrichStage(key_col="k", ref_key="k", add_cols=["seg"],
                            ref_data=ref, fallback=cli)
        out = stage(pd.DataFrame({"k": [1, 2, 3, 4, 5]}))
        got = out.set_index("k")
        assert got.loc[1, "enrich_status"] == "hit"
        assert got.loc[3, "enrich_status"] == "fallback"
        assert got.loc[3, "seg"] == "ext3"
        assert got.loc[5, "enrich_status"] == "miss"

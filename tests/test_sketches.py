"""Unit tests for mergeable sketches (Welford moments, t-digest, HLL)."""

import numpy as np
import pandas as pd

from bio_data_validation_ray import sketches


def test_moments_match_numpy_and_merge():
    rng = np.random.default_rng(42)
    x = rng.normal(10, 3, size=10_000)
    # single shot
    m = sketches.Moments().add_array(x)
    assert np.isclose(m.mean, x.mean())
    assert np.isclose(m.std, x.std())
    assert np.isclose(m.min, x.min()) and np.isclose(m.max, x.max())
    # merged over chunks == single shot
    parts = np.array_split(x, 7)
    merged = sketches.Moments()
    for p in parts:
        merged.merge(sketches.Moments().add_array(p))
    assert np.isclose(merged.mean, m.mean)
    assert np.isclose(merged.m2, m.m2)
    assert np.isclose(merged.m3, m.m3, rtol=1e-6, atol=1e-3)


def test_moments_skewness():
    rng = np.random.default_rng(1)
    x = rng.exponential(2.0, size=50_000)  # true skew = 2
    m = sketches.Moments().add_array(x)
    assert 1.7 < m.skewness < 2.3
    # population skew formula check against direct numpy
    g1 = np.mean((x - x.mean()) ** 3) / x.std() ** 3
    assert np.isclose(m.skewness, g1, rtol=1e-8)


def test_moments_nan_handling():
    m = sketches.Moments().add_array(np.array([1.0, np.nan, 3.0]))
    assert m.n == 2 and m.mean == 2.0


def test_tdigest_quantiles():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, size=100_000)
    td = sketches.TDigest()
    for chunk in np.array_split(x, 23):
        td.merge(sketches.TDigest().add_array(chunk))
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert abs(td.quantile(q) - np.quantile(x, q)) < 0.05, q
    assert td.total_weight == len(x)
    # cdf roundtrip
    assert abs(td.cdf(0.0) - 0.5) < 0.01
    assert abs(td.cdf(np.quantile(x, 0.9)) - 0.9) < 0.01


def test_tdigest_compact():
    td = sketches.TDigest()
    td.add_array(np.arange(1_000_000, dtype=float))
    td._compress()
    assert td.means.size < 500  # bounded memory regardless of input size


def test_hll_accuracy_and_merge():
    n = 200_000
    values = np.array([f"conv-{i:08d}" for i in range(n)], dtype=object)
    h1 = sketches.HLL().add_values(values[: n // 2])
    h2 = sketches.HLL().add_values(values[n // 2 :])
    h2.add_values(values[: 1000])  # overlap must not inflate
    h1.merge(h2)
    est = h1.estimate()
    assert abs(est - n) / n < 0.03


def test_hll_small_range_linear_counting():
    h = sketches.HLL().add_values(np.array([f"x{i}" for i in range(50)], dtype=object))
    assert abs(h.estimate() - 50) < 3


def test_serialization_roundtrip():
    m = sketches.Moments().add_array(np.arange(100.0))
    td = sketches.TDigest().add_array(np.arange(100.0))
    h = sketches.HLL().add_values(np.array(["a", "b"], dtype=object))
    for obj, attr in ((m, "mean"), (td, None), (h, None)):
        b = sketches.dumps(obj)
        back = sketches.loads(b)
        assert type(back) is type(obj)
    assert np.isclose(sketches.loads(sketches.dumps(td)).quantile(0.5), td.quantile(0.5))
    assert sketches.loads(sketches.dumps(h)).estimate() == h.estimate()


class TestSpaceSaving:
    def test_exact_when_k_covers_domain(self):
        from bio_data_validation_ray.sketches import SpaceSaving

        rng = np.random.default_rng(5)
        items = rng.integers(0, 50, 10_000)
        vc = pd.Series(items).value_counts()
        sk = SpaceSaving(64)
        for i in range(0, len(items), 997):
            chunk = pd.Series(items[i:i + 997]).value_counts()
            sk.update_counts(chunk.index.to_numpy(), chunk.to_numpy())
        assert sk.err_bound == 0
        est = sk.counts.sort_index()
        pd.testing.assert_series_equal(
            est, vc.sort_index(), check_names=False, check_index_type=False)

    def test_error_bound_and_heavy_hitter_survival(self):
        from bio_data_validation_ray.sketches import SpaceSaving

        rng = np.random.default_rng(9)
        # zipf-ish stream with one planted heavy hitter
        tail = rng.integers(1000, 9000, 20_000)
        stream = np.concatenate([tail, np.full(3_000, 7)])
        rng.shuffle(stream)
        true = pd.Series(stream).value_counts()
        k = 200
        chunks = [stream[i:i + 1000] for i in range(0, len(stream), 1000)]
        sketches = []
        for c in chunks:
            sk = SpaceSaving(k)
            vc = pd.Series(c).value_counts()
            sk.update_counts(vc.index.to_numpy(), vc.to_numpy())
            sketches.append(sk)
        merged = sketches[0]
        for sk in sketches[1:]:
            merged.merge(sk)
        assert len(merged.counts) <= k
        # the heavy hitter (count 3000 >> err_bound) must survive with an
        # estimate within the bound, and every estimate only undercounts
        bound = int(merged.err_bound)
        assert bound < 3000
        assert 7 in merged.counts.index
        for item, est in merged.counts.items():
            t = int(true.get(item, 0))
            assert t - bound <= int(est) <= t


class TestBloomFilter:
    def test_no_false_negatives_and_merge(self):
        from bio_data_validation_ray.sketches import BloomFilter, _hash64

        rng = np.random.default_rng(13)
        keys = rng.integers(0, 1 << 60, 5000)
        halves = [keys[:2500], keys[2500:]]
        blooms = []
        for h in halves:
            b = BloomFilter(1 << 18, 5)
            b.add_hashes(_hash64(h))
            blooms.append(b)
        merged = blooms[0].merge(blooms[1])
        assert merged.contains_hashes(_hash64(keys)).all()

    def test_false_positive_rate_bounded(self):
        from bio_data_validation_ray.sketches import BloomFilter, _hash64

        rng = np.random.default_rng(17)
        b = BloomFilter(1 << 18, 5)
        b.add_hashes(_hash64(rng.integers(0, 1 << 60, 10_000)))
        probe = _hash64(rng.integers(1 << 61, 1 << 62, 50_000))
        fp = b.contains_hashes(probe).mean()
        # theoretical ~ (1 - e^(-5*10000/262144))^5 ~= 1.6e-4
        assert fp < 2e-3


def test_hll_respects_p():
    """Registers must derive from p — a fixed 2^14 default made every
    HLL(p != 14) estimate ~20x low (linear counting always fired)."""
    rng = np.random.default_rng(5)
    vals = np.array([f"v{i}" for i in range(100_000)], dtype=object)
    for p in (10, 12, 14):
        h = sketches.HLL(p=p).add_values(vals)
        assert h.registers.size == 1 << p
        est = h.estimate()
        assert abs(est - 100_000) / 100_000 < 0.1, (p, est)
    import pytest

    with pytest.raises(ValueError):
        sketches.HLL(p=10, registers=np.zeros(1 << 14, np.uint8))

"""Unit tests for mergeable sketches (Welford moments, t-digest, HLL)."""

import numpy as np

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

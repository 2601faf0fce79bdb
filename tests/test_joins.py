"""banded_range_join: brute-force parity, band-boundary inclusivity,
multi-band interval spans, and block-layout invariance."""

import numpy as np
import pandas as pd
import pytest

from bio_data_validation_ray.functions.joins import banded_range_join

W = 1_000_000  # 1 s bands


def brute(points: pd.DataFrame, iv: pd.DataFrame) -> pd.DataFrame:
    m = points.merge(iv, on="k")
    m = m[(m["lo"] <= m["ts"]) & (m["ts"] <= m["hi"])]
    return (m[["k", "ts", "pid", "lo", "hi", "iid"]]
            .sort_values(["k", "ts", "pid", "iid"]).reset_index(drop=True))


def run_join(points, iv, ray_session, *, blocks=3, band=W, max_copies=8):
    import ray.data as rd

    out = banded_range_join(
        rd.from_pandas(points).repartition(blocks),
        rd.from_pandas(iv).repartition(blocks),
        key="k", point_ts_col="ts", lo_col="lo", hi_col="hi",
        band_width_us=band, num_partitions=4, max_copies=max_copies,
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["k", "ts", "pid", "lo", "hi", "iid"])
    return (out[["k", "ts", "pid", "lo", "hi", "iid"]]
            .astype(np.int64)
            .sort_values(["k", "ts", "pid", "iid"]).reset_index(drop=True))


def random_case(seed: int, n_points=400, n_iv=120, span_max=3 * W):
    rng = np.random.default_rng(seed)
    points = pd.DataFrame({
        "k": rng.integers(0, 8, n_points),
        "ts": rng.integers(0, 20 * W, n_points),
        "pid": np.arange(n_points),
    }).astype(np.int64)
    lo = rng.integers(0, 20 * W, n_iv)
    iv = pd.DataFrame({
        "k": rng.integers(0, 8, n_iv),
        "lo": lo,
        "hi": lo + rng.integers(0, span_max, n_iv),
        "iid": np.arange(n_iv),
    }).astype(np.int64)
    return points, iv


@pytest.mark.parametrize("seed", [1, 7])
def test_matches_bruteforce(ray_session, seed):
    points, iv = random_case(seed)
    got = run_join(points, iv, ray_session)
    want = brute(points, iv)
    pd.testing.assert_frame_equal(got, want)


def test_inclusive_ends_and_band_boundaries(ray_session):
    # points exactly on lo, hi, and band edges must all match (BETWEEN)
    points = pd.DataFrame({
        "k": [1, 1, 1, 1, 1],
        "ts": [W, 2 * W, 2 * W - 1, 3 * W, 3 * W + 1],
        "pid": [0, 1, 2, 3, 4],
    }).astype(np.int64)
    iv = pd.DataFrame({"k": [1], "lo": [W], "hi": [3 * W],
                       "iid": [0]}).astype(np.int64)
    got = run_join(points, iv, ray_session)
    assert sorted(got["pid"]) == [0, 1, 2, 3]


def test_overlapping_intervals_multiplicity(ray_session):
    # one point inside 3 overlapping windows -> 3 output pairs
    points = pd.DataFrame({"k": [5], "ts": [10 * W + 17],
                           "pid": [0]}).astype(np.int64)
    iv = pd.DataFrame({
        "k": [5, 5, 5, 5],
        "lo": [9 * W, 10 * W, 10 * W + 17, 12 * W],
        "hi": [11 * W, 10 * W + 17, 13 * W, 13 * W],
        "iid": [0, 1, 2, 3],
    }).astype(np.int64)
    got = run_join(points, iv, ray_session)
    assert sorted(got["iid"]) == [0, 1, 2]


def test_block_layout_invariance(ray_session):
    points, iv = random_case(3)
    a = run_join(points, iv, ray_session, blocks=1)
    b = run_join(points, iv, ray_session, blocks=7)
    pd.testing.assert_frame_equal(a, b)


def test_span_cap_enforced(ray_session):
    points, iv = random_case(11, span_max=30 * W)
    with pytest.raises(Exception, match="max_copies"):
        run_join(points, iv, ray_session, max_copies=4)
    # raising the band width makes the same intervals legal
    got = run_join(points, iv, ray_session, band=16 * W, max_copies=4)
    pd.testing.assert_frame_equal(got, brute(points, iv))

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


class TestRangeJoinEdges:
    def test_empty_side_yields_empty_result(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.joins import (
            banded_range_join,
        )

        pts = rd.from_pandas(pd.DataFrame(
            {"k": pd.Series([], dtype=np.int64),
             "ts": pd.Series([], dtype=np.int64)}))
        iv = rd.from_pandas(pd.DataFrame(
            {"k": np.int64([1]), "lo": np.int64([0]),
             "hi": np.int64([5]), "iid": np.int64([7])}))
        out = banded_range_join(pts, iv, key="k", point_ts_col="ts",
                                lo_col="lo", hi_col="hi", band_width_us=10)
        assert out.count() == 0
        # and the symmetric case
        pts2 = rd.from_pandas(pd.DataFrame(
            {"k": np.int64([1]), "ts": np.int64([3])}))
        iv2 = rd.from_pandas(pd.DataFrame(
            {"k": pd.Series([], dtype=np.int64),
             "lo": pd.Series([], dtype=np.int64),
             "hi": pd.Series([], dtype=np.int64)}))
        assert banded_range_join(
            pts2, iv2, key="k", point_ts_col="ts", lo_col="lo",
            hi_col="hi", band_width_us=10).count() == 0

    def test_span_exactly_max_copies_bands_is_legal(self, ray_session):
        """Span == max_copies * W covers max_copies+1 bands and must join,
        per the documented contract."""
        import ray.data as rd

        from bio_data_validation_ray.functions.joins import (
            banded_range_join,
        )

        pts = rd.from_pandas(pd.DataFrame(
            {"k": np.int64([1, 1]), "ts": np.int64([9, 29])}))
        iv = rd.from_pandas(pd.DataFrame(
            {"k": np.int64([1]), "lo": np.int64([9]),
             "hi": np.int64([29]), "iid": np.int64([3])}))
        out = banded_range_join(pts, iv, key="k", point_ts_col="ts",
                                lo_col="lo", hi_col="hi", band_width_us=10,
                                max_copies=2).to_pandas()
        assert len(out) == 2

    def test_tz_aware_timestamps(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.joins import (
            banded_range_join,
        )

        pts = rd.from_pandas(pd.DataFrame(
            {"k": np.int64([1]),
             "ts": pd.to_datetime(["2024-01-01 00:00:01"])
             .tz_localize("UTC")}))
        iv = rd.from_pandas(pd.DataFrame(
            {"k": np.int64([1]),
             "lo": pd.to_datetime(["2024-01-01"]).tz_localize("UTC"),
             "hi": pd.to_datetime(["2024-01-02"]).tz_localize("UTC"),
             "iid": np.int64([5])}))
        out = banded_range_join(pts, iv, key="k", point_ts_col="ts",
                                lo_col="lo", hi_col="hi",
                                band_width_us=86400 * 1_000_000).to_pandas()
        assert len(out) == 1


class TestScanGuards:
    def test_capacity_must_be_positive(self, ray_session):
        import pytest
        import ray.data as rd

        from bio_data_validation_ray.functions.scan import packed_bins

        ds = rd.from_pandas(pd.DataFrame(
            {"o": np.int64([1]), "v": np.int64([1])}))
        for cap in (0, -5):
            with pytest.raises(ValueError):
                packed_bins(ds, order_col="o", value_col="v", capacity=cap)

    def test_duplicate_boundary_keys_raise(self, ray_session):
        """Duplicate order_col values straddling a block boundary violate
        the unique-key precondition and must fail loudly, not corrupt
        offsets."""
        import pytest
        import ray.data as rd

        from bio_data_validation_ray.functions.scan import (
            block_prefix_offsets,
        )

        dup = pd.DataFrame({"o": np.int64([1, 1]), "v": np.int64([2, 3])})
        ds = rd.from_pandas([dup.iloc[:1], dup.iloc[1:]])
        with pytest.raises(ValueError, match="unique"):
            block_prefix_offsets(ds, "o", "v")

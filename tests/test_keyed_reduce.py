"""Tests for the vectorized keyed reduce (the engine's grouped-aggregate
replacement for high-cardinality keys)."""

import numpy as np
import pandas as pd
import pytest


def expected(df, keys, spec):
    agg = {}
    for out, (src, how) in spec.items():
        agg[out] = (src, "size" if how == "count" else how)
    return df.groupby(keys, as_index=False).agg(**agg)


class TestKeyedReduce:
    def test_high_cardinality_exact(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import keyed_reduce_pandas

        rng = np.random.default_rng(2)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 5000, 20_000),
                "v": rng.integers(0, 100, 20_000),
            }
        )
        spec = {"n": ("v", "count"), "s": ("v", "sum"),
                "mn": ("v", "min"), "mx": ("v", "max")}
        got = keyed_reduce_pandas(rd.from_pandas(df).repartition(16), ["k"], spec)
        want = expected(df, ["k"], spec).sort_values("k").reset_index(drop=True)
        got = got.astype({c: np.int64 for c in ["k", "n", "s", "mn", "mx"]})
        want = want.astype({c: np.int64 for c in ["k", "n", "s", "mn", "mx"]})
        pd.testing.assert_frame_equal(got, want)

    def test_driver_and_sort_paths_agree(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import keyed_reduce_pandas

        rng = np.random.default_rng(8)
        df = pd.DataFrame(
            {"k": rng.integers(0, 700, 10_000),
             "v": rng.integers(0, 50, 10_000)}
        )
        spec = {"n": ("v", "count"), "s": ("v", "sum")}
        ds = rd.from_pandas([df.iloc[i::7].copy() for i in range(7)])
        drv = keyed_reduce_pandas(ds, ["k"], spec)
        srt = keyed_reduce_pandas(ds, ["k"], spec, driver_cap=0)
        pd.testing.assert_frame_equal(drv, srt)
        pd.testing.assert_frame_equal(
            drv, expected(df, ["k"], spec).sort_values(["k"], kind="stable")
            .reset_index(drop=True)
        )

    def test_every_key_unique(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import keyed_reduce_pandas

        df = pd.DataFrame({"k": np.arange(3000), "v": np.arange(3000) * 2})
        got = keyed_reduce_pandas(
            rd.from_pandas(df).repartition(8), ["k"], {"s": ("v", "sum")}
        )
        assert len(got) == 3000
        assert (got["s"].to_numpy() == got["k"].to_numpy() * 2).all()

    def test_single_key_all_rows(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import keyed_reduce_pandas

        df = pd.DataFrame({"k": ["x"] * 5000, "v": np.arange(5000)})
        got = keyed_reduce_pandas(
            rd.from_pandas(df).repartition(4), ["k"], {"s": ("v", "sum"), "n": ("v", "count")}
        )
        assert len(got) == 1
        assert int(got["s"].iloc[0]) == int(df["v"].sum())
        assert int(got["n"].iloc[0]) == 5000

    def test_combine_low_card(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import combine_low_card

        rng = np.random.default_rng(4)
        df = pd.DataFrame(
            {"k": rng.choice(["a", "b", "c"], 10_000), "v": rng.integers(0, 9, 10_000)}
        )
        spec = {"n": ("v", "count"), "s": ("v", "sum")}
        got = combine_low_card(rd.from_pandas(df).repartition(8), ["k"], spec)
        want = expected(df, ["k"], spec)
        got = got.sort_values("k").reset_index(drop=True)
        want = want.sort_values("k").reset_index(drop=True)
        assert got["n"].tolist() == want["n"].tolist()
        assert got["s"].tolist() == want["s"].tolist()

    def test_arrow_partial_matches_pandas_partial(self, ray_session):
        """make_partial_arrow agrees with the pandas partial on a frame with
        an untouched wide string column (which the Arrow path never
        converts), null values in the agg source, null keys (dropped by
        both), and every supported how."""
        import pyarrow as pa

        from bio_data_validation_ray.stages.keyed_reduce import (
            make_partial,
            make_partial_arrow,
        )

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c", None], 2000),
            "v": rng.integers(0, 100, 2000).astype(np.int64),
            "w": rng.normal(size=2000),
            "noise": ["x" * 50] * 2000,  # never touched by the agg
        })
        df.loc[rng.choice(2000, 50, replace=False), "v"] = None
        spec = {"n": ("k", "count"), "s": ("v", "sum"),
                "mn": ("w", "min"), "mx": ("w", "max"),
                "f": ("v", "first")}
        pd_out = make_partial(["k"], spec)(df).sort_values("k") \
            .reset_index(drop=True)
        ar_out = make_partial_arrow(["k"], spec)(
            pa.Table.from_pandas(df)).to_pandas().sort_values("k") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            ar_out.astype({"s": float}), pd_out.astype({"s": float}),
            check_dtype=False)

    def test_keyed_reduce_pyarrow_batch_format(self, ray_session):
        """End-to-end keyed_reduce_pandas with batch_format='pyarrow' over
        Arrow blocks matches the pandas-format result."""
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import keyed_reduce_pandas

        rng = np.random.default_rng(12)
        df = pd.DataFrame(
            {"k": rng.integers(0, 800, 10_000),
             "v": rng.integers(0, 50, 10_000)}
        )
        spec = {"n": ("v", "count"), "s": ("v", "sum"), "mn": ("v", "min")}
        ds = rd.from_pandas([df.iloc[i::5].copy() for i in range(5)])
        a = keyed_reduce_pandas(ds, ["k"], spec, batch_format="pyarrow")
        b = keyed_reduce_pandas(ds, ["k"], spec, batch_format="pandas")
        pd.testing.assert_frame_equal(
            a.astype(np.int64), b.astype(np.int64))
        # the sorted/stitched path too
        c = keyed_reduce_pandas(ds, ["k"], spec, batch_format="pyarrow",
                                driver_cap=0)
        pd.testing.assert_frame_equal(
            c.astype(np.int64), b.astype(np.int64))

    def test_multi_key(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.stages.keyed_reduce import keyed_reduce_pandas

        rng = np.random.default_rng(6)
        df = pd.DataFrame(
            {
                "a": rng.choice(["p", "q"], 8000),
                "b": rng.integers(0, 500, 8000),
                "v": rng.integers(0, 50, 8000),
            }
        )
        spec = {"n": ("v", "count"), "mx": ("v", "max")}
        got = keyed_reduce_pandas(rd.from_pandas(df).repartition(8), ["a", "b"], spec)
        want = expected(df, ["a", "b"], spec).sort_values(["a", "b"]).reset_index(drop=True)
        assert got["n"].tolist() == want["n"].tolist()
        assert got["mx"].tolist() == want["mx"].tolist()

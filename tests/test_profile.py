"""Unit tests for the generic profiling operators (functions/profile.py)."""

import numpy as np
import pandas as pd
import pytest

from bio_data_validation_ray.functions.profile import (
    column_profile,
    confounding_check,
    grouped_nunique,
    mixed_units_check,
    variant_groups,
)


def test_column_profile_flags(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    n = 1000
    cols = {
        "tiny_var": np.full(n, 3.0) + rng.normal(0, 0.01, n),
        "constant": np.full(n, 7.0),
        "zeros": np.zeros(n),
        "huge_mean": rng.normal(1e6, 1.0, n),
        "allnull": pd.array([None] * n, dtype="Float64"),
    }
    # mean-outlier detection (like the reference's >=10-samples rule,
    # matrix_validator.py:632-659) needs enough columns for a z-score of 3
    # to be reachable: one outlier among k means caps at (k-1)/sqrt(k)
    for i in range(11):
        cols[f"normal{i:02d}"] = rng.normal(10, 5, n)
    df = pd.DataFrame(cols)
    out = column_profile(
        rd.from_pandas(df), list(df.columns)
    ).set_index("column")
    assert out.loc["constant", "constant"]
    assert out.loc["tiny_var", "low_variance"]
    assert not out.loc["normal00", "low_variance"]
    assert out.loc["zeros", "n_zero"] == 1000
    assert out.loc["allnull", "all_null"]
    assert out.loc["huge_mean", "mean_outlier"]
    assert not out.loc["normal00", "mean_outlier"]


def test_mixed_units_check(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"dose": ["5 mg", "10 mg", "3 ml", "7 mg"]})
    res = mixed_units_check(rd.from_pandas(df), "dose", r"([a-z]+)$",
                            allowed={"mg"})
    assert res["mixed"] and res["units"] == ["mg", "ml"]
    assert res["invalid_units"] == ["ml"]
    assert res["counts"]["mg"] == 3


def test_extract_value_counts_none_bucket(ray_session):
    """No-match and missing values are counted under None (the docstring
    contract) instead of being dropped by the pandas combine."""
    import ray.data as rd

    from bio_data_validation_ray.functions.profile import extract_value_counts

    df = pd.DataFrame({"v": ["5 mg", "3 mg", "7 ml", "???", None]})
    out = extract_value_counts(rd.from_pandas(df), "v", r"([a-z]+)$")
    counts = dict(zip(out["unit"], out["n"].astype(int)))
    assert counts["mg"] == 2 and counts["ml"] == 1
    assert counts[None] == 2  # one no-match + one null


def test_grouped_nunique_and_confounding(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "batch": ["a", "a", "b", "b", "c"],
        "cond": ["x", "x", "y", "y", "x"],
    })
    g = grouped_nunique(rd.from_pandas(df), "batch", "cond").set_index("batch")
    assert g.loc["a", "nunique"] == 1 and g.loc["a", "n_rows"] == 2
    res = confounding_check(rd.from_pandas(df), "batch", "cond")
    # both multi-row batches carry exactly one condition -> confounded
    assert res["confounded"] and res["n_confounded"] == 2

    df2 = pd.DataFrame({
        "batch": ["a", "a", "b", "b"],
        "cond": ["x", "y", "x", "y"],
    })
    assert not confounding_check(rd.from_pandas(df2), "batch", "cond")["confounded"]


def test_grouped_nunique_distributed_path(ray_session):
    """driver_cap=0 keeps both reduce stages as Datasets (the high-card
    path: the driver sees one row per key, never the distinct-pair frame);
    results must equal the collected path exactly — including keys whose
    pairs straddle sorted-block boundaries."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 200, 5000).astype(str),
        "v": rng.integers(0, 25, 5000),
    })
    frames = [df.iloc[i:i + 250] for i in range(0, len(df), 250)]
    ds = rd.from_pandas(frames)  # many blocks -> real boundary stitching
    a = grouped_nunique(ds, "k", "v")
    b = grouped_nunique(ds, "k", "v", driver_cap=0)
    pd.testing.assert_frame_equal(a, b)
    truth = df.groupby("k").agg(n_rows=("v", "size"), nunique=("v", "nunique"))
    assert dict(zip(a["k"], a["nunique"])) == truth["nunique"].to_dict()
    assert dict(zip(a["k"], a["n_rows"])) == truth["n_rows"].to_dict()


def test_column_pair_corr(ray_session):
    """column_pair_stats + pearson_of_pair_stats: exact sums reproduce
    pandas corr, a planted duplicate column flags possible_duplicate, and
    rows with a null in either column drop pairwise."""
    import ray.data as rd

    from bio_data_validation_ray.functions.profile import (
        column_pair_stats,
        pearson_of_pair_stats,
    )

    rng = np.random.default_rng(13)
    x = rng.integers(0, 1000, 500).astype(float)
    df = pd.DataFrame({
        "x": x,
        "y": x + rng.integers(-2, 3, 500),   # near-duplicate of x
        "z": rng.integers(0, 1000, 500).astype(float),
    })
    df.loc[7, "z"] = np.nan
    ds = rd.from_pandas([df.iloc[:250], df.iloc[250:]])
    stats = column_pair_stats(ds, {"x": 1, "y": 1, "z": 1})
    r = pearson_of_pair_stats(stats).set_index(["col_a", "col_b"])
    truth = df.corr()  # pandas corr is pairwise-complete too
    for (a, b), row in r.iterrows():
        assert abs(row["r"] - truth.loc[a, b]) < 1e-9, (a, b)
    assert r.loc[("x", "y"), "possible_duplicate"]
    assert not r.loc[("x", "z"), "possible_duplicate"]
    assert r.loc[("x", "z"), "n"] == 499  # null row dropped pairwise


def test_variant_groups(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"organism": [
        "human", "Human", "HUMAN", "mouse", "yeast", "Homo sapiens",
    ]})
    out = variant_groups(
        rd.from_pandas(df), "organism",
        synonyms={"homo sapiens": "human"},
    ).set_index("canonical")
    assert out.loc["human", "n_variants"] == 4
    assert out.loc["human", "n_rows"] == 4
    assert "mouse" not in out.index


class TestGroupedZscoreOutliers:
    def test_matches_pandas_and_shift_invariance(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.profile import (
            grouped_zscore_outliers,
        )

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": np.repeat(["a", "b", "c"], 500),
            "v": np.concatenate([
                rng.integers(0, 100, 500),          # uniform: no 2-sigma
                rng.poisson(3, 500),                # skewed: real outliers
                np.r_[np.zeros(498), [5000, 5000]],  # planted extremes
            ]).astype(np.int64),
        })
        out = grouped_zscore_outliers(
            rd.from_pandas(df).repartition(4), ["g"], "v", k=2)
        exp = {}
        for g, sub in df.groupby("g"):
            v = sub["v"].to_numpy(dtype=np.float64)
            mu, sd = v.mean(), v.std()
            exp[g] = int((np.abs(v - mu) > 2 * sd).sum())
        got = dict(zip(out["g"], out["n_outliers"]))
        assert got == exp
        assert got["c"] == 2 and got["a"] == 0
        assert out["n_rows"].tolist() == [500, 500, 500]
        # the integer predicate is shift-invariant (the docstring's
        # mitigation for hot magnitudes): v + 10^6 gives identical counts
        big = df.assign(v=df["v"] + 1_000_000)
        out2 = grouped_zscore_outliers(
            rd.from_pandas(big).repartition(3), ["g"], "v", k=2)
        assert dict(zip(out2["g"], out2["n_outliers"])) == exp

"""Semantics tests for the round-4 tail operators: rank-with-ties head,
full-outer-join-as-union, hot-key skew profile, peak window rate — driven
from synthetic parquet tables so both sides of the full outer join and the
dense-rank tie paths are genuinely exercised (the sf fixtures only cover
one null side)."""

import numpy as np
import pandas as pd
import pytest


def _write(dirpath, name, df):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{dirpath}/{name}.parquet")


@pytest.fixture()
def synth_sf(tmp_path):
    rng = np.random.default_rng(5)
    n = 4000
    # engineered ties: values drawn from 12 integer buckets, many per bucket
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        "user_id": rng.choice(
            np.r_[np.zeros(1, np.int64), np.arange(1, 50, dtype=np.int64)],
            size=n, p=np.r_[0.5, np.full(49, 0.5 / 49)]),  # one hot key
        "event_type": rng.choice(["view", "click", "purchase"], n),
        "value": rng.integers(0, 12, n).astype(np.float64) + 0.25,
        "props": ['{"k": 1}'] * n,
    })
    # orders whose day-of-month domain only PARTIALLY overlaps events':
    # events cover days 1-20, orders days 15-28 -> both null sides populated
    orders = pd.DataFrame({
        "o_orderkey": np.arange(300, dtype=np.int64),
        "o_custkey": rng.integers(0, 60, 300).astype(np.int64),
        "o_orderstatus": ["O"] * 300,
        "o_totalprice": rng.uniform(10, 500, 300),
        "o_orderdate": pd.to_datetime("1996-03-14")
        + pd.to_timedelta(rng.integers(0, 14, 300), unit="D"),
        "o_orderpriority": ["1-URGENT"] * 300,
    })
    _write(tmp_path, "events", events)
    _write(tmp_path, "orders", orders)
    return str(tmp_path), events, orders


def test_rank_head_keeps_all_ties(ray_session, synth_sf):
    sf_dir, events, _ = synth_sf
    from bio_data_validation_ray.pipelines.queries import events_rank_head

    got = events_rank_head(sf_dir)
    ev = events.copy()
    ev["bucket"] = np.floor(ev["value"]).astype(np.int64)
    rows = []
    for t, g in ev.groupby("event_type"):
        top = sorted(g["bucket"].unique())[::-1][:3]
        rnk = {b: i + 1 for i, b in enumerate(top)}
        keep = g[g["bucket"].isin(top)]
        for _, r in keep.iterrows():
            rows.append((t, int(r["event_id"]), int(r["bucket"]),
                         rnk[int(r["bucket"])]))
    want = (pd.DataFrame(rows, columns=["event_type", "event_id", "bucket",
                                        "rnk"])
            .sort_values(["event_type", "rnk", "event_id"])
            .reset_index(drop=True))
    want["event_id"] = want["event_id"].astype(np.int64)
    want["bucket"] = want["bucket"].astype(np.int64)
    want["rnk"] = want["rnk"].astype(np.int64)
    # every tie survives: each (type, rank) group has many rows
    assert (want.groupby(["event_type", "rnk"]).size() > 10).all()
    pd.testing.assert_frame_equal(got, want)


def test_daily_full_join_both_null_sides(ray_session, synth_sf):
    sf_dir, events, orders = synth_sf
    from bio_data_validation_ray.pipelines.queries import daily_full_join

    got = daily_full_join(sf_dir)
    oc = (pd.DatetimeIndex(orders["o_orderdate"]).day.value_counts()
          .sort_index())
    ec = pd.DatetimeIndex(events["ts"]).day.value_counts().sort_index()
    want = (pd.DataFrame({"order_cnt": oc, "event_cnt": ec})
            .fillna(0).astype(np.int64).rename_axis("dom").reset_index())
    want["dom"] = want["dom"].astype(np.int64)
    # both null sides are real in this fixture
    assert (want["order_cnt"] == 0).any() and (want["event_cnt"] == 0).any()
    pd.testing.assert_frame_equal(got, want)


def test_key_skew_exact_ppm(ray_session, synth_sf):
    sf_dir, events, _ = synth_sf
    from bio_data_validation_ray.pipelines.queries import events_key_skew

    got = events_key_skew(sf_dir)
    c = events["user_id"].value_counts()
    cand = (pd.DataFrame({"user_id": c.index.astype(np.int64),
                          "n": c.to_numpy().astype(np.int64)})
            .sort_values(["n", "user_id"], ascending=[False, True])
            .head(20).reset_index(drop=True))
    total = len(events)
    cand["ppm"] = (cand["n"] * 1_000_000 // total).astype(np.int64)
    # the planted hot key dominates
    assert int(got["user_id"].iloc[0]) == 0
    assert int(got["ppm"].iloc[0]) > 400_000
    pd.testing.assert_frame_equal(got, cand)


def test_peak_rate_query_shape(ray_session, synth_sf):
    sf_dir, events, _ = synth_sf
    from bio_data_validation_ray.pipelines.queries import events_peak_rate

    got = events_peak_rate(sf_dir)
    W = 4 * 3600 * 1_000_000
    want = {}
    for k, g in events.groupby("user_id"):
        t = np.sort(g["ts"].astype("datetime64[us]").astype(np.int64))
        want[int(k)] = int((np.searchsorted(t, t, side="right")
                            - np.searchsorted(t, t - W, side="left")).max())
    assert dict(zip(got["user_id"].astype(int),
                    got["peak_cnt"].astype(int))) == want


def test_above_user_avg_integer_tie_exact(ray_session, tmp_path):
    """Values engineered so many rows land EXACTLY on their user's mean —
    the strict-inequality tie the integer predicate must not flip."""
    rng = np.random.default_rng(3)
    vals, users = [], []
    for u in range(12):
        base = [1.00, 2.00, 3.00] * 20   # mean exactly 2.00
        users += [u] * len(base)
        vals += base
    n = len(vals)
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.arange(n), unit="s"),
        "user_id": np.array(users, dtype=np.int64),
        "event_type": ["view"] * n,
        "value": np.array(vals),
        "props": ["{}"] * n,
    })
    _write(tmp_path, "events", events)
    from bio_data_validation_ray.pipelines.queries import (
        events_above_user_avg,
    )

    got = events_above_user_avg(str(tmp_path))
    # exactly the value-3.00 rows are above the mean; the 2.00 ties are not
    assert got["n_above"].tolist() == [20] * 12


def test_doc_mad_matches_brute(ray_session, tmp_path):
    rng = np.random.default_rng(8)
    n = 3000
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n,
        "lang": rng.choice(["en", "de", "fr"], n),
        "source": ["s"] * n,
        "n_chars": rng.integers(10, 5000, n).astype(np.int64),
    })
    _write(tmp_path, "documents", docs)
    from bio_data_validation_ray.pipelines.queries import doc_mad

    got = doc_mad(str(tmp_path))

    def pdisc(v):  # SQL percentile_disc(0.5): value at rank ceil(0.5*n)
        v = np.sort(np.asarray(v))
        return int(v[max(1, int(np.ceil(0.5 * len(v)))) - 1])

    for _, r in got.iterrows():
        g = docs[docs["lang"] == r["lang"]]["n_chars"].to_numpy()
        med = pdisc(g)
        assert int(r["med"]) == med
        assert int(r["mad"]) == pdisc(np.abs(g - med))


def test_repeat_buyers_excludes_single_sided(ray_session, tmp_path):
    ev = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.arange(8), unit="s"),
        "user_id": np.array([1, 1, 2, 3, 3, 4, 4, 4], dtype=np.int64),
        "event_type": ["view", "purchase",      # user 1: both
                       "view",                  # user 2: view only
                       "purchase", "purchase",  # user 3: purchase only
                       "view", "click", "purchase"],  # user 4: both
        "value": np.ones(8),
        "props": ["{}"] * 8,
    })
    _write(tmp_path, "events", ev)
    from bio_data_validation_ray.pipelines.queries import (
        events_repeat_buyers,
    )

    got = events_repeat_buyers(str(tmp_path))
    assert got["user_id"].tolist() == [1, 4]


def test_top_words_grouped_exact(ray_session, tmp_path):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a a a b c", "b b  c", "a  b",      # en
                 "x y", "y y\tz", "z z z y"],        # de (tab/space runs)
        "lang": ["en"] * 3 + ["de"] * 3,
        "source": ["s"] * 6,
        "n_chars": np.int64(9) * np.ones(6, dtype=np.int64),
    })
    _write(tmp_path, "documents", docs)
    from bio_data_validation_ray.pipelines.queries import doc_top_words

    got = doc_top_words(str(tmp_path))
    want = pd.DataFrame({
        "lang": ["de", "de", "de", "en", "en", "en"],
        "word": ["y", "z", "x", "a", "b", "c"],
        "n": np.array([4, 4, 1, 4, 4, 2], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(got, want)


def test_cdf_quantiles_exact_and_multi(ray_session):
    import ray.data as rd

    from bio_data_validation_ray.functions.profile import cdf_quantiles

    rng = np.random.default_rng(12)
    v = rng.integers(0, 50, 5000).astype(np.int64)  # duplicate-heavy
    df = pd.DataFrame({"x": v})
    ds = rd.from_pandas([df.iloc[i:i + 173] for i in range(0, 5000, 173)])
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = cdf_quantiles(ds, "x", qs)
    sv = np.sort(v)
    want = [int(sv[max(1, int(np.ceil(q * len(sv)))) - 1]) for q in qs]
    assert got == want

    with pytest.raises(ValueError):
        cdf_quantiles(ds, "x", [0.5], distinct_cap=3)


def test_doc_chunks_long_and_unicode(ray_session, tmp_path):
    """Multi-chunk expansion with overlap, including non-ASCII text: window
    arithmetic must be in CHARACTERS (len/slice), md5 over UTF-8 bytes."""
    import hashlib

    texts = [
        "a" * 47,                       # single short chunk
        "b" * 500,                      # exactly one window
        "c" * 501,                      # 2 chunks: second adds 101 chars
        "é" * 1300 + "ß" * 47,          # non-ASCII, 4 chunks
        "x" * 100,                      # len == overlap -> one chunk
    ]
    docs = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })
    _write(tmp_path, "documents", docs)
    from bio_data_validation_ray.pipelines.queries import doc_chunks

    got = doc_chunks(str(tmp_path))
    rows = []
    for did, t in enumerate(texts):
        starts = range(0, max(len(t) - 100, 1), 400)
        for k, s in enumerate(starts):
            ch = t[s:s + 500]
            rows.append((did, k, len(ch),
                         hashlib.md5(ch.encode("utf-8")).hexdigest()))
    want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk_len",
                                       "chunk_md5"])
    for c in ("doc_id", "chunk_idx", "chunk_len"):
        want[c] = want[c].astype(np.int64)
    assert (want.groupby("doc_id").size() >= 1).all()
    assert want.groupby("doc_id").size().max() == 4  # real multi-chunk case
    pd.testing.assert_frame_equal(got, want)

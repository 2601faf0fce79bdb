"""Gap-based session windows (functions/windows.py)."""

import numpy as np
import pandas as pd

from bio_data_validation_ray.functions.windows import (
    _merge_partials,
    session_stats,
    sessionize,
)


def _events(rng, n_users=40, n_events=3000):
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    for u in range(n_users):
        t = ts0 + np.timedelta64(int(rng.integers(0, 10**6)), "s")
        for _ in range(int(rng.integers(10, n_events // n_users * 2))):
            # mixture of short gaps (same session) and long gaps (new one)
            gap = int(rng.choice([30, 120, 600, 7200, 90000],
                                 p=[.4, .3, .1, .1, .1]))
            t = t + np.timedelta64(gap, "s")
            rows.append((u, t))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    return df.sample(frac=1.0, random_state=7).reset_index(drop=True)


def _pandas_truth(df, gap_s):
    df = df.sort_values(["user_id", "ts"], kind="stable")
    prev = df.groupby("user_id")["ts"].shift(1)
    new_s = prev.isna() | ((df["ts"] - prev).dt.total_seconds() > gap_s)
    return df.assign(new_s=new_s).groupby("user_id").agg(
        n_sessions=("new_s", "sum"), n_events=("new_s", "size")
    )


def test_sessionize_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(19)
    df = _events(rng)
    frames = [df.iloc[i:i + 97] for i in range(0, len(df), 97)]
    ds = rd.from_pandas(frames)  # many blocks -> real boundary stitching
    out = session_stats(ds, gap_s=3600).set_index("key")
    truth = _pandas_truth(df, 3600)
    assert out["n_sessions"].to_dict() == truth["n_sessions"].astype(int).to_dict()
    assert out["n_events"].to_dict() == truth["n_events"].astype(int).to_dict()


def test_sessionize_distributed_path_agrees(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    df = _events(rng, n_users=25, n_events=1500)
    ds = rd.from_pandas([df.iloc[i:i + 80] for i in range(0, len(df), 80)])
    a = session_stats(ds, gap_s=3600)
    b = session_stats(ds, gap_s=3600, driver_cap=0)
    pd.testing.assert_frame_equal(a, b)
    # full session rows, both paths
    _, drv = sessionize(ds, gap_s=3600)
    interior, boundary = sessionize(ds, gap_s=3600, driver_cap=0)
    dist = pd.concat([interior.to_pandas(), boundary], ignore_index=True)
    key = ["key", "ts_start"]
    pd.testing.assert_frame_equal(
        drv.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
    )


def test_asof_last_marker(ray_session):
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import asof_last_marker

    rng = np.random.default_rng(29)
    df = _events(rng, n_users=20, n_events=1200)
    df["event_id"] = np.arange(len(df))
    df["event_type"] = rng.choice(["view", "click", "buy"], len(df),
                                  p=[0.3, 0.5, 0.2])
    # plant a timestamp TIE: a view and a click at the same (user, ts) —
    # RANGE semantics means the click sees the tied view
    t0 = df.iloc[0]
    df.loc[len(df)] = [t0["user_id"], t0["ts"], len(df), "view"]
    df.loc[len(df)] = [t0["user_id"], t0["ts"], len(df), "click"]

    def truth(d):
        d = d.sort_values(["user_id", "ts", "event_id"], kind="stable")
        out = {}
        last = {}
        # two passes per (user, ts) group to model RANGE tie inclusion
        for (u, ts), grp in d.groupby(["user_id", "ts"], sort=True):
            vmax = grp.loc[grp["event_type"] == "view", "ts"].max()
            cur = last.get(u)
            if pd.notna(vmax):
                cur = vmax if cur is None or vmax > cur else cur
                last[u] = cur
            for eid in grp["event_id"]:
                if cur is not None:
                    out[int(eid)] = int(np.datetime64(cur, "us").astype(np.int64))
        return out

    expect = truth(df)
    ds = rd.from_pandas([df.iloc[i:i + 70] for i in range(0, len(df), 70)])
    interior, drv = asof_last_marker(
        ds, key="user_id", ts_col="ts", marker_col="event_type",
        marker_value="view", out_cols=["event_id"], out_name="lv",
    )
    assert interior is None  # small input -> driver path
    got = dict(zip(drv["event_id"].astype(int), drv["lv"].astype(int)))
    assert got == expect
    # distributed path agrees
    i2, d2 = asof_last_marker(
        ds, key="user_id", ts_col="ts", marker_col="event_type",
        marker_value="view", out_cols=["event_id"], out_name="lv",
        driver_cap=0,
    )
    full = pd.concat([i2.to_pandas(), d2], ignore_index=True)
    got2 = dict(zip(full["event_id"].astype(int), full["lv"].astype(int)))
    assert got2 == expect


def test_gap_stats_matches_pandas(ray_session):
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import gap_stats

    rng = np.random.default_rng(37)
    df = _events(rng, n_users=15, n_events=900)
    ds = rd.from_pandas([df.iloc[i:i + 60] for i in range(0, len(df), 60)])
    out = gap_stats(ds, key="user_id", order_cols=[], ts_col="ts")
    srt = df.sort_values(["user_id", "ts"], kind="stable")
    gaps = (srt["ts"] - srt.groupby("user_id")["ts"].shift(1)).dt.total_seconds()
    truth = (
        srt.assign(g=gaps).dropna(subset=["g"]).groupby("user_id")["g"]
        .agg(n_gaps="size", max_gap="max")
    )
    got = out.set_index("key")
    assert got["n_gaps"].to_dict() == truth["n_gaps"].astype(int).to_dict()
    assert all(
        abs(got.loc[u, "max_gap_us"] / 1e6 - truth.loc[u, "max_gap"]) < 1e-6
        for u in truth.index
    )
    dist = gap_stats(ds, key="user_id", order_cols=[], ts_col="ts",
                     driver_cap=0)
    pd.testing.assert_frame_equal(out, dist)


def test_gap_stats_nonmonotonic_ts_distributed(ray_session):
    """Keys ordered by an order column with NON-monotonic timestamps: the
    distributed merge must order partials by the order snapshot, not
    first_ts (ADVICE r3 high). Blocks are tiny so every key spans many."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import gap_stats

    rng = np.random.default_rng(41)
    n, nk = 600, 12
    df = pd.DataFrame({
        "user_id": np.sort(rng.integers(0, nk, n)),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="us"),
    })
    df["ord"] = df.groupby("user_id").cumcount()
    ds = rd.from_pandas([df.iloc[i:i + 7] for i in range(0, len(df), 7)])
    srt = df.sort_values(["user_id", "ord"], kind="stable")
    g = (srt["ts"].astype("int64") // 1000).groupby(srt["user_id"].to_numpy())
    truth = g.agg(lambda v: int(np.diff(v).max()))
    for cap in (5_000_000, 0):
        out = gap_stats(ds, key="user_id", order_cols=["ord"], ts_col="ts",
                        driver_cap=cap).set_index("key")
        assert out["max_gap_us"].to_dict() == truth.to_dict()
        assert out["n_gaps"].to_dict() == (
            srt.groupby("user_id").size() - 1).to_dict()


def test_grouped_top_n(ray_session):
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import grouped_top_n

    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "k": rng.integers(0, 30, 2000).astype(str),
        "o": rng.integers(0, 10**6, 2000),
        "id": np.arange(2000),
    })
    ds = rd.from_pandas([df.iloc[i:i + 111] for i in range(0, len(df), 111)])
    out = grouped_top_n(ds, key="k", order_cols=["o", "id"], n=4)
    truth = (df.sort_values(["k", "o", "id"], kind="stable")
             .groupby("k").head(4)
             .sort_values(["k", "o", "id"], kind="stable")
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(out, truth, check_dtype=False)
    dist = grouped_top_n(ds, key="k", order_cols=["o", "id"], n=4,
                         driver_cap=0)
    pd.testing.assert_frame_equal(out, dist)


def test_grouped_percentile_disc(ray_session):
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import (
        grouped_percentile_disc,
    )

    rng = np.random.default_rng(59)
    df = pd.DataFrame({
        "k": rng.integers(0, 20, 1500).astype(str),
        "v": rng.integers(0, 10**6, 1500),
    })
    ds = rd.from_pandas([df.iloc[i:i + 90] for i in range(0, len(df), 90)])
    for q in (0.5, 0.25, 0.9, 1.0):
        out = grouped_percentile_disc(ds, key="k", value_col="v", q=q)
        got = dict(zip(out["k"], out["p"]))
        for k, grp in df.groupby("k"):
            s = np.sort(grp["v"].to_numpy())
            rank = max(1, int(np.ceil(q * s.size)))
            assert got[k] == s[rank - 1], (q, k)
        dist = grouped_percentile_disc(ds, key="k", value_col="v", q=q,
                                       driver_cap=0)
        pd.testing.assert_frame_equal(out, dist)


def test_hot_key_boundary_traffic_is_compact_and_exact(ray_session):
    """VERDICT r3 #2: ONE pathologically hot key spanning every block must
    cost the driver O(batches) compact partial rows — never its raw rows —
    across asof / top-n / percentile_disc, with answers unchanged."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import (
        _asof_partials,
        _pdisc_partials,
        _split_boundary,
        asof_last_marker,
        grouped_percentile_disc,
        grouped_top_n,
    )

    rng = np.random.default_rng(67)
    n, chunk = 3000, 40
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),  # one hot key
        "event_id": np.arange(n),
        "event_type": rng.choice(["view", "click", "buy"], n),
        "ts": pd.to_datetime(np.sort(rng.integers(0, 10**8, n)), unit="us"),
        "v": rng.integers(0, 50, n),  # small domain -> long value runs
    })
    chunks = [df.iloc[i:i + chunk].reset_index(drop=True)
              for i in range(0, n, chunk)]

    # --- compactness: per-chunk boundary partials are O(1) rows each ---
    asof_parts = [
        _asof_partials(_split_boundary(c, "user_id", True), "user_id", "ts",
                       "event_type", "view")
        for c in chunks
    ]
    assert all(len(p) <= 2 for p in asof_parts)  # <= 2 boundary keys/batch
    dfv = df.sort_values(["user_id", "v"], kind="stable")
    pdisc_parts = [
        _pdisc_partials(
            _split_boundary(dfv.iloc[i:i + chunk].reset_index(drop=True),
                            "user_id", True), "user_id", "v")
        for i in range(0, n, chunk)
    ]
    assert all(len(p) <= 2 for p in pdisc_parts)

    # --- exactness through the distributed (driver_cap=0) path ---
    ds = rd.from_pandas(chunks)
    srt = df.sort_values(["user_id", "ts"], kind="stable")
    is_view = (srt["event_type"] == "view").to_numpy()
    tsus = srt["ts"].astype("int64").to_numpy() // 1000
    # RANGE-tie truth: per row, max view-ts at-or-before its ts
    expect = {}
    for eid, t in zip(srt["event_id"], tsus):
        cand = tsus[is_view & (tsus <= t)]
        if cand.size:
            expect[int(eid)] = int(cand.max())
    interior, drv = asof_last_marker(
        ds, key="user_id", ts_col="ts", marker_col="event_type",
        marker_value="view", out_cols=["event_id"], out_name="lv",
        driver_cap=0,
    )
    full = pd.concat([interior.to_pandas(), drv], ignore_index=True)
    assert dict(zip(full["event_id"].astype(int),
                    full["lv"].astype(int))) == expect

    top = grouped_top_n(ds, key="user_id", order_cols=["ts", "event_id"],
                        n=5, driver_cap=0)
    t5 = (df.sort_values(["ts", "event_id"], kind="stable").head(5)
          ["event_id"].tolist())
    assert top["event_id"].tolist() == t5

    for q in (0.25, 0.5, 0.9):
        got = grouped_percentile_disc(ds, key="user_id", value_col="v",
                                      q=q, driver_cap=0)
        s = np.sort(df["v"].to_numpy())
        rank = max(1, int(np.ceil(q * s.size)))
        assert got["p"].tolist() == [s[rank - 1]]


def test_pdisc_extraction_path(ray_session):
    """Percentile rank landing strictly inside a multi-value batch run must
    route through the targeted one-row extraction pass."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import (
        grouped_percentile_disc,
    )

    rng = np.random.default_rng(71)
    df = pd.DataFrame({"k": ["h"] * 1000,
                       "v": rng.permutation(1000)})  # all-distinct values
    ds = rd.from_pandas([df.iloc[i:i + 30] for i in range(0, 1000, 30)])
    for q in (0.31, 0.5, 0.77):
        got = grouped_percentile_disc(ds, key="k", value_col="v", q=q,
                                      driver_cap=0)
        rank = max(1, int(np.ceil(q * 1000)))
        assert got["p"].tolist() == [rank - 1]  # values are 0..999


def test_merge_partials_respects_gap():
    # two partials of one key merge iff the inter-partial gap <= gap
    f = pd.DataFrame({
        "key": ["a", "a", "b"],
        "ts_start": [0, 2_000_000, 0],
        "ts_end": [1_000_000, 3_000_000, 500_000],
        "n_events": [3, 2, 1],
    })
    merged = _merge_partials(f, gap_us=1_000_000)  # gap exactly 1s -> merge
    a = merged[merged["key"] == "a"]
    assert len(a) == 1 and int(a["n_events"].iloc[0]) == 5
    split = _merge_partials(f, gap_us=999_999)     # 1 µs short -> split
    assert len(split[split["key"] == "a"]) == 2


def test_rolling_hot_key_compact_and_exact(ray_session):
    """One hot key across every block: rolling partials stay O(1) rows per
    chunk and the distributed (driver_cap=0) answer equals brute force."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import (
        _roll_partials,
        rolling_sum_max,
    )

    rng = np.random.default_rng(41)
    n, chunk, k = 3000, 40, 3
    df = pd.DataFrame({
        "key": ["hot"] * n,
        "ord": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    parts = [
        _roll_partials(df.iloc[i:i + chunk].reset_index(drop=True),
                       "key", "v", k)
        for i in range(0, n, chunk)
    ]
    assert all(len(p) == 1 for p in parts)  # one compact row per chunk

    brute = int(df["v"].rolling(k, min_periods=1).sum().max())
    ds = rd.from_pandas([df.iloc[i:i + chunk].reset_index(drop=True)
                         for i in range(0, n, chunk)])
    out = rolling_sum_max(ds, key="key", order_cols=["ord"], value_col="v",
                          k=k, driver_cap=0)
    assert list(out["key"]) == ["hot"]
    assert int(out["max_roll"].iloc[0]) == brute


def test_assemble_docs_distributed_matches_driver_path(ray_session):
    """Documents assembled through the distributed (driver_cap=0) path are
    byte-identical (same md5) to the collected path, with keys spanning
    chunk boundaries."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import assemble_docs

    rng = np.random.default_rng(7)
    n, chunk = 900, 37
    df = pd.DataFrame({
        "key": np.sort(rng.integers(0, 60, n)).astype(str),
        "ord": np.arange(n, dtype=np.int64),
        "text": [f"w{i}" * (i % 5) for i in range(n)],
    })
    ds = rd.from_pandas([df.iloc[i:i + chunk].reset_index(drop=True)
                         for i in range(0, n, chunk)])
    a = assemble_docs(ds, key="key", order_cols=["ord"], text_col="text")
    b = assemble_docs(ds, key="key", order_cols=["ord"], text_col="text",
                      driver_cap=0)
    pd.testing.assert_frame_equal(a, b)
    # and equals a plain pandas string_agg
    brute = (df.sort_values(["key", "ord"]).groupby("key")["text"]
             .agg("\n".join))
    import hashlib
    exp = pd.DataFrame({
        "key": brute.index.to_numpy(),
        "doc_len": brute.str.len().to_numpy(np.int64),
        "doc_md5": [hashlib.md5(d.encode()).hexdigest()
                    for d in brute.to_numpy()],
    }).sort_values("key", kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, exp)


class TestTemperatureSample:
    def test_quota_head_and_sqrt_damping(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import (
            grouped_quota_head, temperature_sample,
        )

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "g": np.r_[np.repeat("hot", 400), np.repeat("rare", 9)],
            "ord": rng.permutation(409),
            "rid": np.arange(409),
        })
        ds = rd.from_pandas(df).repartition(4)
        out = grouped_quota_head(
            ds, key="g", order_cols=["ord", "rid"],
            quota={"hot": 3, "rare": 5, "absent": 2})
        assert out.groupby("g").size().to_dict() == {"hot": 3, "rare": 5}
        # each group's rows are exactly its smallest `ord` values
        for g, sub in df.groupby("g"):
            want = set(sub.nsmallest({"hot": 3, "rare": 5}[g], "ord")["rid"])
            assert set(out.loc[out["g"] == g, "rid"]) == want
        ts = temperature_sample(ds, key="g", order_cols=["ord", "rid"])
        # sqrt damping: hot contributes 20 = floor(sqrt(400)), rare 3
        assert ts.groupby("g").size().to_dict() == {"hot": 20, "rare": 3}


def _funnel_truth(df, steps):
    """Sequential per-user scan — the semantics the distributed op must match."""
    res = {}
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts", kind="stable")
        t = pd.Timestamp.min
        done = 0
        for s in steps:
            cand = g[(g["event_type"] == s) & (g["ts"] >= t)]
            if len(cand) == 0:
                break
            t = cand["ts"].min()
            done += 1
        res[u] = done
    return res


class TestFunnel:
    STEPS = ("view", "click", "purchase")

    def test_semantics_crafted(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import funnel

        t0 = pd.Timestamp("2024-01-01")
        h = pd.Timedelta(hours=1)
        rows = [
            # u1: clean 3-step conversion
            (1, t0, "view"), (1, t0 + h, "click"), (1, t0 + 2 * h, "purchase"),
            # u2: click BEFORE the first view never counts
            (2, t0, "click"), (2, t0 + h, "view"), (2, t0 + 2 * h, "purchase"),
            # u3: view only
            (3, t0, "view"),
            # u4: purchase only -> 0 steps
            (4, t0, "purchase"),
            # u5: view and click at the SAME ts -> >= admits the tie
            (5, t0, "view"), (5, t0, "click"),
            # u6: chain runs off the EARLIEST view, later events qualify
            (6, t0 + 2 * h, "view"), (6, t0 + h, "click"),
            (6, t0 + 3 * h, "click"), (6, t0, "purchase"),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        out = funnel(rd.from_pandas(df), key="user_id", ts_col="ts",
                     type_col="event_type", steps=self.STEPS)
        got = dict(zip(out["key"], out["steps_completed"]))
        assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2, 6: 2}
        assert got == _funnel_truth(df, self.STEPS)

    def test_matches_bruteforce_and_distributed_path(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import funnel

        rng = np.random.default_rng(41)
        n = 4000
        df = pd.DataFrame({
            "user_id": rng.integers(0, 60, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n,
                p=[.4, .3, .1, .2]),
        })
        # duplicate timestamps exercise the >= tie path
        df.loc[rng.choice(n, 200, replace=False), "ts"] = pd.Timestamp(
            "2024-01-03")
        ds = rd.from_pandas([df.iloc[i:i + 173]
                             for i in range(0, len(df), 173)])
        out = funnel(ds, key="user_id", ts_col="ts",
                     type_col="event_type", steps=self.STEPS)
        assert dict(zip(out["key"], out["steps_completed"])) \
            == _funnel_truth(df, self.STEPS)
        dist = funnel(ds, key="user_id", ts_col="ts",
                      type_col="event_type", steps=self.STEPS,
                      driver_cap=0)
        pd.testing.assert_frame_equal(out, dist)

    def test_hot_key_partials_stay_compact(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import (
            _funnel_partials,
            funnel,
        )

        rng = np.random.default_rng(7)
        n = 30_000  # one user spanning every block
        df = pd.DataFrame({
            "user_id": np.zeros(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase"], n),
        })
        # the hot key reduces to ONE compact row per batch, never raw rows
        p = _funnel_partials(df, "user_id", "ts", "event_type", self.STEPS)
        assert len(p) == 1 and set(p.columns) >= {"f0", "f1", "f2", "f3"}
        ds = rd.from_pandas([df.iloc[i:i + 1000]
                             for i in range(0, len(df), 1000)])
        out = funnel(ds, key="user_id", ts_col="ts",
                     type_col="event_type", steps=self.STEPS, driver_cap=0)
        assert dict(zip(out["key"], out["steps_completed"])) \
            == _funnel_truth(df, self.STEPS)

    def test_duplicate_steps_rejected(self, ray_session):
        import ray.data as rd

        import pytest

        from bio_data_validation_ray.functions.windows import funnel

        df = pd.DataFrame({"user_id": [1], "ts": [pd.Timestamp("2024-01-01")],
                           "event_type": ["view"]})
        with pytest.raises(ValueError):
            funnel(rd.from_pandas(df), key="user_id", ts_col="ts",
                   type_col="event_type", steps=("view", "view"))


class TestTransitionCounts:
    def _truth(self, df):
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        nxt = df.groupby("user_id")["event_type"].shift(-1)
        m = nxt.notna()
        return (pd.DataFrame({"from_type": df["event_type"][m],
                              "to_type": nxt[m]})
                .groupby(["from_type", "to_type"]).size().to_dict())

    def _rand(self, seed, n=3000, users=50):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "user_id": rng.integers(0, users, n),
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 5000, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
        })

    def test_matches_bruteforce_across_chunkings(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import (
            transition_counts,
        )

        df = self._rand(11)
        truth = self._truth(df)
        for chunk in (97, 1000, len(df)):
            ds = rd.from_pandas([df.iloc[i:i + chunk]
                                 for i in range(0, len(df), chunk)])
            out = transition_counts(ds, key="user_id",
                                    order_cols=["ts", "event_id"],
                                    type_col="event_type")
            got = {(r.from_type, r.to_type): r.n
                   for r in out.itertuples()}
            assert got == truth, chunk

    def test_hot_key_stays_compact(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import (
            _transition_partials,
            transition_counts,
        )

        n = 20_000
        df = pd.DataFrame({
            "user_id": np.zeros(n, dtype=np.int64),
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "event_type": np.tile(["a", "b", "c"], n)[:n],
        })
        pairs, bounds = _transition_partials(df, "user_id", "event_type")
        assert len(pairs) <= 9 and len(bounds) == 1  # never raw rows
        ds = rd.from_pandas([df.iloc[i:i + 500]
                             for i in range(0, len(df), 500)])
        out = transition_counts(ds, key="user_id",
                                order_cols=["ts", "event_id"],
                                type_col="event_type")
        got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
        assert got == self._truth(df)
        assert sum(got.values()) == n - 1


class TestPercentileCont:
    def test_matches_numpy_and_distributed_path(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import (
            grouped_percentile_cont,
        )

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 5000),
            "v": rng.integers(-1000, 1000, 5000),
        })
        # one hot group spanning every block
        df.loc[df.index[:3000], "g"] = "hot"
        ds = rd.from_pandas([df.iloc[i:i + 137]
                             for i in range(0, len(df), 137)])
        for q in (0.5, 0.25, 0.9):
            out = grouped_percentile_cont(ds, key="g", value_col="v", q=q)
            # numpy 'linear' interpolation == SQL percentile_cont
            truth = {g: np.percentile(sub["v"].to_numpy(), q * 100,
                                      method="linear")
                     for g, sub in df.groupby("g")}
            got = dict(zip(out["g"], out["p"]))
            assert got.keys() == truth.keys()
            for g in truth:
                assert got[g] == truth[g], (q, g)
            dist = grouped_percentile_cont(ds, key="g", value_col="v",
                                           q=q, driver_cap=0)
            pd.testing.assert_frame_equal(out, dist)

    def test_single_row_groups(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.windows import (
            grouped_percentile_cont,
        )

        df = pd.DataFrame({"g": ["x", "y"], "v": [7, 9]})
        out = grouped_percentile_cont(rd.from_pandas(df), key="g",
                                      value_col="v", q=0.5, driver_cap=0)
        assert dict(zip(out["g"], out["p"])) == {"x": 7.0, "y": 9.0}


def test_peak_window_hot_key_compact_and_exact(ray_session):
    """One hot key across every block with bursty duplicate timestamps:
    peak-window partials stay one compact row per chunk and the distributed
    (driver_cap=0) answer equals the brute-force peer-inclusive RANGE-frame
    maximum."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import (
        _pwc_partials,
        peak_window_count,
    )

    rng = np.random.default_rng(91)
    n, chunk, W = 2400, 37, 500
    # bursty arrivals with repeated timestamps (peers)
    ts = np.sort(rng.choice(np.arange(0, 20_000, 3), size=n))
    df = pd.DataFrame({"key": ["hot"] * n, "ts": ts.astype(np.int64)})

    parts = [
        _pwc_partials(df.iloc[i:i + chunk].reset_index(drop=True),
                      "key", "ts", W)
        for i in range(0, n, chunk)
    ]
    assert all(len(p) == 1 for p in parts)

    lb = np.searchsorted(ts, ts - W, side="left")
    ub = np.searchsorted(ts, ts, side="right")
    brute = int((ub - lb).max())

    ds = rd.from_pandas([df.iloc[i:i + chunk].reset_index(drop=True)
                         for i in range(0, n, chunk)])
    for cap in (0, 5_000_000):
        out = peak_window_count(ds, key="key", ts_col="ts", window_us=W,
                                driver_cap=cap)
        assert list(out["key"]) == ["hot"]
        assert int(out["peak_cnt"].iloc[0]) == brute


def test_peak_window_multi_key_chunking_invariant(ray_session):
    """Many keys spanning chunk boundaries: every chunking yields the same
    per-key peak as a single-pass brute force."""
    import ray.data as rd

    from bio_data_validation_ray.functions.windows import peak_window_count

    rng = np.random.default_rng(17)
    n, W = 1500, 250
    df = pd.DataFrame({
        "key": np.sort(rng.integers(0, 40, n)).astype(str),
        "ts": rng.integers(0, 5_000, n).astype(np.int64),
    })

    def brute(g):
        t = np.sort(g["ts"].to_numpy())
        return int((np.searchsorted(t, t, side="right")
                    - np.searchsorted(t, t - W, side="left")).max())

    want = {k: brute(g) for k, g in df.groupby("key")}
    for chunk in (11, 83, 500):
        ds = rd.from_pandas([df.iloc[i:i + chunk].reset_index(drop=True)
                             for i in range(0, n, chunk)])
        out = peak_window_count(ds, key="key", ts_col="ts", window_us=W,
                                driver_cap=0)
        got = dict(zip(out["key"], out["peak_cnt"].astype(int)))
        assert got == want, f"chunk={chunk}"

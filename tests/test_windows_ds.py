"""Round-5 scale contract for the window-op family: every distributed
path returns ``(interior_ds, boundary_frame)`` — the driver holds only
boundary-key rows (at most two keys per block), NEVER the O(#keys) final
result. The ``*_ds`` union must equal the collected driver-path answer."""
import numpy as np
import pandas as pd
import pytest


def _mk(rng, n_keys=30, rows_per_key=40):
    rows = []
    t0 = 1_700_000_000_000_000
    for u in range(n_keys):
        for i in range(int(rng.integers(5, rows_per_key))):
            rows.append((f"k{u:03d}", i,
                         int(t0 + u * 10**9 + i * 60_000_000),
                         f"v{int(rng.integers(0, 3))}",
                         int(rng.integers(0, 50))))
    df = pd.DataFrame(rows, columns=["key", "idx", "ts_us", "val", "num"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    return df.sample(frac=1.0, random_state=3).reset_index(drop=True)


def _chunks(df, n=45):
    import ray.data as rd

    return rd.from_pandas([df.iloc[i:i + n] for i in range(0, len(df), n)])


def test_pair_contract_invariant_across_chunkings(ray_session):
    """The (interior, boundary) union must be chunking-invariant: tiny
    chunks (every key a boundary key somewhere) and one big chunk (all
    keys interior) give identical results for a representative op of
    each merge style (gap partial / dual-path partial / raw head)."""
    from bio_data_validation_ray.functions.windows import (
        adjacent_pair_counts_ds, gap_stats_ds, grouped_top_n_ds)

    df = _mk(np.random.default_rng(23), n_keys=12, rows_per_key=25)
    results = {}
    for n in (3, 45, 10_000):
        ds = _chunks(df, n)
        i1, b1 = gap_stats_ds(ds, key="key", order_cols=["idx"],
                              ts_col="ts", driver_cap=0)
        i2, b2 = adjacent_pair_counts_ds(ds, key="key", order_cols=["idx"],
                                         col="val", driver_cap=0)
        i3, b3 = grouped_top_n_ds(ds, key="key", order_cols=["idx"], n=4,
                                  driver_cap=0)
        out = []
        for i, b, sort_cols in ((i1, b1, ["key"]), (i2, b2, ["key"]),
                                (i3, b3, ["key", "idx"])):
            full = pd.concat([i.to_pandas(), b], ignore_index=True)
            out.append(full.sort_values(sort_cols, kind="stable")
                       .reset_index(drop=True))
        results[n] = out
    for n in (45, 10_000):
        for a, b in zip(results[3], results[n]):
            pd.testing.assert_frame_equal(a[sorted(a.columns)],
                                          b[sorted(b.columns)],
                                          check_dtype=False)


def _assert_pair_contract(interior, boundary, n_keys, collected_expect,
                          key_col="key", sort_cols=None):
    import ray.data

    assert isinstance(interior, ray.data.Dataset), \
        "distributed path must return the interior as a Dataset"
    # the driver-held boundary frame covers only boundary KEYS — strictly
    # fewer than the full key set for multi-block inputs
    assert boundary[key_col].nunique() < n_keys
    full = pd.concat([interior.to_pandas(), boundary], ignore_index=True)
    sort_cols = sort_cols or [key_col]
    a = full.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    b = (collected_expect.sort_values(sort_cols, kind="stable")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        a[b.columns].reset_index(drop=True), b, check_dtype=False)


class TestDsContract:
    @pytest.fixture(scope="class")
    def df(self):
        return _mk(np.random.default_rng(11))

    def test_gap_stats_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            gap_stats, gap_stats_ds)

        ds = _chunks(df)
        expect = gap_stats(ds, key="key", order_cols=["idx"], ts_col="ts")
        interior, boundary = gap_stats_ds(
            ds, key="key", order_cols=["idx"], ts_col="ts", driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_grouped_top_n_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            grouped_top_n, grouped_top_n_ds)

        ds = _chunks(df)
        expect = grouped_top_n(ds, key="key", order_cols=["idx"], n=3)
        interior, boundary = grouped_top_n_ds(
            ds, key="key", order_cols=["idx"], n=3, driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect, sort_cols=["key", "idx"])

    def test_percentile_disc_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            grouped_percentile_disc, grouped_percentile_disc_ds)

        ds = _chunks(df)
        expect = grouped_percentile_disc(ds, key="key", value_col="num",
                                         q=0.5)
        interior, boundary = grouped_percentile_disc_ds(
            ds, key="key", value_col="num", q=0.5, driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_percentile_cont_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            grouped_percentile_cont, grouped_percentile_cont_ds)

        ds = _chunks(df)
        expect = grouped_percentile_cont(ds, key="key", value_col="num",
                                         q=0.5)
        interior, boundary = grouped_percentile_cont_ds(
            ds, key="key", value_col="num", q=0.5, driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_rolling_sum_max_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            rolling_sum_max, rolling_sum_max_ds)

        ds = _chunks(df)
        expect = rolling_sum_max(ds, key="key", order_cols=["idx"],
                                 value_col="num", k=3)
        interior, boundary = rolling_sum_max_ds(
            ds, key="key", order_cols=["idx"], value_col="num", k=3,
            driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_adjacent_pair_counts_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            adjacent_pair_counts, adjacent_pair_counts_ds)

        ds = _chunks(df)
        expect = adjacent_pair_counts(ds, key="key", order_cols=["idx"],
                                      col="val")
        interior, boundary = adjacent_pair_counts_ds(
            ds, key="key", order_cols=["idx"], col="val", driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_max_run_length_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            max_run_length, max_run_length_ds)

        ds = _chunks(df)
        expect = max_run_length(ds, key="key", order_cols=["idx"],
                                col="val")
        interior, boundary = max_run_length_ds(
            ds, key="key", order_cols=["idx"], col="val", driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_peak_window_count_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            peak_window_count, peak_window_count_ds)

        ds = _chunks(df)
        expect = peak_window_count(ds, key="key", ts_col="ts",
                                   window_us=300_000_000)
        interior, boundary = peak_window_count_ds(
            ds, key="key", ts_col="ts", window_us=300_000_000,
            driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_funnel_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            funnel, funnel_ds)

        ds = _chunks(df)
        steps = ("v0", "v1", "v2")
        expect = funnel(ds, key="key", ts_col="ts", type_col="val",
                        steps=steps)
        interior, boundary = funnel_ds(
            ds, key="key", ts_col="ts", type_col="val", steps=steps,
            driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)

    def test_assemble_docs_ds(self, ray_session, df):
        from bio_data_validation_ray.functions.windows import (
            assemble_docs, assemble_docs_ds)

        ds = _chunks(df)
        expect = assemble_docs(ds, key="key", order_cols=["idx"],
                               text_col="val")
        interior, boundary = assemble_docs_ds(
            ds, key="key", order_cols=["idx"], text_col="val",
            driver_cap=0)
        _assert_pair_contract(interior, boundary, df["key"].nunique(),
                              expect)


def test_order_snapshot_survives_shuffled_partials():
    """The merge fns must restore stream order from the partials' __ord
    snapshots: feeding them a SHUFFLED partial frame must give the same
    answer as the stream-ordered frame (the exact failure round-4 ADVICE
    flagged for rolling/adjpair/runlen/peak)."""
    from bio_data_validation_ray.functions.windows import (
        _adjpair_partials,
        _merge_adjpair_partials,
        _merge_pwc_partials,
        _merge_roll_partials,
        _merge_runlen_partials,
        _pwc_partials,
        _roll_partials,
        _runlen_partials,
    )

    rng = np.random.default_rng(5)
    rows = []
    for u in range(6):
        for i in range(50):
            rows.append((f"k{u}", i, int(rng.integers(0, 9)),
                         f"v{int(rng.integers(0, 2))}",
                         1_700_000_000_000_000 + i * 30_000_000))
    df = pd.DataFrame(rows, columns=["key", "idx", "num", "val", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    srt = df.sort_values(["key", "idx"], kind="stable").reset_index(drop=True)
    chunks = [srt.iloc[i:i + 37].reset_index(drop=True)
              for i in range(0, len(srt), 37)]

    cases = [
        (lambda c: _roll_partials(c, "key", "num", 3, ["idx"]),
         lambda f: _merge_roll_partials(f, 3)),
        (lambda c: _adjpair_partials(c, "key", "val", ["idx"]),
         _merge_adjpair_partials),
        (lambda c: _runlen_partials(c, "key", "val", ["idx"]),
         _merge_runlen_partials),
    ]
    srt_ts = df.sort_values(["key", "ts_us"], kind="stable") \
        .reset_index(drop=True)
    ts_chunks = [srt_ts.iloc[i:i + 37].reset_index(drop=True)
                 for i in range(0, len(srt_ts), 37)]
    for part_fn, merge_fn in cases:
        parts = pd.concat([part_fn(c) for c in chunks], ignore_index=True)
        ordered = merge_fn(parts).sort_values("key").reset_index(drop=True)
        shuffled = merge_fn(
            parts.sample(frac=1.0, random_state=13).reset_index(drop=True)
        ).sort_values("key").reset_index(drop=True)
        pd.testing.assert_frame_equal(ordered, shuffled)
    pw_parts = pd.concat(
        [_pwc_partials(c, "key", "ts", 120_000_000) for c in ts_chunks],
        ignore_index=True)
    ordered = _merge_pwc_partials(pw_parts, 120_000_000) \
        .sort_values("key").reset_index(drop=True)
    shuffled = _merge_pwc_partials(
        pw_parts.sample(frac=1.0, random_state=13).reset_index(drop=True),
        120_000_000).sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(ordered, shuffled)


def test_sampling_edge_cases_from_review(ray_session):
    """Empty datasets return properly-columned empty frames (no KeyError,
    no leaked helper column); float weights are rejected loudly; the
    space-only trim keeps normalize_text byte-identical to the SQL
    oracle's trim on non-RE2-whitespace edges."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bio_data_validation_ray.functions.textstats import normalize_text
    from bio_data_validation_ray.functions.windows import (
        uniform_sample, weighted_sample)

    empty = rd.from_pandas(pd.DataFrame({
        "id": pd.Series([], dtype=np.int64),
        "w": pd.Series([], dtype=np.int64)}))
    u = uniform_sample(empty, k=5, id_col="id", columns=["id", "w"])
    assert list(u.columns) == ["id", "w"] and len(u) == 0
    w = weighted_sample(empty, k=5, id_col="id", weight_col="w",
                        columns=["id", "w"])
    assert list(w.columns) == ["id", "w"] and len(w) == 0
    with pytest.raises(Exception, match="integer column"):
        weighted_sample(
            rd.from_pandas(pd.DataFrame({"id": [1], "w": [1.5]})),
            k=1, id_col="id", weight_col="w")
    # \x0b is not RE2 \s: neither collapsed nor trimmed (DuckDB trim()
    # would leave it too — byte parity with the oracle)
    out = normalize_text(pa.table({"text": ["\x0bX\x0b", "  a  b  ", None]}))
    assert out["norm_text"].to_pylist() == ["\x0bx\x0b", "a b", None]

"""Named queries + DuckDB oracle SQL for the driver's correctness gate.

Each ``QUERIES[name]`` is a callable ``fn(sf_dir) -> DataFrame/Table`` run on
an already-initialized Ray session; ``ORACLES[name]`` (when present) is the
equivalent DuckDB SQL over the same inputs. Column names and value types are
chosen to hash-match: integer columns wherever possible (cents/basis-point
tricks instead of float sums), explicit rounding only where floats are
unavoidable.

Transcript queries run over the deterministic generated table (see
sources/transcripts.py) cached under /tmp, so the oracle reads the exact same
bytes via read_parquet('<dir>/*.parquet'). The heavy validation pipeline runs
ONCE per scale factor and is reused by every t_* query (module-level cache).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

from ..registry import transcript_registry
from ..sources.transcripts import ensure_transcripts, sf_name_of
from .validate import validate_dir

_RUN_CACHE: dict[str, tuple[dict, pd.DataFrame]] = {}

ROLE_SET_SQL = "('system','user','assistant','tool')"
TOOL_RE_SQL = "'^[a-z][a-z0-9_]{0,63}$'"
ORACLE_SF = "sf0.01"  # the driver compares at sf=0.01


def _round_half_away(v) -> np.ndarray:
    """SQL round() semantics — half AWAY from zero. np.round is
    half-to-even and silently diverges from the DuckDB oracles when a
    scaled value lands on a representable .5 tie (the same divergence
    profile.column_pair_stats pins with Arrow round_mode=
    'half_towards_infinity'). Every integer cents/qty derivation paired
    with a round() oracle must come through here."""
    v = np.asarray(v, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def _nblocks() -> int:
    """Single-file tables arrive as ONE block, serializing every per-batch
    kernel; split the read across the session's CPUs."""
    import ray

    if ray.is_initialized():
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    return 8


def _nblocks_for(path: str, rows_per_block: int = 75_000) -> int:
    """Row-aware block count for a SINGLE-FILE table scan: Ray's default
    splits one file into ~200 slices, and each read task costs ~10 ms of
    driver scheduling in Ray 2.49 — pure serial overhead that dominates
    sub-second queries. Target ~75k rows/block, clamped to [2, #CPUs]
    (measured sweet spot: 600k-row lineitem at 8 blocks runs 3x faster
    than at the default; above #CPUs the extra blocks only add overhead)."""
    import pyarrow.parquet as pq
    import ray

    ncpu = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized() else 8
    )
    rows = pq.ParquetFile(path).metadata.num_rows
    return int(min(max(2, rows // rows_per_block), max(2, ncpu)))


def _read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Single-file table scan with the row-aware block count."""
    import ray.data as rd

    path = os.path.join(sf_dir, name + ".parquet")
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=_nblocks_for(path))


def transcripts_dir(sf_dir: str) -> str:
    return ensure_transcripts(sf_name_of(sf_dir))


def _tq(sf: str = ORACLE_SF) -> str:
    """The transcripts CTE used by every transcript oracle."""
    d = ensure_transcripts(sf)
    return (
        f"WITH t AS (SELECT *, parse_filename(filename) AS shard "
        f"FROM read_parquet('{d}/*.parquet', filename=true))"
    )


def run_validation(sf_dir: str) -> tuple[dict, pd.DataFrame]:
    """Run (once per sf) the flagship pipeline on the generated transcripts;
    returns (report, violations DataFrame)."""
    d = transcripts_dir(sf_dir)
    if d in _RUN_CACHE:
        return _RUN_CACHE[d]
    reg = transcript_registry()
    run_dir = os.path.join(
        "/tmp/bdvr_queryruns", os.path.basename(d) + "-" + reg.ruleset_hash
    )
    marker = os.path.join(run_dir, "run_summary.json")
    if not os.path.exists(marker):
        shutil.rmtree(run_dir, ignore_errors=True)
        report = validate_dir(d, registry=reg, run_dir=run_dir, resume=False)
    else:
        import json

        with open(marker) as fh:  # completed earlier -> reuse the full report
            report = json.load(fh)
    vio = pd.read_parquet(os.path.join(run_dir, "violations"))
    _RUN_CACHE[d] = (report, vio)
    return report, vio


def _vio_rows(sf_dir: str, rule_id: str, cols: dict[str, str]) -> pd.DataFrame:
    """Project violation rows of one rule; ``cols`` maps output name ->
    violations column (offending_value may be renamed to the data column)."""
    _, vio = run_validation(sf_dir)
    sub = vio[vio["rule_id"] == rule_id]
    out = pd.DataFrame({name: sub[src].to_numpy() for name, src in cols.items()})
    # The violations store declares turn_idx as int32-with-nulls (conv-level
    # rows carry no turn), so pandas' read_parquet upcasts the column to
    # float64. Row-level rule subsets never have nulls here; cast back to
    # int64 so the driver's value hash matches the oracle's BIGINT.
    if "turn_idx" in out.columns:
        out["turn_idx"] = out["turn_idx"].astype(np.int64)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# transcript rule queries (engine result vs straight-SQL re-statement)
# ---------------------------------------------------------------------------


def t_role_vocab(sf_dir):
    return _vio_rows(sf_dir, "TXT_ROLE_VOCAB",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx",
                      "role": "offending_value"})


def t_tool_pattern(sf_dir):
    return _vio_rows(sf_dir, "TXT_TOOL_PATTERN",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx",
                      "tool": "offending_value"})


def t_tool_role(sf_dir):
    return _vio_rows(sf_dir, "TXT_TOOL_ROLE",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx",
                      "tool": "offending_value"})


def t_text_empty(sf_dir):
    return _vio_rows(sf_dir, "TXT_TEXT_EMPTY",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx"})


def t_text_null(sf_dir):
    return _vio_rows(sf_dir, "TXT_TEXT_NULL",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx"})


def t_turn_range(sf_dir):
    return _vio_rows(sf_dir, "CONS_003_TURN_MIN",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx"})


def t_ts_window(sf_dir):
    return _vio_rows(sf_dir, "TXT_TS_WINDOW",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx"})


def t_dup_turn_key(sf_dir):
    out = _vio_rows(sf_dir, "DUP_002_TURN_KEY",
                    {"conv_id": "conv_id", "dup_turns": "offending_value"})
    out["dup_turns"] = out["dup_turns"].astype(np.int64)
    return out


def t_contig(sf_dir):
    return _vio_rows(sf_dir, "TXT_TURN_CONTIG", {"conv_id": "conv_id"})


def t_ts_mono(sf_dir):
    return _vio_rows(sf_dir, "TXT_TS_MONOTONIC", {"conv_id": "conv_id"})


def t_conv_span_shards(sf_dir):
    return _vio_rows(sf_dir, "TXT_CONV_SINGLE_SHARD", {"conv_id": "conv_id"})


def t_row_dup(sf_dir):
    return _vio_rows(sf_dir, "DUP_001_ROW",
                     {"conv_id": "conv_id", "turn_idx": "turn_idx"})


def t_rule_counts(sf_dir):
    """Full-suite severity counts by rule — the flagship parity query."""
    _, vio = run_validation(sf_dir)
    out = (
        vio.groupby(["rule_id", "severity"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("rule_id").reset_index(drop=True)


def t_verdicts(sf_dir):
    """Per-shard decision + rows scanned (rows-only check: shard attribution
    of conversation-level violations is main-shard-based, not SQL-friendly)."""
    report, _ = run_validation(sf_dir)
    rows = [
        {
            "shard": s,
            "decision": v["decision"],
            "passed": v["passed"],
            "rows_scanned": v["rows_scanned"],
            **{f"n_{k}": int(n) for k, n in v["severity_counts"].items()},
        }
        for s, v in sorted(report["per_shard"].items())
    ]
    return pd.DataFrame(rows)


def t_conv_stats(sf_dir):
    """Per-conversation aggregates: partial per-batch combine inside
    map_batches, then the keyed reduce runs over ~#convs partial rows instead
    of raw turns (the pre-aggregate-before-shuffle pattern, SURVEY.md §2.5)."""
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce_pandas

    ds = rd.read_parquet(transcripts_dir(sf_dir), columns=["conv_id", "turn_idx"])
    out = keyed_reduce_pandas(
        ds, ["conv_id"],
        {"n_turns": ("turn_idx", "count"),
         "turn_min": ("turn_idx", "min"),
         "turn_max": ("turn_idx", "max")},
        batch_format="pyarrow",
    )
    for c in ("n_turns", "turn_min", "turn_max"):
        out[c] = out[c].astype(np.int64)
    return out


def t_rolling_max(sf_dir):
    """Per-conversation MAX of the 3-turn rolling text-length sum — the
    sliding row-window aggregate (SURVEY.md §2.6 windowed aggregates;
    reference computes per-group windowed stats in pandas). One sorted scan,
    O(k) compact partial bytes per (batch, conv) — a hot conversation never
    ships raw rows to the driver. Ordering matches the SQL window ORDER BY
    (turn_idx, ts, len) exactly; null text orders as -1 and sums as 0."""
    import ray.data as rd

    from ..functions.windows import rolling_sum_max

    ds = rd.read_parquet(transcripts_dir(sf_dir),
                         columns=["conv_id", "turn_idx", "ts", "text"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        ln = df["text"].str.len()
        df["ord_len"] = ln.fillna(-1).astype(np.int64)
        df["len"] = ln.fillna(0).astype(np.int64)
        return df[["conv_id", "turn_idx", "ts", "ord_len", "len"]]

    out = rolling_sum_max(
        ds.map_batches(derive, batch_format="pandas"),
        key="conv_id", order_cols=["turn_idx", "ts", "ord_len"],
        value_col="len", k=3,
    )
    return out.rename(columns={"key": "conv_id", "max_roll": "max_roll3"})


def t_role_stats(sf_dir):
    """Per-role text-length stats with exact integer aggregates: low-
    cardinality key -> per-batch partials combined driver-side, no shuffle
    at all (SURVEY.md §2.5 partial+final pattern)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = rd.read_parquet(transcripts_dir(sf_dir), columns=["role", "text"])

    def add_len(t: pa.Table) -> pa.Table:
        ln = pc.fill_null(pc.cast(pc.utf8_length(t["text"]), pa.int64()), 0)
        return t.append_column("len", ln).select(["role", "len"])

    out = combine_low_card(
        ds.map_batches(add_len, batch_format="pyarrow"),
        ["role"],
        {"n": ("len", "count"), "sum_len": ("len", "sum"),
         "min_len": ("len", "min"), "max_len": ("len", "max")},
    )
    for c in ("n", "sum_len", "min_len", "max_len"):
        out[c] = out[c].astype(np.int64)
    return out


def t_distinct_convs(sf_dir):
    """HLL++ estimate next to the exact distinct count (approximate op —
    rows-only; the pytest suite asserts the <2% error bound instead)."""
    report, _ = run_validation(sf_dir)
    import ray.data as rd

    exact = rd.read_parquet(transcripts_dir(sf_dir), columns=["conv_id"]).unique(
        "conv_id"
    )
    est = report["stages"]["stats"]["summary"]["distinct_convs_hll"]
    return pd.DataFrame(
        {"hll_estimate": [est], "exact": [len(exact)],
         "rel_error": [round(abs(est - len(exact)) / len(exact), 4)]}
    )


def t_distinct_convs_exact(sf_dir):
    """EXACT distinct conv_id count — the hash-green twin of the HLL
    estimate: the keyed reduce emits one row per distinct key (interior
    keys stay a Dataset, only a count crosses to the driver), so exact
    distinct works at any cardinality without collecting the key set."""
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce

    ds = rd.read_parquet(transcripts_dir(sf_dir), columns=["conv_id"])
    interior, boundary = keyed_reduce(ds, ["conv_id"],
                                      {"c": ("conv_id", "count")},
                                      batch_format="pyarrow")
    n = interior.count() + len(boundary)
    return pd.DataFrame({"n_convs": pd.array([n], dtype=np.int64)})


def t_drift(sf_dir):
    """Per-shard KS/PSI of text length vs the clean baseline digests
    (sketch-based — rows-only). Baseline and per-shard digests are both
    built DISTRIBUTED (per-batch partials, driver merge), not by serial
    per-file re-reads."""
    from .. import drift as drift_mod

    # baseline: digests from the CLEAN generator at the same sf
    clean_dir = ensure_transcripts(sf_name_of(sf_dir), clean=True)
    base = drift_mod.baseline_from_json(
        drift_mod.build_baseline(clean_dir))["text_len"]
    per_shard = drift_mod.per_shard_digests(transcripts_dir(sf_dir))
    scored = drift_mod.score_partitions(per_shard, base)
    rows = [
        {"shard": s, "ks": v["ks"], "psi": v["psi"], "drifted": v["drifted"]}
        for s, v in sorted(scored.items())
    ]
    return pd.DataFrame(rows)


def t_drift_exact(sf_dir):
    """Per-shard EXACT drift verdict — the hash-green twin of the digest
    t_drift: fixed-edge text-length histograms (the t_textlen_hist
    building block) feed drift.psi_from_counts against the all-shards
    baseline. Output keeps the float PSI OUT of the hashed columns: per
    shard the exact row count and the threshold indicator (margin to the
    0.005 threshold is >2x at both fixture SFs; the pytest suite pins the
    PSI values themselves)."""
    from ..drift import psi_from_counts

    hist = t_textlen_hist(sf_dir)
    n_bins = 7  # edges [1,50,100,200,400,800] -> bins 0..6
    shards = sorted(hist["shard"].unique())
    vecs = {}
    for s in shards:
        v = np.zeros(n_bins)
        sub = hist[hist["shard"] == s]
        v[sub["bin"].to_numpy()] = sub["n"].to_numpy()
        vecs[s] = v
    base = sum(vecs.values())
    return pd.DataFrame({
        "shard": shards,
        "n_rows": pd.array([int(vecs[s].sum()) for s in shards],
                           dtype=np.int64),
        "drifted": pd.array(
            [int(psi_from_counts(vecs[s], base) > 0.005) for s in shards],
            dtype=np.int64),
    })


# ---------------------------------------------------------------------------
# generic-table validation + data-pipeline operators over the testdata
# ---------------------------------------------------------------------------


def events_registry():
    from ..registry import RuleRegistry
    from ..rules import RuleSpec

    return RuleRegistry(
        version="1.0.0-events",
        rules=[
            RuleSpec("EV_TYPE_VOCAB", "in_set", "event_type",
                     {"values": ["view", "click", "purchase", "signup"]},
                     "WARNING", "1"),
            RuleSpec("EV_VALUE_RANGE", "range", "value",
                     {"min": 0.0, "max": 400.0}, "ERROR", "1"),
            RuleSpec("EV_TS_WINDOW", "ts_window", "ts",
                     {"min": "2024-01-01T00:00:00", "max": "2024-02-01T00:00:00"},
                     "ERROR", "1"),
        ],
    )


def _events_row_rules():
    """Zero-arg actor class: constructor args in the object store trip Ray's
    actor-restart warning (ray#53727), so the registry binds via a module-
    level factory instead of fn_constructor_kwargs."""
    from ..stages.rowstage import RowRulesOnly

    class EventsRowRules(RowRulesOnly):
        def __init__(self):
            super().__init__(registry_factory=events_registry,
                             key_cols=["event_id"])

    return EventsRowRules


def events_validate(sf_dir):
    """Generic-table surface: the same row-rule compiler applied to the
    events table, keyed by event_id."""
    import ray.data as rd

    # prune to the columns the rule suite touches; compiled-rule state is
    # light, so run as ELASTIC STATELESS TASKS (instance pickled once, warm
    # worker pool reused) — an actor pool here pays its spin-up on every
    # call and caps read parallelism at the pool size (same reasoning as
    # ValidateBatch; pass the CLASS + concurrency for heavy-state suites)
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type", "value", "ts"],
                         override_num_blocks=_nblocks())
    vio = ds.map_batches(
        _events_row_rules()(), batch_format="pyarrow"
    ).to_pandas()
    if "event_id" not in vio.columns:
        return pd.DataFrame(columns=["event_id", "rule_id", "severity"])
    out = vio[["event_id", "rule_id", "severity"]].copy()
    out["event_id"] = out["event_id"].astype(np.int64)
    return out.sort_values(["event_id", "rule_id"]).reset_index(drop=True)


def events_by_type(sf_dir):
    """Low-cardinality keyed reduce with exact integer value sums (cents)."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "events",
                     columns=["event_type", "value", "user_id"])

    def add_cents(df: pd.DataFrame) -> pd.DataFrame:
        df["cents"] = _round_half_away(df["value"] * 100).astype(np.int64)
        return df[["event_type", "cents", "user_id"]]

    out = combine_low_card(
        ds.map_batches(add_cents, batch_format="pandas"),
        ["event_type"],
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum"),
         "min_user": ("user_id", "min"), "max_user": ("user_id", "max")},
    )
    for c in ("n", "sum_cents", "min_user", "max_user"):
        out[c] = out[c].astype(np.int64)
    return out


def events_props_k(sf_dir):
    """JSON-ish scalar extraction from the props column, summed per type."""
    import ray.data as rd

    ds = _read_table(sf_dir, "events", columns=["event_type", "props"])

    from ..stages.keyed_reduce import combine_low_card

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        df["k"] = (
            df["props"].str.extract(r'"k": ([0-9]+)')[0].astype(np.int64)
        )
        return df[["event_type", "k"]]

    out = combine_low_card(
        ds.map_batches(extract, batch_format="pandas"),
        ["event_type"],
        {"sum_k": ("k", "sum"), "n": ("k", "count")},
    )
    out["sum_k"] = out["sum_k"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def events_daily(sf_dir):
    """Tumbling-window (daily) aggregate per event type — the batch
    re-expression of a time-window groupby (ray_guide streaming-shaped
    pattern; no watermarks needed, the input is a bounded log)."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "events",
                     columns=["event_type", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.floor("D")
        df["cents"] = _round_half_away(df["value"] * 100).astype(np.int64)
        return df[["event_type", "day", "cents"]]

    out = combine_low_card(
        ds.map_batches(bucket, batch_format="pandas"),
        ["event_type", "day"],
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    out["n"] = out["n"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def events_rollup(sf_dir):
    """Multi-level rollup (GROUPING SETS analog): ONE finest-grain
    distributed aggregate over (event_type, day), then the three
    super-aggregate levels derived from the compact finest frame on the
    driver — the scale-right rollup shape (the second pass touches ~150
    partial rows, never the log). Rolled-up keys are marked '__all__' /
    day_us = -1 so every level stays in one integer-exact result."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "events",
                     columns=["event_type", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.floor("D")
        df["cents"] = _round_half_away(df["value"] * 100).astype(np.int64)
        return df[["event_type", "day", "cents"]]

    finest = combine_low_card(
        ds.map_batches(bucket, batch_format="pandas"),
        ["event_type", "day"],
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    finest["day_us"] = finest["day"].astype("datetime64[us]") \
        .astype(np.int64)
    finest = finest[["event_type", "day_us", "n", "sum_cents"]]
    by_type = finest.groupby("event_type", as_index=False)[
        ["n", "sum_cents"]].sum().assign(day_us=np.int64(-1))
    by_day = finest.groupby("day_us", as_index=False)[
        ["n", "sum_cents"]].sum().assign(event_type="__all__")
    total = pd.DataFrame({"event_type": ["__all__"],
                          "day_us": np.array([-1], np.int64),
                          "n": [finest["n"].sum()],
                          "sum_cents": [finest["sum_cents"].sum()]})
    out = pd.concat([finest, by_type, by_day, total], ignore_index=True)
    for c in ("day_us", "n", "sum_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["event_type", "day_us", "n", "sum_cents"]]
            .sort_values(["event_type", "day_us"]).reset_index(drop=True))


def t_clean_rows(sf_dir):
    """The gate's PRODUCT: export the validated-clean view (pipelines/
    export.write_clean_output — conversation-level and row-level exclusions
    from the run's own violations artifact, whole-row duplicates collapsed)
    and count survivors per shard; the oracle restates the full survivor
    predicate in SQL."""
    _, vio = run_validation(sf_dir)
    d = transcripts_dir(sf_dir)

    from .export import write_clean_output

    out_dir = os.path.join("/tmp/bdvr_clean", os.path.basename(d))
    write_clean_output(d, out_dir, violations=vio)
    cl = pd.read_parquet(out_dir, columns=["shard"])
    out = cl.groupby("shard").size().reset_index(name="n")
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("shard").reset_index(drop=True)


def t_textlen_hist(sf_dir):
    """Per-shard exact text-length histogram at fixed edges — the
    deterministic twin of the drift stage's digest-derived PSI bins
    (profile.histogram_fixed; oracle states each bin as a sum of
    threshold indicators)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.profile import histogram_fixed

    d = transcripts_dir(sf_dir)
    files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
    ds = rd.read_parquet(files, columns=["text"], include_paths=True)

    def prep(t: pa.Table) -> pa.Table:
        shard = pc.replace_substring_regex(t["path"], r"^.*/", "")
        return pa.table({"shard": shard,
                         "text_len": pc.utf8_length(t["text"])})

    lens = ds.map_batches(prep, batch_format="pyarrow")
    return histogram_fixed(lens, "text_len", [1, 50, 100, 200, 400, 800],
                           by=["shard"])


def t_turn_gaps(sf_dir):
    """Per-conversation response-latency summary (max inter-turn timestamp
    gap in turn order) via the sorted-stream gap operator
    (functions/windows.gap_stats); oracle is a lag() window in SQL."""
    import ray.data as rd

    from ..functions.windows import gap_stats

    ds = rd.read_parquet(transcripts_dir(sf_dir),
                         columns=["conv_id", "turn_idx", "ts"])
    out = gap_stats(ds, key="conv_id", order_cols=["turn_idx"], ts_col="ts")
    out = out.rename(columns={"key": "conv_id"})
    return out.sort_values("conv_id").reset_index(drop=True)


def events_head_per_type(sf_dir):
    """Deterministic top-3 earliest events per type
    (functions/windows.grouped_top_n); oracle: row_number() window."""
    from ..functions.windows import grouped_top_n

    ds = _read_table(sf_dir, "events",
                     columns=["event_id", "event_type", "ts"])
    out = grouped_top_n(ds, key="event_type", order_cols=["ts", "event_id"],
                        n=3)
    out = out[["event_type", "event_id"]].copy()
    out["event_id"] = out["event_id"].astype(np.int64)
    return out.sort_values(["event_type", "event_id"]).reset_index(drop=True)


def events_value_p50(sf_dir):
    """Exact per-type median of integer cents
    (functions/windows.grouped_percentile_disc) — the hash-green twin of
    the t-digest quantile sketch; oracle via percentile_disc."""
    import ray.data as rd

    from ..functions.windows import grouped_percentile_disc

    ds = _read_table(sf_dir, "events", columns=["event_type", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df["cents"] = _round_half_away(df["value"] * 100).astype(np.int64)
        return df[["event_type", "cents"]]

    out = grouped_percentile_disc(
        ds.map_batches(cents, batch_format="pandas"),
        key="event_type", value_col="cents", q=0.5,
    )
    out = out.rename(columns={"p": "p50_cents"})
    out["p50_cents"] = out["p50_cents"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def t_drift_ks_exact(sf_dir):
    """Per-shard EXACT Kolmogorov–Smirnov statistic against the all-shards
    baseline — the hash-green twin of the digest-based KS in t_drift.
    Text-length CDFs are step functions over the observed integer lengths,
    so KS = max_v |cs(v)·NB − cb(v)·Ns| / (Ns·NB) is an exact RATIONAL;
    the query emits the integer numerator and denominator (no float ever
    enters the hashed columns). Distributed part is one compact keyed
    reduce over (shard, len) counts; the CDF walk runs on that tiny frame."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce_pandas

    d = transcripts_dir(sf_dir)
    files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
    ds = rd.read_parquet(files, columns=["text"], include_paths=True)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        shard = pc.replace_substring_regex(t["path"], r"^.*/", "")
        return pa.table({"shard": shard,
                         "len": pc.utf8_length(t["text"])})

    counts = keyed_reduce_pandas(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["shard", "len"], {"n": ("len", "count")}, batch_format="pyarrow")
    # aggfunc='sum': keyed_reduce already emits one row per (shard, len),
    # but the default 'mean' would silently average rather than error if a
    # duplicate ever slipped through — sum keeps counts counts.
    pv = (counts.pivot_table(index="len", columns="shard", values="n",
                             aggfunc="sum", fill_value=0).sort_index())
    cum = pv.cumsum(axis=0)
    # Python-int arithmetic for the cross products: cs·NB and cb·Ns
    # overflow int64 once Ns·NB approaches 2^63 (~3e9-row shard against a
    # 3e9-row baseline), which would silently break the exact-rational
    # contract. The output columns stay int64 for the oracle; a corpus
    # whose Ns·NB exceeds int64 is rejected loudly instead of wrapping.
    bcum = [int(v) for v in cum.sum(axis=1)]
    nb = bcum[-1]
    shards, n_rows, ks_num, ks_den = [], [], [], []
    for s in cum.columns:
        cs = [int(v) for v in cum[s]]
        n_s = cs[-1]
        if n_s * nb >= 2 ** 63:
            raise OverflowError(
                f"exact KS rational Ns*NB={n_s}*{nb} exceeds int64; "
                "use the t-digest KS (t_drift) at this scale")
        shards.append(s)
        n_rows.append(n_s)
        ks_num.append(max(abs(c * nb - b * n_s)
                          for c, b in zip(cs, bcum)))
        ks_den.append(n_s * nb)
    out = pd.DataFrame({
        "shard": shards,
        "n_rows": np.asarray(n_rows, dtype=np.int64),
        "ks_num": np.asarray(ks_num, dtype=np.int64),
        "ks_den": np.asarray(ks_den, dtype=np.int64),
    })
    return out.sort_values("shard", kind="stable").reset_index(drop=True)


def events_value_p50_cont(sf_dir):
    """Exact per-type INTERPOLATED median (SQL percentile_cont) of integer
    cents via functions/windows.grouped_percentile_cont. Stated as
    2×median, which over integers at q=0.5 is always an integer (frac is 0
    or 0.5) — the same no-float-output discipline as the rest of the
    oracled surface."""
    from ..functions.windows import grouped_percentile_cont

    ds = _read_table(sf_dir, "events", columns=["event_type", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df["cents"] = _round_half_away(df["value"] * 100).astype(np.int64)
        return df[["event_type", "cents"]]

    out = grouped_percentile_cont(
        ds.map_batches(cents, batch_format="pandas"),
        key="event_type", value_col="cents", q=0.5,
    )
    out["p50x2_cents"] = (2.0 * out["p"]).astype(np.int64)
    out = out[["event_type", "p50x2_cents"]]
    return out.sort_values("event_type").reset_index(drop=True)


def events_sessions(sf_dir):
    """Gap-based session windows per user (functions/windows.sessionize:
    sorted-stream partials + boundary stitch — the stateful-windowing
    operator the strictly-batch reference lacks), summarized per user and
    oracle-stated with a lag() window in SQL."""
    from ..functions.windows import session_stats

    ds = _read_table(sf_dir, "events", columns=["user_id", "ts"])
    out = session_stats(ds, key="user_id", ts_col="ts", gap_s=43200)
    out = out.rename(columns={"key": "user_id"})
    out["user_id"] = out["user_id"].astype(np.int64)
    return out


def events_last_view(sf_dir):
    """As-of join against the stream itself (functions/windows.
    asof_last_marker): every event gets the latest 'view' timestamp of the
    same user at-or-before its own ts; events with no prior view drop.
    Oracle: a RANGE window max in SQL."""
    from ..functions.windows import asof_last_marker

    ds = _read_table(sf_dir, "events",
                     columns=["event_id", "user_id", "event_type", "ts"])
    interior, drv = asof_last_marker(
        ds, key="user_id", ts_col="ts", marker_col="event_type",
        marker_value="view", out_cols=["event_id"],
        out_name="last_view_us",
    )
    frames = [drv] if len(drv) else []
    if interior is not None:
        idf = interior.to_pandas()
        if len(idf):
            frames.append(idf)
    if not frames:
        return pd.DataFrame(columns=["event_id", "last_view_us"])
    out = pd.concat(frames, ignore_index=True)
    out["event_id"] = out["event_id"].astype(np.int64)
    out["last_view_us"] = out["last_view_us"].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def cust_orders_join(sf_dir):
    """Broadcast (small-side) join: orders x customer -> revenue per market
    segment. The dimension table ships once via ray.put; each batch does a
    vectorized map — no shuffle (ray_guide join pattern #1)."""
    import ray
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    seg_of = ray.put(cust)
    ds = _read_table(sf_dir, "orders",
                     columns=["o_custkey", "o_totalprice"])

    def joined(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(seg_of)  # vectorized hash merge, not per-row .map
        df["cents"] = _round_half_away(df["o_totalprice"] * 100).astype(np.int64)
        df = df.merge(m, left_on="o_custkey", right_on="c_custkey", how="left")
        return df[["c_mktsegment", "cents"]]

    out = combine_low_card(
        ds.map_batches(joined, batch_format="pandas"),
        ["c_mktsegment"],
        {"n_orders": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def part_units(sf_dir):
    """Unit-extraction + distinct-units counting (mixed-units rule family,
    sample_metadata_validator.py:366-442): trailing token of p_name as the
    'unit' vocabulary, counted with a zero-shuffle low-card combine."""
    import ray.data as rd

    from ..functions.profile import extract_value_counts

    ds = _read_table(sf_dir, "part", columns=["p_name"])
    out = extract_value_counts(ds, "p_name", r"(\w+)$")
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("unit").reset_index(drop=True)


def cust_status_confound(sf_dir):
    """batch <-> condition confounding analog
    (sample_metadata_validator.py:486-504): per-customer distinct order
    status via one keyed reduce over (custkey, status) pairs."""
    import ray.data as rd

    from ..functions.profile import grouped_nunique

    ds = _read_table(sf_dir, "orders",
                     columns=["o_custkey", "o_orderstatus"])
    g = grouped_nunique(ds, "o_custkey", "o_orderstatus")
    multi = g[g["n_rows"] >= 2]
    return pd.DataFrame({
        "n_multi_order_custs": pd.array([len(multi)], dtype=np.int64),
        "n_confounded": pd.array([int((multi["nunique"] == 1).sum())],
                                 dtype=np.int64),
    })


def role_variants(sf_dir):
    """Naming-variant normalization (organism-naming analog,
    sample_metadata_validator.py:221-268): spelling variants are planted by
    unioning an upper-cased copy of role — the oracle states the identical
    construction."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.profile import variant_groups

    ds = rd.read_parquet(transcripts_dir(sf_dir), columns=["role"])
    upper = ds.map_batches(
        lambda t: pa.table({"role": pc.utf8_upper(t["role"])}),
        batch_format="pyarrow",
    )
    return variant_groups(ds.union(upper), "role")


def li_col_profile(sf_dir):
    """Per-column matrix-style checks in one pass (all-zero / constant /
    all-null / negative / infinite value counts; matrix_validator.py
    family) over lineitem's numeric columns."""
    import ray.data as rd

    from ..functions.profile import column_profile

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read_table(sf_dir, "lineitem", columns=cols)
    return column_profile(ds, cols)


def li_corr_pairs(sf_dir):
    """Column-pair correlation building block (the reference's duplicate-
    sample r > 0.99 check, matrix_validator.py:588-610) as exact integer-
    scaled second-moment sums per pair — hash-green where float r would
    drift; pearson_of_pair_stats derives r driver-side."""
    from ..functions.profile import column_pair_stats

    ds = _read_table(sf_dir, "lineitem",
                     columns=["l_quantity", "l_extendedprice", "l_discount",
                              "l_tax"])
    return column_pair_stats(ds, {
        "l_quantity": 1, "l_extendedprice": 1,
        "l_discount": 10000, "l_tax": 10000,
    })


def cust_enrich(sf_dir):
    """Stateful enrichment stage (stages/enrich.EnrichStage): orders stream
    through an actor pool whose customer reference index is built once per
    actor; a third of the customers (custkey % 3 == 0) are withheld so the
    miss path is exercised. Result: order counts per enriched segment plus
    the '__miss__' bucket — oracle-stated as a LEFT JOIN against the same
    filtered reference."""
    import ray
    import ray.data as rd

    from ..stages.enrich import EnrichStage
    from ..stages.keyed_reduce import combine_low_card

    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust[cust["c_custkey"] % 3 != 0])
    ds = _read_table(sf_dir, "orders", columns=["o_custkey"])
    enriched = ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs=dict(key_col="o_custkey", ref_key="c_custkey",
                                   add_cols=["c_mktsegment"], ref_data=ref),
        batch_format="pandas", concurrency=2, max_restarts=0,
    )
    seg = enriched.map_batches(
        lambda df: pd.DataFrame({"segment": df["c_mktsegment"].fillna("__miss__")}),
        batch_format="pandas",
    )
    out = combine_low_card(seg, ["segment"], {"n": ("segment", "count")})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("segment").reset_index(drop=True)


def li_orders_join(sf_dir):
    """lineitem x orders join keyed on orderkey, fully distributed: the fact
    side pre-aggregates per order inside map_batches + the sorted interior
    reduce (per-order partials stay a Dataset — neither side is collected),
    then a hash join attaches o_orderstatus and a zero-shuffle low-card
    combine produces the 3-row result. Orders is NOT a small side, so no
    broadcast anywhere."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card, keyed_reduce

    li = _read_table(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_quantity"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df["qty"] = _round_half_away(df["l_quantity"]).astype(np.int64)
        return df[["l_orderkey", "qty"]]

    interior, boundary = keyed_reduce(
        li.map_batches(prep, batch_format="pandas"),
        ["l_orderkey"],
        {"n_items": ("qty", "count"), "sum_qty": ("qty", "sum")},
    )
    per_order = interior
    if len(boundary):
        per_order = per_order.union(rd.from_pandas(boundary))
    orders = _read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_orderstatus"])
    nparts = 8
    # repartition: Ray 2.49 hash join breaks on empty input blocks (see
    # functions/dedup._join_payloads)
    j = per_order.repartition(nparts).join(
        orders.repartition(nparts), "inner", nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    out = combine_low_card(
        j, ["o_orderstatus"],
        {"n_orders": ("n_items", "count"), "n_items": ("n_items", "sum"),
         "sum_qty": ("sum_qty", "sum")},
    )
    for c in ("n_orders", "n_items", "sum_qty"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def cust_top_orders(sf_dir):
    """TPC-H Q3-shaped 3-table pipeline (shipping-priority analog):
    BUILDING-segment customers ⋈ pre-cutoff orders ⋈ post-cutoff lineitems,
    integer revenue (price_cents x (10000 - disc_bp)), global top 10 by
    revenue. Shape: the filtered customer KEY SET broadcasts once (small
    side), orders filter vectorized per batch against it, lineitem
    pre-aggregates per order through the keyed reduce, one hash join
    attaches order attributes, and the top-10 is local-per-block + a tiny
    driver merge — no global sort, nothing large collected."""
    import ray
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce

    cutoff = np.datetime64("1998-01-01")
    cust = _read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_mktsegment"])
    keys = (
        cust.map_batches(
            lambda df: df.loc[df["c_mktsegment"] == "BUILDING",
                              ["c_custkey"]],
            batch_format="pandas")
        .to_pandas()["c_custkey"].to_numpy()
    )
    keys_ref = ray.put(np.sort(keys.astype(np.int64)))

    orders = _read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_orderpriority"])

    def o_filter(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        m = (df["o_orderdate"].to_numpy() < cutoff) & np.isin(
            df["o_custkey"].to_numpy().astype(np.int64), ks,
            assume_unique=False)
        out = df.loc[m, ["o_orderkey", "o_orderdate", "o_orderpriority"]]
        out["o_date_us"] = out["o_orderdate"].astype("datetime64[us]") \
            .astype(np.int64)
        return out[["o_orderkey", "o_date_us", "o_orderpriority"]]

    li = _read_table(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_extendedprice", "l_discount",
                              "l_shipdate"])

    def l_prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"].to_numpy() > cutoff]
        price = _round_half_away(df["l_extendedprice"] * 100).astype(np.int64)
        disc = _round_half_away(df["l_discount"] * 10000).astype(np.int64)
        return pd.DataFrame({"l_orderkey": df["l_orderkey"].astype(np.int64),
                             "rev": price * (10000 - disc)})

    interior, boundary = keyed_reduce(
        li.map_batches(l_prep, batch_format="pandas"),
        ["l_orderkey"], {"revenue_u": ("rev", "sum")},
    )
    per_order = interior
    if len(boundary):
        per_order = per_order.union(rd.from_pandas(boundary))
    nparts = 8
    j = per_order.repartition(nparts).join(
        orders.map_batches(o_filter, batch_format="pandas")
        .repartition(nparts),
        "inner", nparts, on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["revenue_u", "l_orderkey"],
                            ascending=[False, True], kind="stable")
        return df.head(10)

    out = (j.map_batches(local_top, batch_format="pandas").to_pandas()
           .sort_values(["revenue_u", "l_orderkey"],
                        ascending=[False, True], kind="stable").head(10))
    out = out.rename(columns={"l_orderkey": "o_orderkey"})
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    out["revenue_u"] = out["revenue_u"].astype(np.int64)
    return out[["o_orderkey", "revenue_u", "o_date_us",
                "o_orderpriority"]].reset_index(drop=True)


def doc_dedup_exact(sf_dir):
    import ray.data as rd

    from ..functions.dedup import exact_dedup_groups

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = exact_dedup_groups(ds)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_copies"] = out["n_copies"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_token_count(sf_dir):
    import ray.data as rd

    from ..functions.textstats import add_token_count

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = (
        ds.map_batches(add_token_count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_quality(sf_dir):
    import ray.data as rd

    from ..functions.textstats import add_quality_metrics

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = (
        ds.map_batches(add_quality_metrics, batch_format="pyarrow")
        .select_columns(["doc_id", "n_chars", "n_alpha", "n_digit", "n_punct"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_fingerprint(sf_dir):
    import ray.data as rd

    from ..functions.textstats import add_fingerprint

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = (
        ds.map_batches(add_fingerprint, batch_format="pandas")
        .to_pandas()[["doc_id", "fingerprint"]]
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_langid(sf_dir):
    """Stopword-vote language ID (rows-only). Note: the fixture's `lang`
    column is a random label uncorrelated with the generated text (all docs
    share one English-ish token vocabulary; measured agreement ~0.38 ==
    the majority-class share), so prediction ACCURACY is gated in pytest
    against a corpus whose language is real
    (tests/test_functions.py::test_langid_accuracy_gate), not here."""
    import ray.data as rd

    from ..functions.textstats import LangId

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text", "lang"])
    out = ds.map_batches(
        LangId, batch_format="pandas", concurrency=2, max_restarts=0
    ).to_pandas()[["doc_id", "lang", "lang_pred"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_quality_filter(sf_dir):
    """C4-style quality culling (textstats.add_quality_filter): per doc a
    keep flag and the first failing rule, integer-exact vs a CASE-chain
    oracle."""
    import ray.data as rd

    from ..functions.textstats import add_quality_filter

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = ds.map_batches(add_quality_filter, batch_format="pyarrow") \
        .select_columns(["doc_id", "keep", "reason"]).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_curate(sf_dir):
    """The composed curation flagship (pipelines/curate.py) over the
    planted-duplicate table: quality filter (min_tokens=30; the fixture's
    token-soup docs never end in punctuation, so the terminal rule is off)
    + exact/near duplicate canonicalization — every branch of the verdict
    (quality reasons, canonical, exact_dup, near_dup) is exercised and the
    whole decision hash-matches a CASE chain + window-minima SQL oracle."""
    from .curate import curate_documents

    return curate_documents(_planted_docs(sf_dir), min_tokens=30,
                            require_terminal_punct=False)


def doc_sample_per_source(sf_dir):
    """Deterministic stratified sampling: 2 documents per source, chosen by
    md5(text) order (a pseudo-random but reproducible draw both engines
    can state) — grouped_top_n over the fingerprint; oracle via
    row_number() over md5."""
    import ray.data as rd

    from ..functions.textstats import add_fingerprint
    from ..functions.windows import grouped_top_n

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "source", "text"])
    fp = ds.map_batches(add_fingerprint, batch_format="pandas") \
        .map_batches(lambda df: df[["source", "fingerprint", "doc_id"]],
                     batch_format="pandas")
    out = grouped_top_n(fp, key="source",
                        order_cols=["fingerprint", "doc_id"], n=2)
    out = out[["source", "doc_id"]].copy()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def doc_word_counts(sf_dir):
    """Distributed vocabulary building (textstats.word_counts): top-50
    whitespace tokens by frequency; oracle via unnest(string_split_regex)."""
    import ray.data as rd

    from ..functions.textstats import word_counts

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["text"])
    return word_counts(ds, top_k=50)


def doc_normalize(sf_dir):
    """Canonical text normalization (textstats.normalize_text: lower +
    collapse whitespace runs + trim — the standard dedup preprocessor),
    summarized per doc as (norm_len, norm_md5) so raw text never reaches
    the compare. pyarrow and DuckDB both run RE2, so the oracle is
    lower/regexp_replace/trim verbatim."""
    import hashlib as _hl

    import pyarrow as pa

    from ..functions.textstats import normalize_text

    import pyarrow.compute as pc

    ds = _read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def summarize(t: pa.Table) -> pd.DataFrame:
        # null text is excluded in BOTH engines (the oracle states
        # WHERE text IS NOT NULL); lengths come from the vectorized
        # utf8_length kernel — only the md5 loop is per-row Python
        t = normalize_text(t.filter(pc.is_valid(t["text"])))
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "norm_len": pc.utf8_length(t["norm_text"]).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "norm_md5": [_hl.md5(x.encode("utf-8")).hexdigest()
                         for x in t["norm_text"].to_pylist()],
        })

    out = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_weighted_sample(sf_dir):
    """Weight-proportional 100-doc draw (windows.weighted_sample: DLT
    priority sampling, weight = n_chars) — the domain-reweighting sampler
    of pretraining mixes, with a fully integer ordering (h32 * 2^31 // w,
    ties on doc_id) so the DuckDB oracle states the identical draw."""
    from ..functions.windows import weighted_sample

    ds = _read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = weighted_sample(ds, k=100, id_col="doc_id",
                          weight_col="n_chars",
                          columns=["doc_id", "n_chars"])
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_uniform_sample(sf_dir):
    """Deterministic uniform 100-doc sample (windows.uniform_sample): the
    100 smallest splitmix64(doc_id) rows — reproducible corpus
    subsampling with no shuffle and no full collect. The oracle restates
    the exact mixer in SQL (xor/shift + mod-2^64 multiplies done as
    32-bit-split HUGEINT products) and takes ORDER BY h LIMIT 100."""
    from ..functions.windows import uniform_sample

    ds = _read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = uniform_sample(ds, k=100, id_col="doc_id",
                         columns=["doc_id", "n_chars"])
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_temp_sample(sf_dir):
    """Sqrt-temperature mixture sampling (windows.temperature_sample) over
    the skewed lang column: each language contributes floor(sqrt(count))
    docs in md5(text) draw order — the multilingual balancing rule. Oracle:
    row_number() over md5 joined to per-group floor(sqrt(count(*)))."""
    from ..functions.textstats import add_fingerprint
    from ..functions.windows import temperature_sample

    ds = _read_table(sf_dir, "documents",
                     columns=["doc_id", "lang", "text"])
    fp = ds.map_batches(add_fingerprint, batch_format="pandas") \
        .map_batches(lambda df: df[["lang", "fingerprint", "doc_id"]],
                     batch_format="pandas")
    out = temperature_sample(fp, key="lang",
                             order_cols=["fingerprint", "doc_id"])
    out = out[["lang", "doc_id"]].copy()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def doc_decontam(sf_dir):
    """Benchmark decontamination (dedup.decontaminate): docs 0-19 act as
    the held-out eval set; every training doc (id >= 20) is checked for a
    shared 8-word shingle. Contamination is PLANTED so the op has signal:
    docs with id % 5 == 2 get the first 8 words of benchmark doc
    (id % 20) appended — restated verbatim in the oracle, like the PII
    plant. The eval-side shingle strings broadcast once per actor; the
    corpus side streams with no shuffle."""
    import ray.data as rd

    docs = _read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] < 20], batch_format="pandas"
    ).to_pandas().sort_values("doc_id")
    frag = {int(i): " ".join(t.split()[:8])
            for i, t in zip(bench["doc_id"], bench["text"])}

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] >= 20].reset_index(drop=True)
        hit = (df["doc_id"] % 5 == 2).to_numpy()
        if hit.any():
            add = df.loc[hit, "doc_id"].map(
                lambda i: " " + frag[int(i) % 20])
            df.loc[hit, "text"] = df.loc[hit, "text"] + add
        return df

    from ..functions.dedup import decontaminate

    out = decontaminate(
        docs.map_batches(plant, batch_format="pandas"),
        bench["text"].tolist(), n=8,
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_tfidf(sf_dir):
    """TF-IDF document scoring (textstats.tfidf_scores): per-doc integer
    score sum and arg-max term, with idf in exact ppm units so the whole
    computation is int64 and order-independent — no float log anywhere.
    Distributed df through the keyed reduce, scoring via one object-store
    broadcast per actor."""
    from ..functions.textstats import tfidf_scores

    ds = _read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf_scores(ds).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_top_words_sketch(sf_dir):
    """Heavy hitters via the bounded-memory SpaceSaving sketch
    (textstats.heavy_hitter_words): one <= k-counter sketch per block,
    merged driver-side — the zero-shuffle vocabulary path. Run in its
    exact regime (k = 65536 >= |test vocabulary|, err_bound 0) so the hash
    oracle applies; the truncating regime's error bound is pinned by
    pytest (test_sketches)."""
    import ray.data as rd

    from ..functions.textstats import heavy_hitter_words

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["text"])
    out = heavy_hitter_words(ds, top_n=20)
    assert out.attrs.get("err_bound", 0) == 0, "exact regime expected"
    return out


def doc_minhash_pairs(sf_dir):
    import ray.data as rd

    from ..functions.dedup import minhash_near_dups

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    return minhash_near_dups(ds, threshold=0.8)


def _planted_docs(sf_dir):
    """documents ∪ id-shifted copy (doc_id + 100000) — the same
    planted-duplicate construction as emb_near_dups, restated by the oracle
    SQL: every (i, i+100000) pair is an exact duplicate by construction, so
    a near-dup pipeline run at its exactness point must surface it."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])

    def ident(t: "pa.Table") -> "pa.Table":
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "text": t["text"]})

    def shift(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "doc_id": pc.add(t["doc_id"].cast(pa.int64()), 100000),
            "text": t["text"],
        })

    return ds.map_batches(ident, batch_format="pyarrow").union(
        ds.map_batches(shift, batch_format="pyarrow")
    )


def doc_minhash_planted(sf_dir):
    """MinHash+LSH with a hash oracle: mine the planted-duplicate table at
    threshold 1.0 — a pair surfaces iff the two texts have IDENTICAL 5-gram
    shingle sets (exact Jaccard 1.0), which the oracle states in SQL as
    group-by-shingle-set. Identical text => identical signature => same
    bucket in every band, so recall of planted pairs is guaranteed, and the
    exact verify keeps precision exact (natural set-equal near-dups in the
    fixture are matched by the same SQL)."""
    from ..functions.dedup import minhash_near_dups

    out = minhash_near_dups(_planted_docs(sf_dir), threshold=1.0)
    return out[["id_a", "id_b"]]


def doc_ngram_planted(sf_dir):
    """Word n-gram Jaccard dedup (ngram_jaccard_dups: the MinHash skeleton
    over hashed word-3-gram sets) under the same planted-duplicate hash
    oracle — a pair surfaces at threshold 1.0 iff the two texts' word
    3-gram SETS are identical, stated in SQL over split + array_to_string
    n-grams."""
    from ..functions.dedup import ngram_jaccard_dups

    out = ngram_jaccard_dups(_planted_docs(sf_dir), threshold=1.0, n=3)
    return out[["id_a", "id_b"]]


def doc_simhash_planted(sf_dir):
    """The SimHash banding + stitch + join skeleton under the same hash
    oracle: simhash_exact_dups buckets by the full 64-bit simhash (the
    max_hamming=0 pigeonhole band) and verifies exact Jaccard == 1.0; equal
    shingle sets imply equal simhashes, so the oracle is the identical
    group-by-shingle-set SQL."""
    from ..functions.dedup import simhash_exact_dups

    out = simhash_exact_dups(_planted_docs(sf_dir))
    return out[["id_a", "id_b"]]


def doc_token_bpe(sf_dir):
    """BPE-pre-tokenizer-shaped token count (letter runs / digits /
    punctuation), oracle-stated with regexp_extract_all."""
    import ray.data as rd

    from ..functions.textstats import add_token_count_bpe

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = (
        ds.map_batches(add_token_count_bpe, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens_bpe"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_simhash_dups(sf_dir):
    """SimHash near-dup mining over documents via the pigeonhole-banded
    distributed pipeline (rows-only: hamming thresholds are not
    SQL-expressible; unit tests pin planted pairs and path equality)."""
    import ray.data as rd

    from ..functions.dedup import simhash_near_dups

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=3)


def doc_simhash(sf_dir):
    import ray.data as rd

    from ..functions.dedup import add_simhash

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = ds.map_batches(add_simhash, batch_format="pandas").to_pandas()[
        ["doc_id", "simhash"]
    ]
    return out.sort_values("doc_id").reset_index(drop=True)


def _query_vec(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    emb = t.filter(
        __import__("pyarrow").compute.equal(t["vec_id"], 0)
    )["embedding"].to_pylist()[0]
    return np.asarray(emb, dtype=np.float64)


def emb_topk(sf_dir):
    import ray.data as rd

    from ..functions.similarity import topk_cosine

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         override_num_blocks=_nblocks())
    out = topk_cosine(ds, _query_vec(sf_dir), k=10)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out


def emb_topk_ids(sf_dir):
    """Top-k neighbor IDs only (integers hash-match; the scored variant stays
    rows-only because DuckDB's list_cosine_similarity computes in float32)."""
    out = emb_topk(sf_dir)[["vec_id"]].copy()
    return out


def _ivf_store(sf_dir):
    """Build-or-open the materialized IVF store for a fixture dir. The cache
    path is keyed on a FINGERPRINT of embeddings.parquet (size + mtime), not
    just the directory name — a regenerated fixture gets a fresh partition
    layout instead of silently reusing a stale one."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.similarity import IVFIndex, IVFStore

    src = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(src)
    sample = np.stack(t["embedding"].to_pylist()[:512])
    index = IVFIndex.train(sample, n_lists=8)
    st = os.stat(src)
    store_path = os.path.join(
        "/tmp/bdvr_ivf",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{st.st_size}-{int(st.st_mtime_ns)}",
    )
    if not os.path.isdir(store_path):
        ds = rd.read_parquet(src, override_num_blocks=_nblocks())
        return IVFStore.build(ds, index, store_path)
    return IVFStore(index, store_path)


def emb_ivf_topk(sf_dir):
    """ANN via the materialized IVF store: the assignment is written once as
    ivf_list-partitioned Parquet (hive layout) and every probe is a
    partition-pruned read — the at-scale layout, not a per-query rescan."""
    out = _ivf_store(sf_dir).topk(_query_vec(sf_dir), k=10, nprobe=3)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out


def emb_ivf_topk_full(sf_dir):
    """IVF with nprobe == n_lists: probing every partition makes the ANN
    exact, so the partition-pruned read path itself gets a DuckDB oracle
    (ID-only to dodge float32 cosine rounding)."""
    out = _ivf_store(sf_dir).topk(_query_vec(sf_dir), k=10, nprobe=8)
    return pd.DataFrame({"vec_id": out["vec_id"].astype(np.int64)})


def emb_quantize(sf_dir):
    """Symmetric int8 embedding quantization, exploded per component
    (similarity.quantize_embeddings) — integer-exact against the SQL
    round() oracle."""
    import ray.data as rd

    from ..functions.similarity import quantize_embeddings

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         override_num_blocks=_nblocks())
    return quantize_embeddings(ds)


def emb_cluster_assign(sf_dir):
    """Nearest-centroid assignment over quantized embeddings (centroids =
    the 8 lowest vec_ids, integer squared-L2, ties to lowest centroid) —
    the SemDeDup bucketing step, exact against the exploded-join oracle."""
    import ray.data as rd

    from ..functions.similarity import cluster_assign

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["vec_id", "embedding"])
    out = cluster_assign(ds, n_clusters=8).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def emb_semdedup(sf_dir):
    """SemDeDup over the union-shifted table: each planted copy (vec_id +
    100000, identical vector) must land in its original's cluster at
    distance 0 and be dropped (keep = false); originals survive unless a
    natural earlier neighbor sits within the radius."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.similarity import semdedup

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["vec_id", "embedding"])

    def shift(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": pc.add(t["vec_id"].cast(pa.int64()), 100000),
            "embedding": t["embedding"],
        })

    both = ds.map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"].cast(pa.int64()),
                            "embedding": t["embedding"]}),
        batch_format="pyarrow",
    ).union(ds.map_batches(shift, batch_format="pyarrow"))
    out = semdedup(both, n_clusters=8, radius2=50).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def emb_near_dups(sf_dir):
    """LSH-bucketed embedding near-dup pairs, DuckDB-oracle-checked: the
    fixture has no natural pairs above 0.9, so the query plants exact
    duplicates by unioning an id-shifted copy of the table (the same
    construction the oracle SQL states) and returns ID-only pairs at
    threshold 0.999 — every (i, i+100000) pair must surface."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.dedup import embedding_near_dups

    ds = _read_table(sf_dir, "embeddings")

    def dup(t: pa.Table) -> pa.Table:
        # emit original + id-shifted copy in ONE stage: a union of two
        # map_batches over the same read doubled the per-block task count
        # for zero parallelism gain at this table size
        ids = t["vec_id"].cast(pa.int64())
        return pa.table({
            "vec_id": pa.concat_arrays([
                ids.combine_chunks(),
                pc.add(ids, 100000).combine_chunks()]),
            "embedding": pa.concat_arrays(
                [t["embedding"].combine_chunks()] * 2),
        })

    out = embedding_near_dups(ds.map_batches(dup, batch_format="pyarrow"),
                              threshold=0.999)
    return out[["id_a", "id_b"]]


def doc_repetition(sf_dir):
    """Gopher-style repetition signals (word/2-gram totals, distincts, and
    max frequency per doc) — integer-exact against the unnest/group SQL."""
    import ray.data as rd

    from ..functions.textstats import repetition_stats

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    out = (
        repetition_stats(ds)
        .select_columns(["doc_id", "n_words", "n_distinct_words",
                         "top_word_n", "n_bigrams", "n_distinct_bigrams",
                         "top_bigram_n"])
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _plant_pii(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic PII suffix by doc_id % 4 — the concatenation the
    oracle SQL (_PII_DOCS_SQL CASE) states verbatim."""
    ids = df["doc_id"].astype(np.int64)
    m = (ids % 4).to_numpy()
    s1 = (" reach u" + ids.astype(str) +
          "@example.com or +1-202-555-0147")
    s2 = " ssn 123-45-6789 ip 10.0.3." + (ids % 200).astype(str)
    suffix = np.select(
        [m == 1, m == 2, m == 3],
        [s1.to_numpy(), s2.to_numpy(),
         " mail a.b-c@x.co.uk call +44-700-900-1234"],
        default="",
    )
    return pd.DataFrame({"doc_id": ids,
                         "text": df["text"].to_numpy() + suffix})


def _pii_augmented_docs(sf_dir):
    """documents with deterministic PII planted by doc_id % 4 (the fixture's
    token-soup text contains none) — the oracle SQL states the identical
    concatenation, so detection/redaction compare exactly."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    return ds.map_batches(_plant_pii, batch_format="pandas")


def doc_pii(sf_dir):
    """Per-doc PII counts (email / phone / SSN-shaped / IPv4) via Arrow RE2
    kernels over the planted corpus — row-local scan, no shuffle."""
    from ..functions.pii import scan_pii

    out = (
        scan_pii(_pii_augmented_docs(sf_dir))
        .select_columns(["doc_id", "n_email", "n_phone", "n_ssn",
                         "n_ipv4", "n_pii"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_pii_redact(sf_dir):
    """Sequential PII redaction ([EMAIL]/[PHONE]/[SSN]/[IPV4] placeholders);
    the redacted text itself is the compared value."""
    from ..functions.pii import redact_dataset

    out = redact_dataset(_pii_augmented_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def li_pricing(sf_dir):
    """lineitem pricing summary (classic GA sanity pipeline) with exact
    integer money/quantity columns."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df["qty"] = _round_half_away(df["l_quantity"]).astype(np.int64)
        df["price_cents"] = _round_half_away(df["l_extendedprice"] * 100).astype(np.int64)
        df["disc_bp"] = _round_half_away(df["l_discount"] * 10000).astype(np.int64)
        return df[["l_returnflag", "l_linestatus", "qty", "price_cents", "disc_bp"]]

    out = combine_low_card(
        ds.map_batches(cents, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("qty", "sum"), "sum_price_cents": ("price_cents", "sum"),
         "sum_disc_bp": ("disc_bp", "sum"), "n": ("qty", "count")},
    )
    for c in ("sum_qty", "sum_price_cents", "sum_disc_bp", "n"):
        out[c] = out[c].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# registry of queries + oracles
# ---------------------------------------------------------------------------

def cust_no_urgent(sf_dir):
    """Anti-join: customers with NO urgent order, counted per market
    segment. The urgent-customer key set reduces to compact distinct keys
    first (keyed reduce over pre-deduped partials), broadcasts once via
    ray.put, and the customer scan filters against it vectorized — the
    broadcast anti-join that replaces a shuffle for a small-side exclusion
    list (ray_guide join pattern #1, negated)."""
    import ray
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card, keyed_reduce

    orders = _read_table(sf_dir, "orders",
                         columns=["o_custkey", "o_orderpriority"])

    def urgent_keys(df: pd.DataFrame) -> pd.DataFrame:
        return (df.loc[df["o_orderpriority"] == "1-URGENT", ["o_custkey"]]
                .drop_duplicates())

    interior, boundary = keyed_reduce(
        orders.map_batches(urgent_keys, batch_format="pandas"),
        ["o_custkey"], {"c": ("o_custkey", "count")},
    )
    keys = np.unique(np.concatenate([
        interior.select_columns(["o_custkey"]).to_pandas()["o_custkey"]
        .to_numpy(np.int64),
        boundary["o_custkey"].to_numpy(np.int64) if len(boundary)
        else np.array([], np.int64),
    ]))
    keys_ref = ray.put(keys)
    cust = _read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_mktsegment"])

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keys_ref)
        mask = ~df["c_custkey"].isin(k)
        return df.loc[mask, ["c_mktsegment"]]

    out = combine_low_card(
        cust.map_batches(anti, batch_format="pandas"),
        ["c_mktsegment"], {"n_custs": ("c_mktsegment", "count")},
    )
    out["n_custs"] = out["n_custs"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def events_mode_type(sf_dir):
    """Grouped MODE with deterministic tie-break: each user's most frequent
    event type (ties -> lexicographically smallest). Level 1 reduces to
    compact (user, type, n) counts through the keyed reduce; the argmax
    runs vectorized over that already-aggregated frame — the raw log never
    feeds the argmax."""
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce_pandas

    ds = _read_table(sf_dir, "events", columns=["user_id", "event_type"])
    counts = keyed_reduce_pandas(
        ds, ["user_id", "event_type"],
        {"n": ("event_type", "count")}, batch_format="pyarrow",
    )
    counts = counts.sort_values(["user_id", "n", "event_type"],
                                ascending=[True, False, True],
                                kind="stable")
    out = counts.groupby("user_id", as_index=False).first()
    out = out.rename(columns={"event_type": "mode_type"})
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return (out[["user_id", "mode_type", "n"]]
            .sort_values("user_id").reset_index(drop=True))


def events_view_no_purchase(sf_dir):
    """Set difference (EXCEPT): users who viewed but never purchased,
    fully distributed — both distinct key sets stay Datasets, a left-outer
    hash join marks membership, and only the count crosses to the driver."""
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce

    ev = _read_table(sf_dir, "events",
                     columns=["user_id", "event_type"])

    def keys_of(kind):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return (df.loc[df["event_type"] == kind, ["user_id"]]
                    .drop_duplicates())
        return f

    def distinct(kind, out_col):
        interior, boundary = keyed_reduce(
            ev.map_batches(keys_of(kind), batch_format="pandas"),
            ["user_id"], {"c": ("user_id", "count")},
        )
        d = interior.select_columns(["user_id"])
        if len(boundary):
            import ray.data as rd2
            d = d.union(rd2.from_pandas(boundary[["user_id"]]))
        return d.map_batches(
            lambda df: df.rename(columns={"user_id": out_col}),
            batch_format="pandas")

    viewers = distinct("view", "user_id")
    buyers = distinct("purchase", "buyer_id")
    n = left_anti_count(viewers, buyers, left_key="user_id",
                        right_key="buyer_id")
    return pd.DataFrame({"n_view_only": [np.int64(n)]})


def left_anti_count(left, right, *, left_key: str, right_key: str,
                    nparts: int = 8) -> int:
    """Distributed left ANTI-join count: rows of ``left`` with no match in
    ``right``. Both sides stay Datasets through the hash join; only the
    per-block unmatched counts cross to the driver. Ray 2.49 quirks handled
    here: the left_outer output keeps only the LEFT key, so membership is
    detectable only through an added right-side marker payload — and blocks
    with zero matches omit the right-side columns entirely."""
    right = right.map_batches(
        lambda df: df.assign(__matched=np.int64(1)), batch_format="pandas")
    j = left.repartition(nparts).join(
        right.repartition(nparts), "left_outer", nparts,
        on=(left_key,), right_on=(right_key,),
    )

    def count_unmatched(df: pd.DataFrame) -> pd.DataFrame:
        if "__matched" not in df.columns:
            return pd.DataFrame({"n": [np.int64(len(df))]})
        return pd.DataFrame({"n": [np.int64(df["__matched"].isna().sum())]})

    return int(j.map_batches(
        count_unmatched, batch_format="pandas",
    ).to_pandas()["n"].sum())


def doc_pretrain_prep(sf_dir):
    """Composed end-to-end pretraining prep over the doubled + PII-planted
    corpus: quality filter (min_tokens=30, terminal rule off — curate.py
    settings) -> PII redaction -> exact dedup on REDACTED text (the planted
    copies carry id-bearing emails/IPs, so they become identical only after
    redaction strips them — dedup order genuinely matters) -> token counts
    -> 4096-token packing via the two-pass prefix scan. Every stage stays
    a Dataset; the driver sees per-(batch,key) partials and the final bin
    table. The oracle restates the whole chain in one SQL pipeline."""
    import ray.data as rd

    from ..functions.dedup import content_hash_batch
    from ..functions.pii import redact_pii
    from ..functions.scan import packed_bins
    from ..functions.textstats import add_quality_filter, add_token_count
    from ..stages.keyed_reduce import keyed_reduce

    aug = _planted_docs(sf_dir).map_batches(
        _plant_pii, batch_format="pandas")

    def keep_quality(t):
        q = add_quality_filter(t, min_tokens=30,
                               require_terminal_punct=False)
        return q.filter(q["keep"]).select(["doc_id", "text"])

    kept = aug.map_batches(keep_quality, batch_format="pyarrow")
    red = kept.map_batches(redact_pii, batch_format="pyarrow")
    tok = red.map_batches(add_token_count, batch_format="pyarrow")
    hashed = tok.map_batches(
        lambda b: content_hash_batch(b)[
            ["content_hash", "doc_id", "n_tokens"]],
        batch_format="pandas",
    )
    interior, boundary = keyed_reduce(
        hashed, ["content_hash"],
        {"doc_id": ("doc_id", "min"), "n_tokens": ("n_tokens", "min")},
    )
    uniq = interior.select_columns(["doc_id", "n_tokens"])
    if len(boundary):
        uniq = uniq.union(rd.from_pandas(boundary[["doc_id", "n_tokens"]]))
    return packed_bins(uniq, order_col="doc_id", value_col="n_tokens",
                       capacity=4096)


def events_retention(sf_dir):
    """Day-over-day retention: the number of (user, day, day+1) active
    pairs. Distinct (user, day) reduces through the keyed reduce, then the
    SESSIONIZE operator (gap = 1 day) counts consecutive-day runs — pairs
    = distinct_rows - sessions, a pure reuse of the compact-partial
    session machinery; the self-join the SQL oracle states never happens."""
    import ray.data as rd

    from ..functions.windows import session_stats
    from ..stages.keyed_reduce import keyed_reduce

    ev = _read_table(sf_dir, "events", columns=["user_id", "ts"])

    def day_of(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": df["user_id"],
                            "day": df["ts"].dt.floor("D")})
        return out.drop_duplicates()

    interior, boundary = keyed_reduce(
        ev.map_batches(day_of, batch_format="pandas"),
        ["user_id", "day"], {"c": ("user_id", "count")},
    )
    distinct = interior.select_columns(["user_id", "day"])
    if len(boundary):
        distinct = distinct.union(
            rd.from_pandas(boundary[["user_id", "day"]]))
    n_rows = distinct.count()
    st = session_stats(distinct.map_batches(
        lambda df: df.rename(columns={"day": "ts"}),
        batch_format="pandas"), key="user_id", ts_col="ts",
        gap_s=86400.0)
    n_sessions = int(st["n_sessions"].sum())
    return pd.DataFrame(
        {"n_retained_pairs": [np.int64(int(n_rows) - n_sessions)]})


def events_value_outliers(sf_dir):
    """Per-GROUP z-score outlier counts (profile.grouped_zscore_outliers):
    |x - mu| > 2*sigma within each event_type, computed EXACTLY — integer
    cents moments per group, an arbitrary-precision isqrt threshold on the
    driver, and a broadcast {group: bound} map for the counting pass. The
    oracle states the squared HUGEINT comparison; both sides evaluate the
    same integer predicate, so no float sigma can diverge."""
    from ..functions.profile import grouped_zscore_outliers

    ev = _read_table(sf_dir, "events", columns=["event_type", "value"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "cents": _round_half_away(
                df["value"].to_numpy() * 100).astype(np.int64),
        })

    return grouped_zscore_outliers(ev, ["event_type"], "cents",
                                   k=2, derive=derive)


def events_attrib_pairs(sf_dir):
    """Bounded-window attribution via the banded range join
    (functions/joins.banded_range_join): every (view, purchase) pair of
    the same user with view.ts in [purchase.ts - 1h, purchase.ts],
    counted per user. The reference has no non-equi join at all (its
    joins are single-process pandas merges, e.g.
    /root/reference/src/validators/sample_metadata.py's batch crosstab);
    here the BETWEEN predicate the oracle states as an inequality join
    runs as interval banding + one hash equi-join on (user_id, band) + a
    vectorized range filter — bounded replication, no sort, and a hot
    user's rows still spread across time bands."""
    from ..functions.joins import banded_range_join
    from ..stages.keyed_reduce import keyed_reduce_pandas

    HOUR_US = 3_600_000_000
    ev = _read_table(sf_dir, "events",
                     columns=["user_id", "event_type", "ts"])

    def views_of(df: pd.DataFrame) -> pd.DataFrame:
        return (df.loc[df["event_type"] == "view", ["user_id", "ts"]]
                .reset_index(drop=True))

    def windows_of(df: pd.DataFrame) -> pd.DataFrame:
        p = df.loc[df["event_type"] == "purchase", ["user_id", "ts"]]
        us = p["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        return pd.DataFrame({"user_id": p["user_id"].to_numpy(),
                             "lo_us": us - HOUR_US, "hi_us": us})

    pairs = banded_range_join(
        ev.map_batches(views_of, batch_format="pandas"),
        ev.map_batches(windows_of, batch_format="pandas"),
        key="user_id", point_ts_col="ts", lo_col="lo_us", hi_col="hi_us",
        band_width_us=HOUR_US)
    out = keyed_reduce_pandas(pairs, ["user_id"],
                              {"n_pairs": ("user_id", "count")})
    if len(out) == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_pairs": pd.Series([], dtype=np.int64)})
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


def orders_daily_cum(sf_dir):
    """Cumulative daily totals (running stock): orders per day with a
    cumulative count and cents sum. The distributed part is one low-card
    combine to ~#days compact rows; the cumulative pass is a driver-side
    cumsum over that already-aggregated frame (scan-over-aggregate, the
    right shape at any scale since #days << #orders)."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "orders",
                     columns=["o_orderdate", "o_totalprice"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": pd.to_datetime(df["o_orderdate"]).dt.floor("D"),
            "cents": _round_half_away(df["o_totalprice"] * 100
                                      ).astype(np.int64),
        })

    daily = combine_low_card(
        ds.map_batches(derive, batch_format="pandas"),
        ["day"], {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    daily = daily.sort_values("day").reset_index(drop=True)
    daily["cum_n"] = daily["n"].cumsum()
    daily["cum_cents"] = daily["sum_cents"].cumsum()
    for c in ("n", "sum_cents", "cum_n", "cum_cents"):
        daily[c] = daily[c].astype(np.int64)
    return daily


def li_not_open_orders(sf_dir):
    """Bloom-prefiltered semi-join (negated): count lineitems whose order
    is NOT an open ('O') order. The reference key set becomes per-block
    Bloom bitsets OR-merged driver-side (fixed m bits at ANY key
    cardinality — the scale replacement for broadcasting raw key sets);
    bloom-negatives are definite non-members and reduce to one count per
    block, and only bloom-POSITIVES take the exact distributed join verify
    — the matched minority plus a ~2e-6 false-positive sliver. Nothing but
    per-block counts and the final scalar ever reaches the driver.
    Reference ancestor: cross-shard referential integrity (SURVEY §2.4)."""
    import ray
    import ray.data as rd

    from ..sketches import BloomFilter, _hash64, dumps, loads
    from ..stages.keyed_reduce import keyed_reduce

    M_BITS, N_HASH = 1 << 22, 5
    orders = _read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_orderstatus"])

    def block_bloom(df: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter(M_BITS, N_HASH)
        keys = df.loc[df["o_orderstatus"] == "O", "o_orderkey"]
        b.add_hashes(_hash64(keys.to_numpy(np.int64)))
        return pd.DataFrame({"b": [dumps(b)]})

    merged = BloomFilter(M_BITS, N_HASH)
    for x in orders.map_batches(block_bloom,
                                batch_format="pandas").to_pandas()["b"]:
        merged.merge(loads(x))
    bref = ray.put(merged)

    li = _read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def split(df: pd.DataFrame) -> pd.DataFrame:
        # one pass: candidate keys weighted 1, plus ONE sentinel row
        # carrying the block's definite-negative count
        b = ray.get(bref)
        k = df["l_orderkey"].to_numpy(np.int64)
        inb = b.contains_hashes(_hash64(k))
        out = pd.DataFrame({"l_orderkey": k[inb]})
        out["w"] = np.int64(1)
        neg = int((~inb).sum())
        if neg:
            out = pd.concat(
                [out, pd.DataFrame({"l_orderkey": [np.int64(-1)],
                                    "w": [np.int64(neg)]})],
                ignore_index=True)
        return out

    interior, boundary = keyed_reduce(
        li.map_batches(split, batch_format="pandas"),
        ["l_orderkey"], {"n": ("w", "sum")},
    )
    per_key = interior
    if len(boundary):
        per_key = per_key.union(rd.from_pandas(boundary))

    # distinct open-order keys, kept distributed
    ki, kb = keyed_reduce(
        orders.map_batches(
            lambda df: (df.loc[df["o_orderstatus"] == "O", ["o_orderkey"]]
                        .drop_duplicates()),
            batch_format="pandas"),
        ["o_orderkey"], {"c": ("o_orderkey", "count")},
    )
    open_keys = ki.select_columns(["o_orderkey"])
    if len(kb):
        open_keys = open_keys.union(rd.from_pandas(kb[["o_orderkey"]]))
    open_keys = open_keys.map_batches(
        lambda df: df.assign(__matched=np.int64(1)), batch_format="pandas")

    nparts = 8
    j = per_key.repartition(nparts).join(
        open_keys.repartition(nparts), "left_outer", nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def unmatched_weight(df: pd.DataFrame) -> pd.DataFrame:
        # sentinel (-1) rows never match; false positives have __matched
        # null; blocks with zero matches omit the right-side columns
        if "__matched" not in df.columns:
            w = df["n"].sum()
        else:
            w = df.loc[df["__matched"].isna(), "n"].sum()
        return pd.DataFrame({"n": [np.int64(w)]})

    n = int(j.map_batches(unmatched_weight,
                          batch_format="pandas").to_pandas()["n"].sum())
    return pd.DataFrame({"n_not_open": [np.int64(n)]})


def doc_pack_bins(sf_dir):
    """Corpus packing into fixed token budgets (sequence-packing prep for
    LLM training): global two-pass prefix scan assigns every document to
    bin floor(tokens_before / 4096) in doc_id order, then a zero-shuffle
    combine summarizes each bin (functions/scan.packed_bins). The scan
    touches the data twice and ships only one compact row per block to the
    driver between passes."""
    import ray.data as rd

    from ..functions.scan import packed_bins
    from ..functions.textstats import add_token_count

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])
    toks = (ds.map_batches(add_token_count, batch_format="pyarrow")
            .select_columns(["doc_id", "n_tokens"]))
    return packed_bins(toks, order_col="doc_id", value_col="n_tokens",
                       capacity=4096)


def li_ship_lag(sf_dir):
    """Per-row derived join metric: ship lag (l_shipdate - o_orderdate)
    histogram in weeks. Unlike li_orders_join the fact side cannot
    pre-aggregate (each row's lag needs its own order date), so this is the
    honest distributed-join shape: both sides pruned to 2 columns, hash
    join, then a zero-shuffle low-card combine on the bucketed lag."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    li = _read_table(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_shipdate"])
    orders = _read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_orderdate"])
    nparts = 8
    j = li.repartition(nparts).join(
        orders.repartition(nparts), "inner", nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def lag(df: pd.DataFrame) -> pd.DataFrame:
        days = (
            pd.to_datetime(df["l_shipdate"]).to_numpy("datetime64[D]")
            - pd.to_datetime(df["o_orderdate"]).to_numpy("datetime64[D]")
        ).astype(np.int64)
        return pd.DataFrame({"lag_week": days // 7})

    out = combine_low_card(
        j.map_batches(lag, batch_format="pandas"),
        ["lag_week"], {"n": ("lag_week", "count")},
    )
    out["lag_week"] = out["lag_week"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("lag_week").reset_index(drop=True)


def doc_charstats(sf_dir):
    """Per-document character-class profile (digits / uppercase /
    whitespace / non-alphanumeric counts) — the vectorized text-analysis
    pass every quality filter builds on; one compiled-regex scan per class
    inside map_batches, no Python per-row loop."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         override_num_blocks=_nblocks(),
                         columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_digit": t.str.count(r"[0-9]").astype(np.int64),
            "n_upper": t.str.count(r"[A-Z]").astype(np.int64),
            "n_space": t.str.count(r"[ \t\n]").astype(np.int64),
            "n_other": t.str.count(r"[^0-9A-Za-z \t\n]").astype(np.int64),
        })

    out = ds.map_batches(stats, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_dup_clusters(sf_dir):
    """Duplicate CLUSTERS, not just pairs: connected components over the
    deterministic exact-Jaccard pair graph (planted corpus), cluster id =
    component minimum — the canonical-keeper assignment a curation pass
    consumes. The component step runs on the compact verified-pair list
    only (functions/dedup.dup_clusters); the oracle restates reachability
    with a recursive CTE."""
    from ..functions.dedup import dup_clusters, ngram_jaccard_dups

    pairs = ngram_jaccard_dups(_planted_docs(sf_dir), threshold=1.0, n=3)
    return dup_clusters(pairs)


def t_conv_doc(sf_dir):
    """Per-conversation ordered document assembly (turns -> one training
    document, the LLM-pipeline packing step): texts joined with newline in
    exact (turn_idx, ts, text) order, summarized as length + md5 so only
    compact rows reach the compare. Interior conversations assemble and
    hash inside map_batches; the driver stitches boundary conversations
    only (functions/windows.assemble_docs)."""
    import ray.data as rd

    from ..functions.windows import assemble_docs

    ds = rd.read_parquet(transcripts_dir(sf_dir),
                         columns=["conv_id", "turn_idx", "ts", "text"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["text"] = df["text"].fillna("")
        return df

    out = assemble_docs(
        ds.map_batches(derive, batch_format="pandas"),
        key="conv_id", order_cols=["turn_idx", "ts", "text"],
        text_col="text",
    )
    return out.rename(columns={"key": "conv_id"})


def events_hopping(sf_dir):
    """Hopping-window aggregate (size 2h, hop 1h): each event lands in the
    two windows covering it via a vectorized window-assignment flat-map,
    then a zero-shuffle low-card combine per (window_start, type) — the
    streaming-window shape at batch semantics (SURVEY.md §2.6)."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "events",
                     columns=["event_type", "ts", "value"])

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(df["value"] * 100).astype(np.int64)
        h = df["ts"].dt.floor("h")
        a = pd.DataFrame({"wstart": h, "event_type": df["event_type"],
                          "cents": cents})
        b = a.copy()
        b["wstart"] = h - pd.Timedelta(hours=1)
        return pd.concat([a, b], ignore_index=True)

    out = combine_low_card(
        ds.map_batches(windows, batch_format="pandas"),
        ["wstart", "event_type"],
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    out["n"] = out["n"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    out["wstart"] = out["wstart"].astype("datetime64[us]")
    return out.sort_values(["wstart", "event_type"]).reset_index(drop=True)


def cust_order_dist(sf_dir):
    """TPC-H Q13-shaped outer-join distribution: how many customers placed
    exactly k URGENT orders, INCLUDING the zero bucket. Scale shape: the
    fact side pre-aggregates to one (custkey, count) partial per batch, the
    keyed reduce shuffles only those compact partials, and the distribution
    is a second low-card combine over the per-customer counts — the
    customer table itself contributes only its row count (never joined
    row-by-row). Reference analog: per-group frequency audits
    (sample_metadata_validator batch-imbalance family)."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card, keyed_reduce

    ds = _read_table(sf_dir, "orders",
                     columns=["o_custkey", "o_orderpriority"])

    def urgent(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["o_orderpriority"] == "1-URGENT", ["o_custkey"]]

    interior, boundary = keyed_reduce(
        ds.map_batches(urgent, batch_format="pandas"),
        ["o_custkey"], {"n_orders": ("o_custkey", "count")},
    )
    dist = combine_low_card(interior, ["n_orders"],
                            {"n_custs": ("n_orders", "count")})
    if len(boundary):
        bd = (boundary.groupby("n_orders").size()
              .reset_index(name="n_custs"))
        dist = (pd.concat([dist, bd], ignore_index=True)
                .groupby("n_orders", as_index=False)["n_custs"].sum())
    n_cust_total = _read_table(sf_dir, "customer",
                               columns=["c_custkey"]).count()
    zero = int(n_cust_total) - int(dist["n_custs"].sum())
    if zero:
        dist = pd.concat(
            [dist, pd.DataFrame({"n_orders": [0], "n_custs": [zero]})],
            ignore_index=True)
    dist["n_orders"] = dist["n_orders"].astype(np.int64)
    dist["n_custs"] = dist["n_custs"].astype(np.int64)
    return dist.sort_values("n_orders").reset_index(drop=True)


def orders_pivot(sf_dir):
    """Pivot / cross-tab: order count + totalprice cents by priority x
    status, assembled wide. The wide step touches only the ~15-row compact
    combine result; the scan itself is one low-card partial+final pass with
    zero shuffle."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "orders",
                     columns=["o_orderpriority", "o_orderstatus",
                              "o_totalprice"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df["cents"] = _round_half_away(df["o_totalprice"] * 100
                                       ).astype(np.int64)
        return df[["o_orderpriority", "o_orderstatus", "cents"]]

    long = combine_low_card(
        ds.map_batches(derive, batch_format="pandas"),
        ["o_orderpriority", "o_orderstatus"],
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    out = pd.DataFrame(
        {"o_orderpriority": sorted(long["o_orderpriority"].unique())})
    for st in ("F", "O", "P"):
        sub = long.loc[long["o_orderstatus"] == st,
                       ["o_orderpriority", "n", "sum_cents"]]
        out = out.merge(
            sub.rename(columns={"n": f"n_{st.lower()}",
                                "sum_cents": f"cents_{st.lower()}"}),
            on="o_orderpriority", how="left")
    for c in out.columns[1:]:
        out[c] = out[c].fillna(0).astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def cust_nation_region(sf_dir):
    """TPC-H Q5-shaped two-hop dimension join: customer -> nation -> region
    rolled up to account balance per region. Both dimensions are pre-joined
    driver-side (25 x 5 rows) and broadcast ONCE via ray.put; each batch
    does a vectorized hash merge — no shuffle at any width."""
    import ray
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card

    nat = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_regionkey"])
    reg = pd.read_parquet(os.path.join(sf_dir, "region.parquet"),
                          columns=["r_regionkey", "r_name"])
    dim = nat.merge(reg, left_on="n_regionkey",
                    right_on="r_regionkey")[["n_nationkey", "r_name"]]
    dim_ref = ray.put(dim)
    ds = _read_table(sf_dir, "customer",
                     columns=["c_nationkey", "c_acctbal"])

    def joined(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(dim_ref)
        df["cents"] = _round_half_away(df["c_acctbal"] * 100
                                       ).astype(np.int64)
        df = df.merge(m, left_on="c_nationkey", right_on="n_nationkey",
                      how="left")
        return df[["r_name", "cents"]]

    out = combine_low_card(
        ds.map_batches(joined, batch_format="pandas"),
        ["r_name"],
        {"n_custs": ("cents", "count"), "sum_cents": ("cents", "sum")},
    )
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["sum_cents"] = out["sum_cents"].astype(np.int64)
    return out.sort_values("r_name").reset_index(drop=True)


def orders_distinct_cust(sf_dir):
    """Exact grouped COUNT(DISTINCT) at any key cardinality: level 1
    dedups (status, custkey) pairs through the keyed reduce (per-batch
    partials shrink each batch to its distinct pairs before the compact
    shuffle), level 2 counts surviving pairs per status with a zero-shuffle
    combine. The distinct-key set itself never materializes on the driver
    — only the interior dataset's per-status counts plus <= 2 boundary
    rows per batch do."""
    import ray.data as rd

    from ..stages.keyed_reduce import combine_low_card, keyed_reduce

    ds = _read_table(sf_dir, "orders",
                     columns=["o_orderstatus", "o_custkey"])
    interior, boundary = keyed_reduce(
        ds, ["o_orderstatus", "o_custkey"],
        {"c": ("o_custkey", "count")}, batch_format="pyarrow",
    )
    per = combine_low_card(interior, ["o_orderstatus"],
                           {"n_custs": ("c", "count")})
    if len(boundary):
        bd = (boundary.groupby("o_orderstatus").size()
              .reset_index(name="n_custs"))
        per = (pd.concat([per, bd], ignore_index=True)
               .groupby("o_orderstatus", as_index=False)["n_custs"].sum())
    per["n_custs"] = per["n_custs"].astype(np.int64)
    return per.sort_values("o_orderstatus").reset_index(drop=True)


def events_funnel(sf_dir):
    """Ordered 3-step conversion funnel (view -> click -> purchase): per
    user, how many consecutive steps completed, step j+1 at ts >= step j's
    earliest qualifying ts. Runs as the FUNNEL window op: each sorted batch
    reduces to one (k+1)-int transition table per user and tables compose
    like functions, so a user with a billion events costs the merge
    O(batches) ints — the parallel-automaton form of the sequential scan
    the SQL oracle's chained min-ts CTEs describe."""
    from ..functions.windows import funnel

    ds = _read_table(sf_dir, "events",
                     columns=["user_id", "ts", "event_type"])
    out = funnel(ds, key="user_id", ts_col="ts", type_col="event_type",
                 steps=("view", "click", "purchase"))
    out = out.rename(columns={"key": "user_id"})
    out["user_id"] = out["user_id"].astype(np.int64)
    return out


def events_transitions(sf_dir):
    """Global first-order event-type transition counts (the Markov /
    bigram sequence statistic): per user, consecutive (type -> next type)
    pairs in (ts, event_id) order, summed globally. Runs as the
    TRANSITION_COUNTS window op — each sorted batch reduces to at most
    n_types^2 count rows plus one (first, last) endpoint row per key-run,
    so the driver sees O(batches + types^2) rows at any data size."""
    from ..functions.windows import transition_counts

    ds = _read_table(sf_dir, "events",
                     columns=["user_id", "ts", "event_id", "event_type"])
    return transition_counts(ds, key="user_id",
                             order_cols=["ts", "event_id"],
                             type_col="event_type")


def t_role_transitions(sf_dir):
    """Global role-to-role transition counts over per-conversation turn
    sequences (who speaks after whom — the dialogue-structure statistic):
    TRANSITION_COUNTS over the transcripts table in (turn_idx, ts, role)
    order. The residual tie (identical turn_idx+ts+role duplicate rows in
    the seeded fixture) is swap-invariant for bigrams, so the order is
    total for this purpose."""
    import ray.data as rd

    from ..functions.windows import transition_counts

    ds = rd.read_parquet(transcripts_dir(sf_dir),
                         columns=["conv_id", "turn_idx", "ts", "role"])
    return transition_counts(ds, key="conv_id",
                             order_cols=["turn_idx", "ts", "role"],
                             type_col="role")


def doc_dup_windows(sf_dir):
    """Exact substring-level duplicate detection (Lee et al. 2022
    semantics, hash-inventory form): documents sharing a verbatim 32-byte
    window with another document, with the count of distinct shared
    windows each. Rolling-hash inventory -> >=2-doc candidate hashes ->
    broadcast + literal-byte verify (collision-proof); see
    functions/dedup.shared_window_docs for the scale shape."""
    from ..functions.dedup import shared_window_docs

    ds = _read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = shared_window_docs(ds, col="text", id_col="doc_id", window=32)
    if len(out):
        out["doc_id"] = out["doc_id"].astype(np.int64)
    else:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "n_shared_windows": pd.Series([],
                                                          dtype=np.int64)})
    return out


def events_above_user_avg(sf_dir):
    """Decorrelated correlated subquery: per user, how many of their events
    exceed their OWN average value — the "compare each row to its group
    aggregate" shape. Pass 1 reduces exact integer (sum_cents, n) per user;
    pass 2 broadcasts the small stats table and counts rows where
    ``cents * n > sum_cents`` — an all-integer predicate, so no float mean
    can tie-break differently than the SQL twin. At 10^9 users the
    broadcast becomes a co-partitioned hash join; the two-pass
    decorrelation itself is unchanged."""
    import ray

    from ..stages.keyed_reduce import keyed_reduce_pandas

    ds = _read_table(sf_dir, "events", columns=["user_id", "value"])

    def add_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "cents": _round_half_away(
                df["value"].to_numpy() * 100).astype(np.int64),
        })

    # materialize: the derived stream feeds BOTH the stats reduce and the
    # counting pass — without it the read + cents conversion runs twice
    cds = ds.map_batches(add_cents, batch_format="pandas").materialize()
    stats = keyed_reduce_pandas(
        cds, ["user_id"],
        {"sum_cents": ("cents", "sum"), "n": ("cents", "count")})
    sum_ref = ray.put(pd.Series(
        stats["sum_cents"].to_numpy(np.int64),
        index=stats["user_id"].to_numpy(np.int64)))
    n_ref = ray.put(pd.Series(
        stats["n"].to_numpy(np.int64),
        index=stats["user_id"].to_numpy(np.int64)))

    def count_above(df: pd.DataFrame) -> pd.DataFrame:
        sums, ns = ray.get(sum_ref), ray.get(n_ref)
        u = df["user_id"]
        above = (df["cents"].to_numpy(np.int64)
                 * u.map(ns).to_numpy(np.int64)
                 > u.map(sums).to_numpy(np.int64)).astype(np.int64)
        return (pd.DataFrame({"user_id": u, "above": above})
                .groupby("user_id", as_index=False)["above"].sum())

    parts = cds.map_batches(count_above, batch_format="pandas").to_pandas()
    out = (parts.groupby("user_id", as_index=False)["above"].sum()
           .rename(columns={"above": "n_above"})
           .sort_values("user_id").reset_index(drop=True))
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_above"] = out["n_above"].astype(np.int64)
    return out


def doc_mad(sf_dir):
    """Per-language median absolute deviation of document length — the
    robust two-level dispersion statistic, composed from TWO exact grouped
    percentile_disc passes (median -> broadcast -> |x - med| -> median).
    Each pass is the compact-count-partial percentile operator; the only
    driver state between them is one row per language."""
    import ray

    from ..functions.windows import grouped_percentile_disc

    ds = _read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    med = grouped_percentile_disc(ds, key="lang", value_col="n_chars",
                                  q=0.5)
    med_ref = ray.put(dict(zip(med["lang"], med["p"].astype(np.int64))))

    def absdev(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(med_ref)
        m = df["lang"].map(mm).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "lang": df["lang"],
            "dev": np.abs(df["n_chars"].to_numpy(dtype=np.int64) - m),
        })

    mad = grouped_percentile_disc(
        ds.map_batches(absdev, batch_format="pandas"),
        key="lang", value_col="dev", q=0.5)
    out = pd.DataFrame({
        "lang": med["lang"],
        "med": med["p"].astype(np.int64),
        "mad": mad.set_index("lang")["p"].reindex(med["lang"])
        .astype(np.int64).to_numpy(),
    })
    return out.sort_values("lang").reset_index(drop=True)


def doc_top_words(sf_dir):
    """Per-language vocabulary head: the 5 most frequent whitespace tokens
    of each lang with exact counts (count desc, word asc) — grouped
    distributed vocabulary mining. Per-batch (lang, word) value_counts
    partials collapse each batch to its distinct vocabulary before the
    keyed reduce shuffles, and the reduced stream takes its per-lang head
    through grouped_top_n's compact boundary discipline — tokens
    themselves never shuffle."""
    import ray.data as rd

    from ..functions.windows import grouped_top_n
    from ..stages.keyed_reduce import keyed_reduce

    ds = _read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.set_index("lang")[["text"]]["text"].str.split() \
            .explode().dropna()
        if not len(toks):
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "word": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        vc = toks.groupby([toks.index, toks.values]).size()
        return pd.DataFrame({
            "lang": vc.index.get_level_values(0),
            "word": vc.index.get_level_values(1),
            "n": vc.to_numpy(np.int64),
        })

    interior, boundary = keyed_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "word"], {"n": ("n", "sum")},
        partial_applied=True,
    )
    counts = interior
    if len(boundary):
        counts = counts.union(rd.from_pandas(boundary))

    def order_key(df: pd.DataFrame) -> pd.DataFrame:
        df["neg_n"] = -df["n"].to_numpy(np.int64)
        return df

    out = grouped_top_n(
        counts.map_batches(order_key, batch_format="pandas"),
        key="lang", order_cols=["neg_n", "word"], n=5)
    out = out[["lang", "word", "n"]].copy()
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


def events_repeat_buyers(sf_dir):
    """INTERSECT as one grouped-flag reduce: users that appear with BOTH a
    'view' and a 'purchase' event. Each batch collapses to per-user 0/1
    flags, the keyed reduce ORs them (max), and the filter is a plain
    predicate — no distinct-per-side materialization, no second shuffle,
    unlike the naive two-branch set intersection."""
    from ..stages.keyed_reduce import keyed_reduce_pandas

    ds = _read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "saw": (df["event_type"] == "view").astype(np.int64),
            "bought": (df["event_type"] == "purchase").astype(np.int64),
        })

    red = keyed_reduce_pandas(
        ds.map_batches(flags, batch_format="pandas"),
        ["user_id"], {"saw": ("saw", "max"), "bought": ("bought", "max")})
    out = red[(red["saw"] > 0) & (red["bought"] > 0)][["user_id"]]
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def events_value_deciles(sf_dir):
    """Quantile-normalized distribution: global exact decile cut points of
    value cents (profile.cdf_quantiles — ONE pass, NO sort, all nine
    quantiles from the value-CDF reduce) broadcast into a per-(type,
    decile-bucket) count. Bucket b = 1 + #{cuts < cents}, the integer
    searchsorted definition the SQL twin restates with a correlated count
    over the same nine cuts."""
    import ray

    from ..functions.profile import cdf_quantiles
    from ..stages.keyed_reduce import combine_low_card

    ds = _read_table(sf_dir, "events", columns=["event_type", "value"])

    def add_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "cents": _round_half_away(
                df["value"].to_numpy() * 100).astype(np.int64),
        })

    cds = ds.map_batches(add_cents, batch_format="pandas").materialize()
    cuts = np.sort(np.array(
        cdf_quantiles(cds, "cents", [i / 10 for i in range(1, 10)]),
        dtype=np.int64))
    cuts_ref = ray.put(cuts)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(cuts_ref)
        df["bucket"] = (np.searchsorted(
            cc, df["cents"].to_numpy(), side="left") + 1).astype(np.int64)
        return df[["event_type", "bucket"]]

    out = combine_low_card(
        cds.map_batches(bucketize, batch_format="pandas"),
        ["event_type", "bucket"], {"n": ("bucket", "count")})
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["event_type", "bucket"])
            .reset_index(drop=True))


def t_role_repeats(sf_dir):
    """Per-conversation count of consecutive SAME-ROLE turns (assistant
    answering itself, tool bursts) — the dialogue-alternation statistic, a
    per-key adjacent-pair primitive (windows.adjacent_pair_counts): one
    sorted scan, one compact row per (batch, run), two scalars bridged per
    block boundary. Order (turn_idx, ts, role) as in t_role_transitions;
    the residual exact-duplicate tie is equality-invariant."""
    import ray.data as rd

    from ..functions.windows import adjacent_pair_counts

    ds = rd.read_parquet(transcripts_dir(sf_dir),
                         columns=["conv_id", "turn_idx", "ts", "role"])
    out = adjacent_pair_counts(ds, key="conv_id",
                               order_cols=["turn_idx", "ts", "role"],
                               col="role")
    return (out.rename(columns={"key": "conv_id",
                                "n_pairs": "n_repeats"})
            .sort_values("conv_id").reset_index(drop=True))


def t_max_role_run(sf_dir):
    """Per-conversation LONGEST same-role streak (gaps-and-islands max,
    windows.max_run_length) — how long one speaker holds the floor. Same
    order and tie note as t_role_repeats; the fixture has no null roles,
    so the SQL islands form states identical semantics (null-break
    behavior is pinned by the hypothesis property instead). The oracle's
    two row_number windows share one TOTAL order (a row_number() rid
    tiebreak): with the seeded exact-duplicate turns, independent tie
    orders can pair rn/rnr inconsistently and split a real island —
    the engine's answer (identical rows are always adjacent) is the
    stable one."""
    import ray.data as rd

    from ..functions.windows import max_run_length

    ds = rd.read_parquet(transcripts_dir(sf_dir),
                         columns=["conv_id", "turn_idx", "ts", "role"])
    out = max_run_length(ds, key="conv_id",
                         order_cols=["turn_idx", "ts", "role"], col="role")
    return (out.rename(columns={"key": "conv_id"})
            .sort_values("conv_id").reset_index(drop=True))


def doc_chunks(sf_dir):
    """Sliding-window document CHUNKING (doc -> overlapping context
    windows, the pretraining/RAG splitting step): 500-char windows with
    stride 400 (100-char overlap); a window is emitted only while it adds
    more than the overlap's worth of new text (start < max(len-100, 1)),
    so no trailing chunk is a near-copy of the previous one. Pure
    flat-map — each batch expands independently, nothing shuffles; chunks
    leave the stage as (len, md5) summaries, never raw text."""
    import hashlib

    WIN, STRIDE, OVER = 500, 400, 100
    ds = _read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        L = df["text"].str.len().to_numpy(np.int64)
        bound = np.maximum(L - OVER, 1)
        n_chunks = (bound - 1) // STRIDE + 1
        out = []
        for k in range(int(n_chunks.max()) if len(df) else 0):
            m = n_chunks > k
            sub = df.loc[m, ["doc_id", "text"]]
            chunk = sub["text"].str.slice(k * STRIDE, k * STRIDE + WIN)
            out.append(pd.DataFrame({
                "doc_id": sub["doc_id"].to_numpy(np.int64),
                "chunk_idx": np.int64(k),
                "chunk_len": chunk.str.len().to_numpy(np.int64),
                "chunk_md5": [hashlib.md5(c.encode("utf-8")).hexdigest()
                              for c in chunk],
            }))
        if not out:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "chunk_idx": pd.Series([], dtype=np.int64),
                "chunk_len": pd.Series([], dtype=np.int64),
                "chunk_md5": pd.Series([], dtype=object),
            })
        return pd.concat(out, ignore_index=True)

    got = ds.map_batches(expand, batch_format="pandas").to_pandas()
    return (got.sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True))


def events_peak_rate(sf_dir):
    """Per-user PEAK trailing 4-hour event count — the burst-rate profiler
    (SQL RANGE-frame window max). One (user, ts) range sort; compact
    window-occupancy partials at block boundaries only; a hot user never
    ships raw rows. See windows.peak_window_count for the stitch proof."""
    from ..functions.windows import peak_window_count

    ds = _read_table(sf_dir, "events", columns=["user_id", "ts"])
    out = peak_window_count(ds, key="user_id", ts_col="ts",
                            window_us=4 * 3600 * 1_000_000)
    out = out.rename(columns={"key": "user_id"})
    out["user_id"] = out["user_id"].astype(np.int64)
    return out


def events_rank_head(sf_dir):
    """Rank-WITH-TIES head per group: every event whose integer value
    bucket (floor(value)) is among its event_type's top-3 DISTINCT buckets,
    with the bucket's dense rank. Unlike row_number top-n
    (events_head_per_type), ties all survive — the SQL dense_rank()<=n
    semantics.

    Scale shape: the per-type top-3-distinct-bucket THRESHOLD is a
    mergeable partial (each batch emits at most 3 buckets per type), so the
    threshold table is O(#types x 3) and broadcasts into a single filter
    pass — no shuffle, no window sort; rank attaches from the same
    broadcast map."""
    import ray

    ds = _read_table(sf_dir, "events",
                     columns=["event_type", "event_id", "value"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()].copy()
        df["bucket"] = np.floor(df["value"].to_numpy()).astype(np.int64)
        return df[["event_type", "event_id", "bucket"]]

    b = ds.map_batches(bucketize, batch_format="pandas")

    def top_buckets(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=["event_type", "bucket"])
        return (df[["event_type", "bucket"]].drop_duplicates()
                .sort_values(["event_type", "bucket"],
                             ascending=[True, False])
                .groupby("event_type", as_index=False).head(3))

    cand = b.map_batches(top_buckets, batch_format="pandas").to_pandas()
    cand = top_buckets(cand)  # merge of partials = same top-3-distinct op
    rank_map = {
        (t, bkt): r + 1
        for t, g in cand.groupby("event_type", sort=False)
        for r, bkt in enumerate(g["bucket"].tolist())
    }
    rank_ref = ray.put(rank_map)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        rm = ray.get(rank_ref)
        keys = list(zip(df["event_type"].tolist(), df["bucket"].tolist()))
        rnk = np.array([rm.get(k, 0) for k in keys], dtype=np.int64)
        out = df[rnk > 0].copy()
        out["rnk"] = rnk[rnk > 0]
        return out

    out = b.map_batches(pick, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype(np.int64)
    return (out[["event_type", "event_id", "bucket", "rnk"]]
            .sort_values(["event_type", "rnk", "event_id"])
            .reset_index(drop=True))


def daily_full_join(sf_dir):
    """FULL OUTER JOIN expressed as tagged union + keyed reduce — the
    zero-join-shuffle plan: per-day-of-month order counts vs event counts,
    keeping days present on either side (day 31 has orders but no events in
    the fixture; both-null-side semantics pinned by the unit test). Each
    side pre-aggregates per batch, the tagged partial streams union, and
    one low-card combine pivots the tags into columns — at high-card keys
    the identical plan routes through keyed_reduce instead of a join."""
    from ..stages.keyed_reduce import combine_low_card

    o = _read_table(sf_dir, "orders", columns=["o_orderdate"])
    e = _read_table(sf_dir, "events", columns=["ts"])

    def tag(col, as_orders):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            dom = pd.DatetimeIndex(df[col]).day.astype(np.int64)
            out = pd.DataFrame({"dom": dom})
            out["o"] = np.int64(1 if as_orders else 0)
            out["e"] = np.int64(0 if as_orders else 1)
            return out
        return fn

    tagged = (o.map_batches(tag("o_orderdate", True), batch_format="pandas")
              .union(e.map_batches(tag("ts", False), batch_format="pandas")))
    out = combine_low_card(
        tagged, ["dom"],
        {"order_cnt": ("o", "sum"), "event_cnt": ("e", "sum")})
    for c in ("dom", "order_cnt", "event_cnt"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("dom").reset_index(drop=True)


def events_key_skew(sf_dir):
    """Hot-key skew profiler: the 20 heaviest user_ids with exact counts
    and exact integer ppm share of all events — the diagnostic that decides
    when a shuffle key needs salting. Scale shape: per-batch count partials
    -> keyed_reduce interior/boundary -> per-BLOCK top-k + block-sum
    partials (k + 1 rows per block, never the full key census on the
    driver) -> driver merge of O(k x blocks) candidates."""
    from ..stages.keyed_reduce import keyed_reduce

    ds = _read_table(sf_dir, "events", columns=["user_id"])
    interior, boundary = keyed_reduce(
        ds, ["user_id"], {"n": ("user_id", "count")},
        batch_format="pandas")

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=["user_id", "n", "is_sum"])
        top = df.sort_values(["n", "user_id"],
                             ascending=[False, True]).head(20).copy()
        top["is_sum"] = False
        tot = pd.DataFrame({"user_id": [np.int64(0)],
                            "n": [df["n"].sum()], "is_sum": [True]})
        return pd.concat([top, tot], ignore_index=True)

    parts = interior.map_batches(topk_partial,
                                 batch_format="pandas").to_pandas()
    total = int(parts.loc[parts["is_sum"], "n"].sum())
    cand = parts.loc[~parts["is_sum"], ["user_id", "n"]]
    if len(boundary):
        total += int(boundary["n"].sum())
        cand = pd.concat([cand, boundary[["user_id", "n"]]],
                         ignore_index=True)
    out = (cand.sort_values(["n", "user_id"], ascending=[False, True])
           .head(20).reset_index(drop=True))
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    out["ppm"] = np.array(
        [int(n) * 1_000_000 // total for n in out["n"]], dtype=np.int64)
    return out


# Ordering contract: correctness harnesses that sample a prefix of this
# dict (the driver checks the first 50) must see one entry per DISTINCT
# operator family first — rule suite, sketch exact-twins, drift, the
# window family, joins, stateful enrichment, profile stats, the dedup /
# decontamination / curation chain, and embedding LSH. Variants of an
# already-covered operator (alternate planted fixtures, sketch non-exact
# twins, extra SQL shapes over the same primitive) come after; every
# entry regardless of position stays gated by tests/test_entry_oracle.py.
QUERIES = {
    # -- rule suite (row-local vectorized predicates) --
    "t_role_vocab": t_role_vocab,
    "t_tool_pattern": t_tool_pattern,
    "t_tool_role": t_tool_role,
    "t_text_empty": t_text_empty,
    "t_text_null": t_text_null,
    "t_turn_range": t_turn_range,
    "t_ts_window": t_ts_window,
    # -- conversation-level (hash-partitioned cross-shard) rules --
    "t_dup_turn_key": t_dup_turn_key,
    "t_contig": t_contig,
    "t_ts_mono": t_ts_mono,
    "t_conv_span_shards": t_conv_span_shards,
    "t_row_dup": t_row_dup,
    # -- decision / verdict assembly + survivor export --
    "t_rule_counts": t_rule_counts,
    "t_verdicts": t_verdicts,
    "t_clean_rows": t_clean_rows,
    # -- aggregates + sketch exact twins --
    "t_conv_stats": t_conv_stats,
    "t_role_stats": t_role_stats,
    "t_distinct_convs_exact": t_distinct_convs_exact,
    "t_textlen_hist": t_textlen_hist,
    # -- drift vs baseline (exact PSI-bin + exact-rational KS twins) --
    "t_drift_exact": t_drift_exact,
    "t_drift_ks_exact": t_drift_ks_exact,
    "events_validate": events_validate,
    # -- window / sorted-stream family --
    "t_turn_gaps": t_turn_gaps,
    "t_rolling_max": t_rolling_max,
    "t_conv_doc": t_conv_doc,
    "t_max_role_run": t_max_role_run,
    "t_role_repeats": t_role_repeats,
    "events_sessions": events_sessions,
    "events_last_view": events_last_view,
    "events_head_per_type": events_head_per_type,
    "events_value_p50": events_value_p50,
    "events_value_p50_cont": events_value_p50_cont,
    "events_peak_rate": events_peak_rate,
    "events_daily": events_daily,
    "events_hopping": events_hopping,
    "events_funnel": events_funnel,
    # -- joins / co-location --
    "cust_orders_join": cust_orders_join,
    "li_orders_join": li_orders_join,
    "events_attrib_pairs": events_attrib_pairs,
    "cust_nation_region": cust_nation_region,
    # -- stateful enrichment + profile statistics --
    "cust_enrich": cust_enrich,
    "li_col_profile": li_col_profile,
    "cust_status_confound": cust_status_confound,
    # -- LLM-corpus dedup / decontam / curation chain --
    "doc_dedup_exact": doc_dedup_exact,
    "doc_minhash_planted": doc_minhash_planted,
    "doc_dup_windows": doc_dup_windows,
    "doc_decontam": doc_decontam,
    "doc_curate": doc_curate,
    "doc_pretrain_prep": doc_pretrain_prep,
    # -- embedding LSH near-dup --
    "emb_near_dups": emb_near_dups,
    # ---------------- variants / additional shapes ----------------
    "t_distinct_convs": t_distinct_convs,
    "t_drift": t_drift,
    "events_by_type": events_by_type,
    "events_props_k": events_props_k,
    "events_rollup": events_rollup,
    "part_units": part_units,
    "role_variants": role_variants,
    "li_corr_pairs": li_corr_pairs,
    "cust_top_orders": cust_top_orders,
    "cust_order_dist": cust_order_dist,
    "doc_dup_clusters": doc_dup_clusters,
    "li_ship_lag": li_ship_lag,
    "doc_pack_bins": doc_pack_bins,
    "li_not_open_orders": li_not_open_orders,
    "events_retention": events_retention,
    "events_transitions": events_transitions,
    "events_rank_head": events_rank_head,
    "daily_full_join": daily_full_join,
    "events_key_skew": events_key_skew,
    "events_above_user_avg": events_above_user_avg,
    "doc_mad": doc_mad,
    "doc_top_words": doc_top_words,
    "events_repeat_buyers": events_repeat_buyers,
    "events_value_deciles": events_value_deciles,
    "doc_chunks": doc_chunks,
    "t_role_transitions": t_role_transitions,
    "events_value_outliers": events_value_outliers,
    "orders_daily_cum": orders_daily_cum,
    "cust_no_urgent": cust_no_urgent,
    "events_mode_type": events_mode_type,
    "events_view_no_purchase": events_view_no_purchase,
    "doc_charstats": doc_charstats,
    "orders_pivot": orders_pivot,
    "orders_distinct_cust": orders_distinct_cust,
    "doc_token_count": doc_token_count,
    "doc_quality": doc_quality,
    "doc_fingerprint": doc_fingerprint,
    "doc_langid": doc_langid,
    "doc_minhash_pairs": doc_minhash_pairs,
    "doc_ngram_planted": doc_ngram_planted,
    "doc_simhash": doc_simhash,
    "doc_simhash_dups": doc_simhash_dups,
    "doc_simhash_planted": doc_simhash_planted,
    "doc_token_bpe": doc_token_bpe,
    "doc_word_counts": doc_word_counts,
    "doc_tfidf": doc_tfidf,
    "doc_normalize": doc_normalize,
    "doc_uniform_sample": doc_uniform_sample,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_temp_sample": doc_temp_sample,
    "doc_top_words_sketch": doc_top_words_sketch,
    "doc_quality_filter": doc_quality_filter,
    "doc_sample_per_source": doc_sample_per_source,
    "doc_pii": doc_pii,
    "doc_pii_redact": doc_pii_redact,
    "doc_repetition": doc_repetition,
    "emb_topk": emb_topk,
    "emb_topk_ids": emb_topk_ids,
    "emb_ivf_topk": emb_ivf_topk,
    "emb_ivf_topk_full": emb_ivf_topk_full,
    "emb_quantize": emb_quantize,
    "emb_cluster_assign": emb_cluster_assign,
    "emb_semdedup": emb_semdedup,
    "li_pricing": li_pricing,
}


_SHINGLE_SET_PAIRS_SQL = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT)+100000, text FROM documents),
s AS (SELECT doc_id,
             CASE WHEN length(text) >= 5
                  THEN list_sort(list_distinct([substring(text, i, 5)
                       for i in generate_series(1, length(text)-4)]))
                  ELSE [text] END AS sh
      FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM s a JOIN s b ON a.doc_id < b.doc_id AND a.sh = b.sh
ORDER BY 1, 2"""


_WORD_NGRAM_PAIRS_SQL = r"""
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT)+100000, text FROM documents),
w AS (SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      FROM d),
s AS (SELECT doc_id,
             CASE WHEN len(ws) >= 3
                  THEN list_sort(list_distinct([array_to_string(ws[i:i+2], ' ')
                       for i in generate_series(1, len(ws)-2)]))
                  ELSE [array_to_string(ws, ' ')] END AS sh
      FROM w)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM s a JOIN s b ON a.doc_id < b.doc_id AND a.sh = b.sh
ORDER BY 1, 2"""


_PII_DOCS_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       text || CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 1 THEN ' reach u' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-202-555-0147'
         WHEN 2 THEN ' ssn 123-45-6789 ip 10.0.3.'
                  || CAST(doc_id % 200 AS VARCHAR)
         WHEN 3 THEN ' mail a.b-c@x.co.uk call +44-700-900-1234'
         ELSE '' END AS text
FROM documents"""


def _pii_oracles() -> dict[str, str]:
    """Oracles stated from the SAME pattern strings the engine compiles
    (both RE2) over the same planted concatenation."""
    from ..functions.pii import PII_PATTERNS

    counts = ",\n       ".join(
        f"CAST(length(regexp_extract_all(text, '{pat}')) AS BIGINT) "
        f"AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    total = " + ".join(
        f"length(regexp_extract_all(text, '{pat}'))"
        for _, pat in PII_PATTERNS
    )
    redacted = "text"
    for name, pat in PII_PATTERNS:
        redacted = (f"regexp_replace({redacted}, '{pat}', "
                    f"'[{name.upper()}]', 'g')")
    return {
        "doc_pii": f"""
WITH d AS ({_PII_DOCS_SQL})
SELECT doc_id, {counts},
       CAST({total} AS BIGINT) AS n_pii
FROM d ORDER BY doc_id""",
        "doc_pii_redact": f"""
WITH d AS ({_PII_DOCS_SQL})
SELECT doc_id, {redacted} AS text FROM d ORDER BY doc_id""",
        "doc_pretrain_prep": rf"""
WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
     UNION ALL
     SELECT CAST(doc_id AS BIGINT)+100000, text FROM documents),
d AS (SELECT doc_id, text || CASE CAST(doc_id % 4 AS INTEGER)
        WHEN 1 THEN ' reach u' || CAST(doc_id AS VARCHAR)
                 || '@example.com or +1-202-555-0147'
        WHEN 2 THEN ' ssn 123-45-6789 ip 10.0.3.'
                 || CAST(doc_id % 200 AS VARCHAR)
        WHEN 3 THEN ' mail a.b-c@x.co.uk call +44-700-900-1234'
        ELSE '' END AS text FROM base),
m AS (SELECT doc_id, text, length(text) AS n_chars,
        length(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n_tok,
        length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
      FROM d),
keep AS (SELECT doc_id, text FROM m
         WHERE n_tok >= 30 AND n_chars <= 50000
           AND 100*n_alpha >= 50*n_chars AND 100*n_digit <= 30*n_chars),
r AS (SELECT doc_id, {redacted} AS text FROM keep),
u AS (SELECT min(doc_id) AS doc_id,
        length(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS tok
      FROM r GROUP BY text),
c AS (SELECT doc_id, CAST(tok AS BIGINT) AS tok,
        sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok
          AS tok_before FROM u)
SELECT CAST(floor(tok_before / 4096.0) AS BIGINT) AS bin,
       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1""",
    }


def oracles(sf: str = ORACLE_SF) -> dict[str, str]:
    tq = _tq(sf)
    mono_sub = (
        "SELECT DISTINCT conv_id FROM (SELECT conv_id, ts, max(ts) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx RANGE BETWEEN UNBOUNDED "
        "PRECEDING AND 1 PRECEDING) AS pm FROM t) WHERE ts < pm"
    )
    contig_sub = (
        "SELECT conv_id FROM t GROUP BY conv_id HAVING NOT ("
        "min(turn_idx)=0 AND count(DISTINCT turn_idx)=max(turn_idx)+1)"
    )
    span_sub = (
        "SELECT conv_id FROM t GROUP BY conv_id HAVING count(DISTINCT shard)>1"
    )
    dup_extras = (
        "SELECT coalesce(sum(c-1),0) FROM (SELECT count(*) AS c FROM t "
        "GROUP BY conv_id, turn_idx, role, text, tool, ts HAVING count(*)>1)"
    )
    rule_counts = f"""{tq},
counts(rule_id, severity, n) AS (
 SELECT 'TXT_ROLE_VOCAB','ERROR',count(*) FROM t WHERE role NOT IN {ROLE_SET_SQL}
 UNION ALL SELECT 'TXT_TOOL_PATTERN','ERROR',count(*) FROM t WHERE tool IS NOT NULL AND NOT regexp_matches(tool,{TOOL_RE_SQL})
 UNION ALL SELECT 'TXT_TOOL_ROLE','ERROR',count(*) FROM t WHERE tool IS NOT NULL AND role <> 'tool'
 UNION ALL SELECT 'TXT_TOOL_REQUIRED','ERROR',count(*) FROM t WHERE tool IS NULL AND role = 'tool'
 UNION ALL SELECT 'TXT_TEXT_EMPTY','ERROR',count(*) FROM t WHERE length(text)=0
 UNION ALL SELECT 'TXT_TEXT_NULL','ERROR',count(*) FROM t WHERE text IS NULL
 UNION ALL SELECT 'CONS_003_TURN_MIN','ERROR',count(*) FROM t WHERE turn_idx < 0
 UNION ALL SELECT 'TXT_TS_WINDOW','ERROR',count(*) FROM t WHERE ts < TIMESTAMP '2000-01-01' OR ts > TIMESTAMP '2035-01-01'
 UNION ALL SELECT 'TXT_TEXT_MAXLEN','WARNING',count(*) FROM t WHERE length(text) > 1000000
 UNION ALL SELECT 'DUP_002_TURN_KEY','ERROR',count(DISTINCT conv_id) FROM (SELECT conv_id FROM t GROUP BY conv_id, turn_idx HAVING count(*)>1)
 UNION ALL SELECT 'TXT_TURN_CONTIG','ERROR',count(*) FROM ({contig_sub})
 UNION ALL SELECT 'TXT_TS_MONOTONIC','WARNING',count(*) FROM ({mono_sub})
 UNION ALL SELECT 'TXT_CONV_SINGLE_SHARD','CRITICAL',count(*) FROM ({span_sub})
 UNION ALL SELECT 'DUP_001_ROW','WARNING',CAST(({dup_extras}) AS BIGINT)
 UNION ALL SELECT 'BIAS_001_ROLE_BALANCE','WARNING',CASE WHEN (SELECT min(c)*1.0/sum(c) FROM (SELECT count(*) AS c FROM t WHERE role IS NOT NULL GROUP BY role)) < 0.02 THEN 1 ELSE 0 END
 UNION ALL SELECT 'BIAS_002_TEXT_MISSING','WARNING',CASE WHEN (SELECT sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)*1.0/count(*) FROM t) > 0.1 THEN 1 ELSE 0 END
 UNION ALL SELECT 'BIAS_004_TOOL_MISSING_BY_SHARD','ERROR',CASE WHEN (
   SELECT stddev_pop(f) FROM (SELECT shard,
     sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END)*1.0/count(*) AS f
     FROM t GROUP BY shard)
 ) > 0.2 THEN 1 ELSE 0 END
 UNION ALL SELECT 'BIAS_001B_LEN_QUARTILES','WARNING',CASE WHEN (
   SELECT min(p) FROM (SELECT count(*)*1.0/(SELECT count(*) FROM t WHERE text IS NOT NULL) AS p
     FROM (SELECT ntile(4) OVER (ORDER BY length(text)) AS b FROM t WHERE text IS NOT NULL) GROUP BY b)
 ) < 0.05 THEN 1 ELSE 0 END
 UNION ALL SELECT 'STAT_GLOBAL_OUTLIER','WARNING',CASE WHEN (
   SELECT 100.0*sum(CASE WHEN abs(len - m) > 5*s THEN 1 ELSE 0 END)/count(*)
   FROM (SELECT length(text) AS len,
                (SELECT avg(length(text)) FROM t WHERE text IS NOT NULL) AS m,
                (SELECT stddev_pop(length(text)) FROM t WHERE text IS NOT NULL) AS s
         FROM t WHERE text IS NOT NULL)
 ) > 5.0 THEN 1 ELSE 0 END
)
SELECT rule_id, severity, CAST(n AS BIGINT) AS n FROM counts WHERE n > 0 ORDER BY rule_id"""

    # Per-shard verdicts: row-level rules attribute to the row's shard;
    # conversation-level rules to the conversation's MAIN shard (argmax row
    # count, ties to the lexicographically smaller shard — convstage.py
    # merge_segments_frame / exact_conv_frame). DUP_001 extras follow the
    # engine's two paths: within one shard -> that shard, unless the conv is
    # flagged for the exact fallback (overlapping per-shard turn ranges), in
    # which case -> main shard. Decision matrix = policy.py DEFAULT_THRESHOLDS.
    verdicts = f"""{tq},
ranges AS (SELECT conv_id, shard, min(turn_idx) AS lo, max(turn_idx) AS hi,
                  count(*) AS n FROM t GROUP BY conv_id, shard),
main AS (SELECT conv_id, shard AS main_shard FROM (
  SELECT conv_id, shard, row_number() OVER (
    PARTITION BY conv_id ORDER BY n DESC, shard ASC) AS rn FROM ranges)
  WHERE rn = 1),
flagged AS (SELECT DISTINCT conv_id FROM (
  SELECT conv_id, lo, lag(hi) OVER (
    PARTITION BY conv_id ORDER BY lo, hi) AS prev_hi FROM ranges)
  WHERE lo <= prev_hi),
dupg AS (SELECT conv_id, min(shard) AS dshard, count(*) AS c FROM t
  GROUP BY conv_id, turn_idx, role, text, tool, ts HAVING count(*)>1),
dupx AS (SELECT CASE WHEN f.conv_id IS NOT NULL THEN m.main_shard
                     ELSE g.dshard END AS shard,
                unnest(generate_series(1, CAST(g.c-1 AS BIGINT))) AS i
  FROM dupg g JOIN main m ON g.conv_id = m.conv_id
  LEFT JOIN flagged f ON g.conv_id = f.conv_id),
vio(shard, sev) AS (
 SELECT shard,'ERROR' FROM t WHERE role NOT IN {ROLE_SET_SQL}
 UNION ALL SELECT shard,'ERROR' FROM t WHERE tool IS NOT NULL AND NOT regexp_matches(tool,{TOOL_RE_SQL})
 UNION ALL SELECT shard,'ERROR' FROM t WHERE tool IS NOT NULL AND role <> 'tool'
 UNION ALL SELECT shard,'ERROR' FROM t WHERE tool IS NULL AND role = 'tool'
 UNION ALL SELECT shard,'ERROR' FROM t WHERE length(text)=0
 UNION ALL SELECT shard,'ERROR' FROM t WHERE text IS NULL
 UNION ALL SELECT shard,'ERROR' FROM t WHERE turn_idx < 0
 UNION ALL SELECT shard,'ERROR' FROM t WHERE ts < TIMESTAMP '2000-01-01' OR ts > TIMESTAMP '2035-01-01'
 UNION ALL SELECT shard,'WARNING' FROM t WHERE length(text) > 1000000
 UNION ALL SELECT shard,'WARNING' FROM dupx
 UNION ALL SELECT m.main_shard,'ERROR' FROM (SELECT DISTINCT conv_id FROM (
   SELECT conv_id FROM t GROUP BY conv_id, turn_idx HAVING count(*)>1)) d
   JOIN main m ON d.conv_id = m.conv_id
 UNION ALL SELECT m.main_shard,'ERROR' FROM ({contig_sub}) c
   JOIN main m ON c.conv_id = m.conv_id
 UNION ALL SELECT m.main_shard,'WARNING' FROM ({mono_sub}) c
   JOIN main m ON c.conv_id = m.conv_id
 UNION ALL SELECT m.main_shard,'CRITICAL' FROM ({span_sub}) c
   JOIN main m ON c.conv_id = m.conv_id
),
counts AS (SELECT shard,
  sum(CASE WHEN sev='CRITICAL' THEN 1 ELSE 0 END) AS n_critical,
  sum(CASE WHEN sev='ERROR' THEN 1 ELSE 0 END) AS n_error,
  sum(CASE WHEN sev='WARNING' THEN 1 ELSE 0 END) AS n_warning,
  sum(CASE WHEN sev='INFO' THEN 1 ELSE 0 END) AS n_info
  FROM vio GROUP BY shard),
shards AS (SELECT shard, count(*) AS rows_scanned FROM t GROUP BY shard)
SELECT s.shard,
  CASE WHEN coalesce(n_critical,0) >= 1 THEN 'rejected'
       WHEN coalesce(n_error,0) >= 5 THEN 'rejected'
       WHEN coalesce(n_error,0) >= 1 THEN 'conditional_accept'
       WHEN coalesce(n_warning,0) >= 5 THEN 'conditional_accept'
       ELSE 'accepted' END AS decision,
  (coalesce(n_critical,0)=0 AND coalesce(n_error,0)=0) AS passed,
  CAST(rows_scanned AS BIGINT) AS rows_scanned,
  CAST(coalesce(n_critical,0) AS BIGINT) AS n_critical,
  CAST(coalesce(n_error,0) AS BIGINT) AS n_error,
  CAST(coalesce(n_warning,0) AS BIGINT) AS n_warning,
  CAST(coalesce(n_info,0) AS BIGINT) AS n_info
FROM shards s LEFT JOIN counts c ON s.shard = c.shard"""

    return {
        **_pii_oracles(),
        "t_verdicts": verdicts,
        "t_role_vocab": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, "
                        f"role FROM t WHERE role NOT IN {ROLE_SET_SQL}",
        "t_tool_pattern": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, "
                          f"tool FROM t WHERE "
                          f"tool IS NOT NULL AND NOT regexp_matches(tool,{TOOL_RE_SQL})",
        "t_tool_role": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, "
                       f"tool FROM t WHERE tool IS NOT NULL AND role <> 'tool'",
        "t_text_empty": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx "
                        f"FROM t WHERE length(text)=0",
        "t_text_null": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx "
                       f"FROM t WHERE text IS NULL",
        "t_turn_range": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx "
                        f"FROM t WHERE turn_idx < 0",
        "t_ts_window": f"{tq} SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx "
                       f"FROM t WHERE "
                       f"ts < TIMESTAMP '2000-01-01' OR ts > TIMESTAMP '2035-01-01'",
        "t_dup_turn_key": f"{tq} SELECT conv_id, CAST(sum(c-1) AS BIGINT) AS dup_turns "
                          f"FROM (SELECT conv_id, count(*) AS c FROM t "
                          f"GROUP BY conv_id, turn_idx) WHERE c > 1 GROUP BY conv_id",
        "t_contig": f"{tq} {contig_sub}",
        "t_ts_mono": f"{tq} {mono_sub}",
        "t_conv_span_shards": f"{tq} {span_sub}",
        # one oracle row per EXTRA copy (count-1 per duplicate group), matching
        # the engine's per-extra-violation semantics even for >=3-copy groups
        "t_row_dup": f"{tq} SELECT conv_id, turn_idx FROM ("
                     f"SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, "
                     f"unnest(generate_series(1, CAST(c-1 AS BIGINT))) AS i "
                     f"FROM (SELECT conv_id, turn_idx, count(*) AS c FROM t "
                     f"GROUP BY conv_id, turn_idx, role, text, tool, ts "
                     f"HAVING count(*)>1) g)",
        "t_rule_counts": rule_counts,
        "t_clean_rows": f"""{tq},
badc AS (
  SELECT conv_id FROM t GROUP BY conv_id, turn_idx HAVING count(*)>1
  UNION SELECT conv_id FROM ({contig_sub})
  UNION SELECT conv_id FROM ({mono_sub})
  UNION SELECT conv_id FROM ({span_sub})
),
ok AS (
  SELECT DISTINCT shard, conv_id, turn_idx, role, text, tool, ts FROM t
  WHERE conv_id NOT IN (SELECT conv_id FROM badc)
    AND NOT coalesce(role NOT IN {ROLE_SET_SQL}, FALSE)
    AND NOT coalesce(tool IS NOT NULL
                     AND NOT regexp_matches(tool,{TOOL_RE_SQL}), FALSE)
    AND NOT coalesce(tool IS NOT NULL AND role <> 'tool', FALSE)
    AND NOT coalesce(tool IS NULL AND role = 'tool', FALSE)
    AND NOT coalesce(length(text) = 0, FALSE)
    AND text IS NOT NULL
    AND NOT coalesce(turn_idx < 0, FALSE)
    AND NOT coalesce(ts < TIMESTAMP '2000-01-01'
                     OR ts > TIMESTAMP '2035-01-01', FALSE)
    AND NOT coalesce(length(text) > 1000000, FALSE)
)
SELECT shard, count(*) AS n FROM ok GROUP BY shard ORDER BY shard""",
        "t_drift_exact": f"""{tq},
h AS (SELECT shard,
  CAST((length(text)>=1) AS BIGINT)+CAST((length(text)>=50) AS BIGINT)
  +CAST((length(text)>=100) AS BIGINT)+CAST((length(text)>=200) AS BIGINT)
  +CAST((length(text)>=400) AS BIGINT)+CAST((length(text)>=800) AS BIGINT)
  AS bin, count(*) AS n
  FROM t WHERE text IS NOT NULL GROUP BY 1, 2),
dense AS (SELECT s.shard, b.bin, coalesce(h.n, 0) AS n
  FROM (SELECT DISTINCT shard FROM h) s
  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS bin) b
  LEFT JOIN h ON h.shard = s.shard AND h.bin = b.bin),
tot AS (SELECT shard, sum(n) AS tn FROM dense GROUP BY shard),
base AS (SELECT bin, sum(n) AS bn FROM dense GROUP BY bin),
btot AS (SELECT sum(bn) AS bt FROM base),
psi AS (SELECT d.shard,
  sum((greatest(d.n / tt.tn, 1e-6) - greatest(b.bn / bt.bt, 1e-6))
      * ln(greatest(d.n / tt.tn, 1e-6) / greatest(b.bn / bt.bt, 1e-6)))
      AS v
  FROM dense d JOIN tot tt USING (shard) JOIN base b USING (bin)
  CROSS JOIN btot bt GROUP BY d.shard)
SELECT p.shard, CAST(tt.tn AS BIGINT) AS n_rows,
  CAST(p.v > 0.005 AS BIGINT) AS drifted
FROM psi p JOIN tot tt USING (shard) ORDER BY p.shard""",
        "t_textlen_hist": f"{tq} SELECT shard, "
                          f"CAST((length(text)>=1) AS BIGINT)"
                          f"+CAST((length(text)>=50) AS BIGINT)"
                          f"+CAST((length(text)>=100) AS BIGINT)"
                          f"+CAST((length(text)>=200) AS BIGINT)"
                          f"+CAST((length(text)>=400) AS BIGINT)"
                          f"+CAST((length(text)>=800) AS BIGINT) AS bin, "
                          f"count(*) AS n "
                          f"FROM t WHERE text IS NOT NULL "
                          f"GROUP BY 1, 2 ORDER BY 1, 2",
        "t_distinct_convs_exact": f"{tq} SELECT CAST(count(DISTINCT conv_id)"
                                  f" AS BIGINT) AS n_convs FROM t",
        "t_drift_ks_exact": f"{tq}, c AS (SELECT shard, length(text) AS "
                            f"len, count(*) AS n FROM t "
                            f"WHERE text IS NOT NULL GROUP BY 1, 2), "
                            f"grid AS (SELECT s.shard, l.len FROM "
                            f"(SELECT DISTINCT shard FROM c) s, "
                            f"(SELECT DISTINCT len FROM c) l), "
                            f"j AS (SELECT g.shard, g.len, "
                            f"coalesce(c.n, 0) AS n FROM grid g "
                            f"LEFT JOIN c ON c.shard = g.shard "
                            f"AND c.len = g.len), "
                            f"cum AS (SELECT shard, len, CAST(sum(n) OVER ("
                            f"PARTITION BY shard ORDER BY len) AS BIGINT) "
                            f"AS cs FROM j), "
                            f"tot AS (SELECT shard, max(cs) AS ns "
                            f"FROM cum GROUP BY 1), "
                            f"bcum AS (SELECT len, CAST(sum(cs) AS BIGINT) "
                            f"AS cb FROM cum GROUP BY len), "
                            f"nbt AS (SELECT CAST(sum(ns) AS BIGINT) AS nb "
                            f"FROM tot) "
                            f"SELECT cum.shard, CAST(tot.ns AS BIGINT) AS "
                            f"n_rows, CAST(max(abs(cum.cs * nbt.nb "
                            f"- bcum.cb * tot.ns)) AS BIGINT) AS ks_num, "
                            f"CAST(tot.ns * nbt.nb AS BIGINT) AS ks_den "
                            f"FROM cum JOIN tot USING (shard) "
                            f"JOIN bcum USING (len) CROSS JOIN nbt "
                            f"GROUP BY cum.shard, tot.ns, nbt.nb "
                            f"ORDER BY cum.shard",
        "t_role_transitions": f"{tq}, s AS (SELECT role, "
                              f"lead(role) OVER (PARTITION BY conv_id "
                              f"ORDER BY turn_idx, ts, role) AS nxt FROM t) "
                              f"SELECT role AS from_type, nxt AS to_type, "
                              f"CAST(count(*) AS BIGINT) AS n FROM s "
                              f"WHERE nxt IS NOT NULL "
                              f"GROUP BY 1, 2 ORDER BY 1, 2",
        "t_turn_gaps": f"{tq}, g AS (SELECT conv_id, "
                       f"epoch_us(ts) - epoch_us(lag(ts) OVER ("
                       f"PARTITION BY conv_id ORDER BY turn_idx, ts)) AS gap "
                       f"FROM t) "
                       f"SELECT conv_id, CAST(count(gap) AS BIGINT) AS n_gaps, "
                       f"CAST(max(gap) AS BIGINT) AS max_gap_us "
                       f"FROM g WHERE gap IS NOT NULL "
                       f"GROUP BY conv_id ORDER BY conv_id",
        "t_conv_stats": f"{tq} SELECT conv_id, count(*) AS n_turns, "
                        f"CAST(min(turn_idx) AS BIGINT) AS turn_min, "
                        f"CAST(max(turn_idx) AS BIGINT) AS turn_max "
                        f"FROM t GROUP BY conv_id",
        "t_rolling_max": f"{tq} SELECT conv_id, "
                         f"CAST(max(s) AS BIGINT) AS max_roll3 FROM ("
                         f"SELECT conv_id, sum(coalesce(length(text),0)) "
                         f"OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, "
                         f"coalesce(length(text),-1) "
                         f"ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s "
                         f"FROM t) GROUP BY conv_id",
        "t_role_stats": f"{tq} SELECT role, count(*) AS n, "
                        f"CAST(sum(coalesce(length(text),0)) AS BIGINT) AS sum_len, "
                        f"CAST(min(coalesce(length(text),0)) AS BIGINT) AS min_len, "
                        f"CAST(max(coalesce(length(text),0)) AS BIGINT) AS max_len "
                        f"FROM t GROUP BY role",
        "events_validate": """
WITH v AS (
 SELECT event_id, 'EV_TYPE_VOCAB' AS rule_id, 'WARNING' AS severity FROM events
  WHERE event_type NOT IN ('view','click','purchase','signup')
 UNION ALL
 SELECT event_id, 'EV_VALUE_RANGE', 'ERROR' FROM events WHERE value < 0 OR value > 400
 UNION ALL
 SELECT event_id, 'EV_TS_WINDOW', 'ERROR' FROM events
  WHERE ts < TIMESTAMP '2024-01-01' OR ts > TIMESTAMP '2024-02-01'
) SELECT * FROM v ORDER BY event_id, rule_id""",
        "events_by_type": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(user_id) AS BIGINT) AS min_user,
       CAST(max(user_id) AS BIGINT) AS max_user
FROM events GROUP BY event_type""",
        "events_daily": """
SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
       CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type, date_trunc('day', ts)""",
        "cust_orders_join": """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",
        "t_conv_doc": f"{tq} SELECT conv_id, "
                      f"CAST(length(string_agg(coalesce(text,''), chr(10) "
                      f"ORDER BY turn_idx, ts, coalesce(text,''))) AS BIGINT)"
                      f" AS doc_len, "
                      f"md5(string_agg(coalesce(text,''), chr(10) "
                      f"ORDER BY turn_idx, ts, coalesce(text,''))) AS doc_md5"
                      f" FROM t GROUP BY conv_id",
        "events_hopping": """
WITH e AS (
  SELECT date_trunc('hour', ts) AS wstart, event_type,
         CAST(round(value*100,0) AS BIGINT) AS cents FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type,
         CAST(round(value*100,0) AS BIGINT) FROM events)
SELECT wstart, event_type, count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
        "cust_order_dist": """
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_custs
FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN (
        SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY 1 ORDER BY 1""",
        "orders_pivot": """
SELECT o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
  CAST(sum(CASE WHEN o_orderstatus='F'
    THEN CAST(round(o_totalprice*100,0) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS cents_f,
  CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
  CAST(sum(CASE WHEN o_orderstatus='O'
    THEN CAST(round(o_totalprice*100,0) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS cents_o,
  CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
  CAST(sum(CASE WHEN o_orderstatus='P'
    THEN CAST(round(o_totalprice*100,0) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS cents_p
FROM orders GROUP BY 1 ORDER BY 1""",
        "cust_nation_region": """
SELECT r_name, count(*) AS n_custs,
       CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name""",
        "cust_no_urgent": """
SELECT c_mktsegment, count(*) AS n_custs
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1 ORDER BY 1""",
        "events_mode_type": """
SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS mode_type,
       CAST(n AS BIGINT) AS n
FROM (SELECT user_id, event_type, count(*) AS n,
        row_number() OVER (PARTITION BY user_id
          ORDER BY count(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type)
WHERE rn = 1 ORDER BY user_id""",
        "events_view_no_purchase": """
SELECT CAST(count(*) AS BIGINT) AS n_view_only FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')""",
        "events_retention": """
WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
           FROM events)
SELECT CAST(count(*) AS BIGINT) AS n_retained_pairs
FROM d a JOIN d b ON a.user_id = b.user_id
  AND b.day = a.day + INTERVAL 1 DAY""",
        "doc_dup_windows": """
WITH pos AS (SELECT doc_id, text,
                    unnest(range(1, greatest(length(text)-30, 1))) AS i
             FROM documents),
w AS (SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 32) AS win
      FROM pos),
dup AS (SELECT win FROM w GROUP BY 1 HAVING count(*) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_windows
FROM w JOIN dup USING (win) GROUP BY 1 ORDER BY 1""",
        "events_peak_rate": """
SELECT user_id, CAST(max(w) AS BIGINT) AS peak_cnt FROM (
  SELECT user_id, count(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 4 HOUR PRECEDING AND CURRENT ROW) AS w
  FROM events) GROUP BY user_id ORDER BY user_id""",
        "events_rank_head": """
SELECT event_type, event_id, bucket, CAST(drnk AS BIGINT) AS rnk FROM (
  SELECT event_type, event_id,
         CAST(floor(value) AS BIGINT) AS bucket,
         dense_rank() OVER (PARTITION BY event_type
           ORDER BY CAST(floor(value) AS BIGINT) DESC) AS drnk
  FROM events WHERE value IS NOT NULL)
WHERE drnk <= 3 ORDER BY event_type, rnk, event_id""",
        "daily_full_join": """
SELECT CAST(COALESCE(o.dom, e.dom) AS BIGINT) AS dom,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS order_cnt,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS event_cnt
FROM (SELECT CAST(date_part('day', o_orderdate) AS BIGINT) AS dom,
             count(*) AS n FROM orders GROUP BY 1) o
FULL OUTER JOIN
     (SELECT CAST(date_part('day', ts) AS BIGINT) AS dom,
             count(*) AS n FROM events GROUP BY 1) e
ON o.dom = e.dom ORDER BY dom""",
        "events_key_skew": """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
t AS (SELECT sum(n) AS s FROM c)
SELECT user_id, n, CAST((n * 1000000) // s AS BIGINT) AS ppm
FROM c, t ORDER BY n DESC, user_id LIMIT 20""",
        "events_above_user_avg": """
WITH s AS (SELECT user_id,
                  sum(CAST(round(value*100, 0) AS BIGINT)) AS sc,
                  count(*) AS n
           FROM events GROUP BY user_id)
SELECT e.user_id,
       CAST(count(*) FILTER (
         CAST(round(e.value*100, 0) AS BIGINT) * s.n > s.sc
       ) AS BIGINT) AS n_above
FROM events e JOIN s USING (user_id)
GROUP BY e.user_id ORDER BY e.user_id""",
        "doc_mad": """
WITH m AS (SELECT lang,
                  CAST(percentile_disc(0.5)
                       WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS med
           FROM documents GROUP BY lang)
SELECT d.lang, m.med,
       CAST(percentile_disc(0.5)
            WITHIN GROUP (ORDER BY abs(d.n_chars - m.med)) AS BIGINT) AS mad
FROM documents d JOIN m USING (lang)
GROUP BY d.lang, m.med ORDER BY d.lang""",
        "doc_top_words": r"""
WITH w AS (SELECT lang,
                  unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')) AS word
           FROM documents),
c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2),
r AS (SELECT lang, word, n, row_number() OVER (
        PARTITION BY lang ORDER BY n DESC, word) AS rn FROM c)
SELECT lang, word, n FROM r WHERE rn <= 5 ORDER BY lang, n DESC, word""",
        "events_repeat_buyers": """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id""",
        "events_value_deciles": """
WITH e AS (SELECT event_type,
                  CAST(round(value*100, 0) AS BIGINT) AS cents
           FROM events),
cuts AS (SELECT unnest(quantile_disc(cents,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS cut FROM e)
SELECT event_type,
       CAST(1 + (SELECT count(*) FROM cuts WHERE cut < cents)
            AS BIGINT) AS bucket,
       count(*) AS n
FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
        "doc_chunks": """
WITH pos AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(length(text) - 100, 1), 400)) AS start
  FROM documents),
c AS (SELECT doc_id, CAST(start // 400 AS BIGINT) AS chunk_idx,
             substring(text, CAST(start + 1 AS INT), 500) AS chunk
      FROM pos)
SELECT doc_id, chunk_idx, CAST(length(chunk) AS BIGINT) AS chunk_len,
       md5(chunk) AS chunk_md5
FROM c ORDER BY doc_id, chunk_idx""",
        "t_role_repeats": f"""{tq},
s AS (SELECT conv_id, role, lag(role) OVER (
        PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev FROM t)
SELECT conv_id, CAST(count(*) FILTER (role = prev) AS BIGINT) AS n_repeats
FROM s GROUP BY conv_id ORDER BY conv_id""",
        "t_max_role_run": f"""{tq},
t2 AS (SELECT conv_id, turn_idx, ts, role,
              row_number() OVER () AS rid FROM t),
s AS (SELECT conv_id, role,
        row_number() OVER (PARTITION BY conv_id
          ORDER BY turn_idx, ts, role, rid) AS rn,
        row_number() OVER (PARTITION BY conv_id, role
          ORDER BY turn_idx, ts, role, rid) AS rnr
      FROM t2),
i AS (SELECT conv_id, count(*) AS len
      FROM s GROUP BY conv_id, role, rn - rnr)
SELECT conv_id, CAST(max(len) AS BIGINT) AS max_run
FROM i GROUP BY conv_id ORDER BY conv_id""",
        "events_transitions": """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_funnel": """
WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e
       JOIN t1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= t1.ts1 GROUP BY 1),
t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e
       JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= t2.ts2 GROUP BY 1)
SELECT u.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS steps_completed
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id) ORDER BY user_id""",
        "events_value_outliers": """
WITH c AS (SELECT event_type,
                  CAST(round(value*100, 0) AS BIGINT) AS v FROM events),
st AS (SELECT event_type, count(*) AS n, sum(v) AS s1, sum(v*v) AS s2
       FROM c GROUP BY 1)
SELECT c.event_type,
       CAST(max(st.n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN (st.n*c.v - st.s1)*(st.n*c.v - st.s1)
                        > 4*(st.n*st.s2 - st.s1*st.s1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM c JOIN st USING (event_type) GROUP BY 1 ORDER BY 1""",
        "events_attrib_pairs": """
SELECT CAST(v.user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
GROUP BY 1 ORDER BY 1""",
        "orders_daily_cum": """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM orders GROUP BY 1)
SELECT day, CAST(n AS BIGINT) AS n, sum_cents,
       CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS cum_n,
       CAST(sum(sum_cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS cum_cents
FROM daily ORDER BY day""",
        "li_not_open_orders": """
SELECT CAST(count(*) AS BIGINT) AS n_not_open FROM lineitem
WHERE NOT EXISTS (SELECT 1 FROM orders
  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'O')""",
        "doc_pack_bins": r"""
WITH d AS (SELECT doc_id,
  CAST(length(list_filter(regexp_split_to_array(text, '\s+'),
    x -> x <> '')) AS BIGINT) AS tok FROM documents),
c AS (SELECT doc_id, tok,
  sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok
    AS tok_before FROM d)
SELECT CAST(floor(tok_before / 4096.0) AS BIGINT) AS bin,
       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1""",
        "li_ship_lag": """
SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 7.0)
         AS BIGINT) AS lag_week,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1""",
        "doc_charstats": r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(length(regexp_replace(coalesce(text,''), '[^0-9]', '', 'g'))
    AS BIGINT) AS n_digit,
  CAST(length(regexp_replace(coalesce(text,''), '[^A-Z]', '', 'g'))
    AS BIGINT) AS n_upper,
  CAST(length(coalesce(text,''))
    - length(regexp_replace(coalesce(text,''), '[ \t\n]', '', 'g'))
    AS BIGINT) AS n_space,
  CAST(length(regexp_replace(coalesce(text,''), '[0-9A-Za-z \t\n]', '', 'g'))
    AS BIGINT) AS n_other
FROM documents ORDER BY 1""",
        "orders_distinct_cust": """
SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM orders GROUP BY 1 ORDER BY 1""",
        "part_units": r"""
SELECT regexp_extract(p_name, '(\w+)$', 1) AS unit, count(*) AS n
FROM part GROUP BY 1 ORDER BY 1""",
        "cust_status_confound": """
SELECT CAST(count(*) AS BIGINT) AS n_multi_order_custs,
       CAST(coalesce(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_confounded
FROM (SELECT o_custkey, count(*) AS c,
             count(DISTINCT o_orderstatus) AS d
      FROM orders GROUP BY o_custkey)
WHERE c >= 2""",
        "role_variants": f"""{tq},
unioned AS (SELECT role FROM t UNION ALL SELECT upper(role) FROM t)
SELECT lower(trim(role)) AS canonical,
       CAST(count(DISTINCT role) AS BIGINT) AS n_variants,
       CAST(count(*) AS BIGINT) AS n_rows
FROM unioned WHERE role IS NOT NULL
GROUP BY 1 HAVING count(DISTINCT role) > 1""",
        "li_col_profile": """
WITH p(col, n, n_null, n_zero, n_negative, n_inf, vmin, vmax, m, v) AS (
 SELECT 'l_quantity', count(*), sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END),
        sum(CASE WHEN l_quantity = 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN isinf(l_quantity) THEN 1 ELSE 0 END),
        min(l_quantity), max(l_quantity), avg(l_quantity), var_pop(l_quantity) FROM lineitem
 UNION ALL
 SELECT 'l_extendedprice', count(*), sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
        sum(CASE WHEN l_extendedprice = 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN isinf(l_extendedprice) THEN 1 ELSE 0 END),
        min(l_extendedprice), max(l_extendedprice), avg(l_extendedprice), var_pop(l_extendedprice) FROM lineitem
 UNION ALL
 SELECT 'l_discount', count(*), sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END),
        sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN l_discount < 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN isinf(l_discount) THEN 1 ELSE 0 END),
        min(l_discount), max(l_discount), avg(l_discount), var_pop(l_discount) FROM lineitem
 UNION ALL
 SELECT 'l_tax', count(*), sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END),
        sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END),
        sum(CASE WHEN isinf(l_tax) THEN 1 ELSE 0 END),
        min(l_tax), max(l_tax), avg(l_tax), var_pop(l_tax) FROM lineitem
),
g AS (SELECT avg(m) AS mm, stddev_samp(m) AS ms FROM p WHERE n_null < n)
SELECT col AS column, CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
       CAST(n_zero AS BIGINT) AS n_zero, CAST(n_negative AS BIGINT) AS n_negative,
       CAST(n_inf AS BIGINT) AS n_inf,
       (n_null = n) AS all_null,
       (n_null < n AND vmin = vmax) AS constant,
       (n_null < n AND v < 0.01) AS low_variance,
       (n_null < n AND ms > 0 AND abs(m - mm) / ms > 3) AS mean_outlier
FROM p, g ORDER BY col""",
        "cust_enrich": """
SELECT coalesce(c.c_mktsegment, '__miss__') AS segment, count(*) AS n
FROM orders o LEFT JOIN
  (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0) c
ON o.o_custkey = c.c_custkey
GROUP BY 1""",
        "events_sessions": """
WITH m AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
             THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM m GROUP BY user_id ORDER BY user_id""",
        "events_value_p50": """
SELECT event_type,
       percentile_disc(0.5) WITHIN GROUP (
         ORDER BY CAST(round(value*100) AS BIGINT)) AS p50_cents
FROM events GROUP BY event_type ORDER BY event_type""",
        "events_value_p50_cont": """
SELECT event_type,
       CAST(2 * percentile_cont(0.5) WITHIN GROUP (
         ORDER BY CAST(round(value*100) AS BIGINT)) AS BIGINT)
         AS p50x2_cents
FROM events GROUP BY event_type ORDER BY event_type""",
        "events_head_per_type": """
SELECT event_type, CAST(event_id AS BIGINT) AS event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 3
ORDER BY event_type, event_id""",
        "events_last_view": """
WITH m AS (SELECT event_id,
        max(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
      FROM events)
SELECT CAST(event_id AS BIGINT) AS event_id,
       epoch_us(lv) AS last_view_us
FROM m WHERE lv IS NOT NULL ORDER BY event_id""",
        "li_corr_pairs": """
WITH v AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                  CAST(round(l_extendedprice) AS BIGINT) AS p,
                  CAST(round(l_discount*10000) AS BIGINT) AS d,
                  CAST(round(l_tax*10000) AS BIGINT) AS t FROM lineitem)
SELECT * FROM (
 SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b, count(*) AS n,
        CAST(sum(d) AS BIGINT) AS sum_a, CAST(sum(p) AS BIGINT) AS sum_b,
        CAST(sum(d*p) AS BIGINT) AS sum_ab,
        CAST(sum(d*d) AS BIGINT) AS sum_a2,
        CAST(sum(p*p) AS BIGINT) AS sum_b2 FROM v
 UNION ALL
 SELECT 'l_discount', 'l_quantity', count(*),
        CAST(sum(d) AS BIGINT), CAST(sum(q) AS BIGINT),
        CAST(sum(d*q) AS BIGINT), CAST(sum(d*d) AS BIGINT),
        CAST(sum(q*q) AS BIGINT) FROM v
 UNION ALL
 SELECT 'l_discount', 'l_tax', count(*),
        CAST(sum(d) AS BIGINT), CAST(sum(t) AS BIGINT),
        CAST(sum(d*t) AS BIGINT), CAST(sum(d*d) AS BIGINT),
        CAST(sum(t*t) AS BIGINT) FROM v
 UNION ALL
 SELECT 'l_extendedprice', 'l_quantity', count(*),
        CAST(sum(p) AS BIGINT), CAST(sum(q) AS BIGINT),
        CAST(sum(p*q) AS BIGINT), CAST(sum(p*p) AS BIGINT),
        CAST(sum(q*q) AS BIGINT) FROM v
 UNION ALL
 SELECT 'l_extendedprice', 'l_tax', count(*),
        CAST(sum(p) AS BIGINT), CAST(sum(t) AS BIGINT),
        CAST(sum(p*t) AS BIGINT), CAST(sum(p*p) AS BIGINT),
        CAST(sum(t*t) AS BIGINT) FROM v
 UNION ALL
 SELECT 'l_quantity', 'l_tax', count(*),
        CAST(sum(q) AS BIGINT), CAST(sum(t) AS BIGINT),
        CAST(sum(q*t) AS BIGINT), CAST(sum(q*q) AS BIGINT),
        CAST(sum(t*t) AS BIGINT) FROM v
) ORDER BY col_a, col_b""",
        "li_orders_join": """
SELECT o_orderstatus,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus""",
        "events_rollup": """
WITH e AS (SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(round(value*100) AS BIGINT) AS cents FROM events)
SELECT coalesce(event_type, '__all__') AS event_type,
       coalesce(epoch_us(day), -1) AS day_us,
       count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM e
GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
ORDER BY 1, 2""",
        "cust_top_orders": """
SELECT CAST(l_orderkey AS BIGINT) AS o_orderkey,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
              * (10000 - CAST(round(l_discount*10000,0) AS BIGINT)))
            AS BIGINT) AS revenue_u,
       epoch_us(o_orderdate) AS o_date_us,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_u DESC, o_orderkey
LIMIT 10""",
        "events_props_k": """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type""",
        "doc_dedup_exact": "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, "
                           "count(*) AS n_copies FROM documents GROUP BY text",
        "doc_token_count": "SELECT doc_id, CAST(length(list_filter("
                           "regexp_split_to_array(text, '\\s+'), x -> x <> '')) "
                           "AS BIGINT) AS n_tokens FROM documents",
        "doc_quality": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS BIGINT) AS n_punct
FROM documents""",
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        "doc_curate": r"""
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT)+100000, text FROM documents),
m AS (SELECT doc_id, text,
        length(text) AS n_chars,
        length(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n_tokens,
        length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
        CASE WHEN length(text) >= 5
             THEN list_sort(list_distinct([substring(text, i, 5)
                  for i in generate_series(1, length(text)-4)]))
             ELSE [text] END AS sh
      FROM d),
r AS (SELECT *, CASE WHEN n_tokens < 30 THEN 'too_short'
            WHEN n_chars > 50000 THEN 'too_long'
            WHEN 100*n_alpha < 50*n_chars THEN 'low_alpha'
            WHEN 100*n_digit > 30*n_chars THEN 'digit_heavy'
            ELSE '' END AS reason FROM m),
k AS (SELECT *,
        min(CASE WHEN reason = '' THEN doc_id END)
          OVER (PARTITION BY sh) AS set_canon,
        min(CASE WHEN reason = '' THEN doc_id END)
          OVER (PARTITION BY text) AS text_canon
      FROM r)
SELECT doc_id,
       (reason = '' AND doc_id = set_canon) AS keep,
       CASE WHEN reason <> '' THEN reason
            WHEN doc_id = set_canon THEN ''
            WHEN text_canon < doc_id THEN 'exact_dup'
            ELSE 'near_dup' END AS stage
FROM k ORDER BY doc_id""",
        "doc_quality_filter": r"""
WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        length(text) AS n_chars,
        length(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n_tokens,
        length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
        regexp_matches(text, '[.!?]\s*$') AS terminal
      FROM documents)
SELECT doc_id,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN n_chars > 50000 THEN 'too_long'
            WHEN 100*n_alpha < 50*n_chars THEN 'low_alpha'
            WHEN 100*n_digit > 30*n_chars THEN 'digit_heavy'
            WHEN NOT coalesce(terminal, FALSE) THEN 'no_terminal_punct'
            ELSE '' END AS reason,
       (CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN n_chars > 50000 THEN 'too_long'
            WHEN 100*n_alpha < 50*n_chars THEN 'low_alpha'
            WHEN 100*n_digit > 30*n_chars THEN 'digit_heavy'
            WHEN NOT coalesce(terminal, FALSE) THEN 'no_terminal_punct'
            ELSE '' END) = '' AS keep
FROM m ORDER BY doc_id""",
        "doc_sample_per_source": """
SELECT source, CAST(doc_id AS BIGINT) AS doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents) WHERE rn <= 2
ORDER BY source, doc_id""",
        "doc_word_counts": r"""
WITH w AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')) AS word FROM documents)
SELECT word, count(*) AS n FROM w
GROUP BY word ORDER BY n DESC, word LIMIT 50""",
        "doc_normalize": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(n) AS BIGINT) AS norm_len,
       md5(n) AS norm_md5
FROM (SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
      FROM documents WHERE text IS NOT NULL)
ORDER BY doc_id""",
        # splitmix64 restated exactly: mod-2^64 multiplies as 32-bit-split
        # HUGEINT products (a full 64x64 product overflows INT128)
        "doc_uniform_sample": """
WITH s1 AS (SELECT doc_id, n_chars,
        xor(CAST(doc_id AS UBIGINT), CAST(doc_id AS UBIGINT) >> 30) AS a
      FROM documents),
s2 AS (SELECT doc_id, n_chars, CAST(((CAST(a AS HUGEINT) % 4294967296)
        * 484763065 + (((CAST(a AS HUGEINT) % 4294967296) * 3210233709
        + (CAST(a AS HUGEINT) // 4294967296) * 484763065) % 4294967296)
        * 4294967296) % 18446744073709551616 AS UBIGINT) AS b FROM s1),
s3 AS (SELECT doc_id, n_chars, xor(b, b >> 27) AS c FROM s2),
s4 AS (SELECT doc_id, n_chars, CAST(((CAST(c AS HUGEINT) % 4294967296)
        * 321982955 + (((CAST(c AS HUGEINT) % 4294967296) * 2496678331
        + (CAST(c AS HUGEINT) // 4294967296) * 321982955) % 4294967296)
        * 4294967296) % 18446744073709551616 AS UBIGINT) AS d FROM s3),
s5 AS (SELECT doc_id, n_chars, xor(d, d >> 31) AS h FROM s4)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM (SELECT * FROM s5 ORDER BY h LIMIT 100) ORDER BY doc_id""",
        "doc_weighted_sample": """
WITH s1 AS (SELECT doc_id, n_chars,
        xor(CAST(doc_id AS UBIGINT), CAST(doc_id AS UBIGINT) >> 30) AS a
      FROM documents),
s2 AS (SELECT doc_id, n_chars, CAST(((CAST(a AS HUGEINT) % 4294967296)
        * 484763065 + (((CAST(a AS HUGEINT) % 4294967296) * 3210233709
        + (CAST(a AS HUGEINT) // 4294967296) * 484763065) % 4294967296)
        * 4294967296) % 18446744073709551616 AS UBIGINT) AS b FROM s1),
s3 AS (SELECT doc_id, n_chars, xor(b, b >> 27) AS c FROM s2),
s4 AS (SELECT doc_id, n_chars, CAST(((CAST(c AS HUGEINT) % 4294967296)
        * 321982955 + (((CAST(c AS HUGEINT) % 4294967296) * 2496678331
        + (CAST(c AS HUGEINT) // 4294967296) * 321982955) % 4294967296)
        * 4294967296) % 18446744073709551616 AS UBIGINT) AS d FROM s3),
s5 AS (SELECT doc_id, n_chars,
        (CAST(xor(d, d >> 31) AS HUGEINT) // 4294967296) * 2147483648
          // greatest(CAST(n_chars AS HUGEINT), 1) AS p FROM s4)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM (SELECT * FROM s5 ORDER BY p, doc_id LIMIT 100) ORDER BY doc_id""",
        "doc_temp_sample": """
WITH q AS (SELECT lang, CAST(floor(sqrt(count(*))) AS BIGINT) AS quota
           FROM documents GROUP BY 1),
r AS (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(text), doc_id) AS rn
      FROM documents)
SELECT r.lang, CAST(r.doc_id AS BIGINT) AS doc_id
FROM r JOIN q USING (lang) WHERE rn <= quota ORDER BY 1, 2""",
        "doc_decontam": r"""
WITH frag AS (SELECT doc_id AS bid,
    array_to_string(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')[1:8], ' ') AS f
  FROM documents WHERE doc_id < 20),
aug AS (SELECT d.doc_id,
    CASE WHEN d.doc_id % 5 = 2 THEN d.text || ' ' || frag.f
         ELSE d.text END AS text
  FROM documents d JOIN frag ON frag.bid = d.doc_id % 20
  WHERE d.doc_id >= 20),
bw AS (SELECT list_filter(string_split_regex(text, '\s+'),
                          x -> x <> '') AS w
       FROM documents WHERE doc_id < 20),
bsh AS (SELECT DISTINCT unnest(
          CASE WHEN len(w) >= 8
            THEN list_distinct([array_to_string(w[i:i+7], ' ')
                   for i in generate_series(1, len(w) - 7)])
            ELSE [array_to_string(w, ' ')] END) AS sh
        FROM bw),
tw AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '') AS w
       FROM aug),
tsh AS (SELECT doc_id, unnest(
          CASE WHEN len(w) >= 8
            THEN list_distinct([array_to_string(w[i:i+7], ' ')
                   for i in generate_series(1, len(w) - 7)])
            ELSE [array_to_string(w, ' ')] END) AS sh
        FROM tw),
hits AS (SELECT doc_id, count(*) AS n_hits
         FROM tsh JOIN bsh USING (sh) GROUP BY 1)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS contaminated
FROM aug a LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""",
        "doc_tfidf": r"""
WITH w AS (SELECT doc_id,
                  unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')) AS word
           FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.word,
              tf.tf * CAST(floor(1e6 * n.n / dfreq.df + 0.5) AS BIGINT) AS s
       FROM tf JOIN dfreq USING (word) CROSS JOIN n),
tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS tfidf_ppm
        FROM sc GROUP BY 1),
top AS (SELECT doc_id, word AS top_word, CAST(s AS BIGINT) AS top_ppm
        FROM (SELECT doc_id, word, s,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY s DESC, word ASC) AS rn FROM sc)
        WHERE rn = 1)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id, t.tfidf_ppm,
       p.top_word, p.top_ppm
FROM tot t JOIN top p USING (doc_id) ORDER BY doc_id""",
        "doc_top_words_sketch": r"""
WITH w AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')) AS word FROM documents)
SELECT word, count(*) AS n FROM w
GROUP BY word ORDER BY n DESC, word LIMIT 20""",
        "doc_repetition": r"""
WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      FROM documents),
w AS (SELECT doc_id, unnest(ws) AS word FROM base),
wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
wstat AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct_words,
                 max(c) AS top_word_n FROM wc GROUP BY doc_id),
b AS (SELECT doc_id,
        unnest([ws[i] || chr(1) || ws[i+1]
                for i in generate_series(1, len(ws)-1)]) AS bg
      FROM base WHERE len(ws) >= 2),
bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg),
bstat AS (SELECT doc_id, sum(c) AS n_bigrams,
                 count(*) AS n_distinct_bigrams,
                 max(c) AS top_bigram_n FROM bc GROUP BY doc_id)
SELECT base.doc_id,
       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(n_distinct_words, 0) AS BIGINT) AS n_distinct_words,
       CAST(coalesce(top_word_n, 0) AS BIGINT) AS top_word_n,
       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
       CAST(coalesce(top_bigram_n, 0) AS BIGINT) AS top_bigram_n
FROM base LEFT JOIN wstat USING (doc_id) LEFT JOIN bstat USING (doc_id)
ORDER BY doc_id""",
        "doc_token_bpe": r"""
SELECT doc_id, CAST(length(regexp_extract_all(text,
       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens_bpe
FROM documents""",
        # planted-duplicate oracle for the text near-dup pipelines: a pair
        # surfaces at the exactness point (minhash threshold 1.0 / simhash
        # hamming 0 + exact verify) iff the two texts' 5-gram shingle SETS
        # are identical — stated in SQL as group-by-shingle-set over the
        # union-shifted table (byte-shingles == char-substrings: the
        # documents fixture is pure ASCII)
        "doc_dup_clusters": f"""
WITH RECURSIVE p AS ({_WORD_NGRAM_PAIRS_SQL.replace('ORDER BY 1, 2', '')}),
bidir AS (SELECT id_a AS u, id_b AS v FROM p
          UNION SELECT id_b, id_a FROM p),
reach(u, v) AS (
  SELECT u, v FROM bidir
  UNION
  SELECT r.u, b.v FROM reach r JOIN bidir b ON r.v = b.u
  WHERE b.v <> r.u)
SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS cluster_id
FROM reach GROUP BY u ORDER BY 1""",
        "doc_minhash_planted": _SHINGLE_SET_PAIRS_SQL,
        "doc_ngram_planted": _WORD_NGRAM_PAIRS_SQL,
        "doc_simhash_planted": _SHINGLE_SET_PAIRS_SQL,
        "emb_near_dups": """
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
           UNION ALL
           SELECT CAST(vec_id AS BIGINT)+100000, embedding FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.999
ORDER BY 1, 2""",
        "emb_quantize": """
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS mx FROM e)
SELECT vec_id,
       unnest(generate_series(1, len(v))) - 1 AS dim,
       CAST(CASE WHEN mx = 0 THEN 0
                 ELSE round(127 * unnest(v) / mx) END AS BIGINT) AS q
FROM m ORDER BY vec_id, dim""",
        "emb_cluster_assign": """
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
q AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS dim,
             CAST(CASE WHEN mx = 0 THEN 0
                       ELSE round(127 * unnest(v) / mx) END AS BIGINT) AS qv
      FROM m),
c AS (SELECT vec_id AS cid, dim, qv AS cq FROM q WHERE vec_id < 8),
d AS (SELECT q.vec_id, c.cid, sum((q.qv - c.cq)*(q.qv - c.cq)) AS d2
      FROM q JOIN c USING (dim) GROUP BY q.vec_id, c.cid),
a AS (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM d)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster
FROM a WHERE rn = 1 ORDER BY vec_id""",
        "emb_semdedup": """
WITH e0 AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding
            FROM embeddings
            UNION ALL
            SELECT CAST(vec_id AS BIGINT)+100000, embedding
            FROM embeddings),
e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM e0),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
q AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS dim,
             CAST(CASE WHEN mx = 0 THEN 0
                       ELSE round(127 * unnest(v) / mx) END AS BIGINT) AS qv
      FROM m),
c AS (SELECT vec_id AS cid, dim, qv AS cq FROM q WHERE vec_id < 8),
d AS (SELECT q.vec_id, c.cid, sum((q.qv - c.cq)*(q.qv - c.cq)) AS d2
      FROM q JOIN c USING (dim) GROUP BY q.vec_id, c.cid),
a AS (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM d),
asg AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
p AS (SELECT x.vec_id AS vid, y.vec_id AS prev
      FROM asg x JOIN asg y
      ON x.cluster = y.cluster AND y.vec_id < x.vec_id),
pd AS (SELECT p.vid, sum((qa.qv - qb.qv)*(qa.qv - qb.qv)) AS d2
       FROM p JOIN q qa ON qa.vec_id = p.vid
              JOIN q qb ON qb.vec_id = p.prev AND qb.dim = qa.dim
       GROUP BY p.vid, p.prev),
drp AS (SELECT DISTINCT vid FROM pd WHERE d2 <= 50)
SELECT asg.vec_id, CAST(asg.cluster AS BIGINT) AS cluster,
       (drp.vid IS NULL) AS keep
FROM asg LEFT JOIN drp ON asg.vec_id = drp.vid
ORDER BY asg.vec_id""",
        "emb_ivf_topk_full": """
SELECT vec_id FROM embeddings
ORDER BY list_cosine_similarity(embedding,
         (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
LIMIT 10""",
        "emb_topk_ids": """
SELECT vec_id FROM embeddings
ORDER BY list_cosine_similarity(embedding,
         (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
LIMIT 10""",
        "li_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(round(l_discount*10000,0) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    }

"""Conversation-level checks via mergeable segment partials.

Reference ancestors: key uniqueness DUP_002 (rule_validator.py:274-286),
single-reference-genome consistency (variant_validator.py:394-429 -> here:
a conv_id must not span shards), plus the transcript-specific ordering rules
(monotonic/contiguous turn_idx — SURVEY.md §2.6).

Scale design (SURVEY.md §7.4/§7.5): the raw 100 TB table is never shuffled.
rowstage.py emits one compact segment row per (shard, conv-within-batch);
this module merges those segments per conversation:

  segments -> sort("conv_id","seg_turn_lo") -> map_batches(MergeSegments)
           -> interior convs finalized VECTORIZED (no per-group Python)
           -> boundary convs (first/last conv of each batch) re-emitted and
              merged in a tiny final reduce (2 rows per batch)

A conversation whose segments have OVERLAPPING turn ranges (duplicate turns
split across batches, heavy interleaving) cannot be decided from partials; it
is flagged ``needs_exact`` and re-checked exactly from the raw rows
(pipeline.py filters the raw dataset to just those convs — a tiny,
predicate-pushdown-friendly second read).

Merged-per-conversation semantics (must match the DuckDB oracles):
- dup      : #(conv, turn_idx) pairs with count > 1        (DUP_002)
- contiguous: min(turn_idx)==0 AND count(distinct)==max+1
- mono_ok  : NOT EXISTS rows a,b: a.turn < b.turn AND a.ts > b.ts
- n_shards : count(distinct shard)  (must be 1)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..registry import RuleRegistry

RESULT_COLUMNS = [
    "conv_id", "main_shard", "n_rows", "n_distinct", "dup_turns", "turn_lo",
    "turn_hi", "min_ts", "max_ts", "n_shards", "shards", "mono_ok",
    "contiguous", "needs_exact",
]
_RESULT_DTYPES = {
    "conv_id": object, "main_shard": object, "n_rows": np.int64,
    "n_distinct": np.int64, "dup_turns": np.int64, "turn_lo": np.int64,
    "turn_hi": np.int64, "min_ts": np.int64, "max_ts": np.int64,
    "n_shards": np.int64, "shards": object, "mono_ok": bool,
    "contiguous": bool, "needs_exact": bool,
}
RESULT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()), ("main_shard", pa.string()),
        ("n_rows", pa.int64()), ("n_distinct", pa.int64()),
        ("dup_turns", pa.int64()), ("turn_lo", pa.int64()),
        ("turn_hi", pa.int64()), ("min_ts", pa.int64()),
        ("max_ts", pa.int64()), ("n_shards", pa.int64()),
        ("shards", pa.string()), ("mono_ok", pa.bool_()),
        ("contiguous", pa.bool_()), ("needs_exact", pa.bool_()),
    ]
)
SEG_FIELDS = [
    ("shard", pa.string()), ("seg_turn_lo", pa.int32()),
    ("seg_turn_hi", pa.int32()), ("seg_n", pa.int64()),
    ("seg_dup", pa.int64()), ("seg_min_ts", pa.int64()),
    ("seg_max_ts", pa.int64()), ("seg_mono_ok", pa.bool_()),
]
MERGE_OUT_SCHEMA = pa.schema(
    [("kind", pa.string())]
    + list(RESULT_SCHEMA)
    + [pa.field(n, t) for n, t in SEG_FIELDS]
)


def _typed(df: pd.DataFrame) -> pd.DataFrame:
    for c, dt in _RESULT_DTYPES.items():
        df[c] = df[c].astype(dt)
    return df[RESULT_COLUMNS]


def merge_segments_frame(seg: pd.DataFrame) -> pd.DataFrame:
    """Vectorized merge of segment rows -> one result row per conv_id.

    ``seg`` must be sorted by (conv_id, seg_turn_lo). No per-group Python:
    everything is shifted-comparison + groupby aggregation.
    """
    if len(seg) == 0:
        return pd.DataFrame(columns=RESULT_COLUMNS)
    seg = seg.sort_values(["conv_id", "seg_turn_lo", "seg_turn_hi"], kind="stable")
    g = seg.groupby("conv_id", sort=True)

    conv = seg["conv_id"].to_numpy(dtype=object)
    same = np.concatenate([[False], conv[1:] == conv[:-1]])
    lo = seg["seg_turn_lo"].to_numpy()
    hi = seg["seg_turn_hi"].to_numpy()
    prev_hi = np.concatenate([[0], hi[:-1]])
    overlap_here = same & (lo <= prev_hi)

    min_ts = seg["seg_min_ts"].to_numpy()
    max_ts = seg["seg_max_ts"].to_numpy()
    # running max of earlier segments' max_ts, per conv (vectorized cummax)
    cm = seg.groupby("conv_id", sort=False)["seg_max_ts"].cummax().to_numpy()
    prev_cm = np.concatenate([[0], cm[:-1]])
    cross_mono_bad = same & (min_ts < prev_cm)

    tmp = pd.DataFrame(
        {
            "conv_id": conv,
            "overlap": overlap_here,
            "cross_bad": cross_mono_bad,
        },
        index=seg.index,
    )
    agg = g.agg(
        n_rows=("seg_n", "sum"),
        dup_in=("seg_dup", "sum"),
        turn_lo=("seg_turn_lo", "min"),
        turn_hi=("seg_turn_hi", "max"),
        min_ts=("seg_min_ts", "min"),
        max_ts=("seg_max_ts", "max"),
        mono_local=("seg_mono_ok", "all"),
        n_shards=("shard", "nunique"),
    )
    # main shard = shard holding the most rows of the conv
    by_shard = seg.groupby(["conv_id", "shard"], sort=True)["seg_n"].sum().reset_index()
    by_shard = by_shard.sort_values(["conv_id", "seg_n", "shard"],
                                    ascending=[True, False, True], kind="stable")
    agg["main_shard"] = by_shard.drop_duplicates("conv_id").set_index("conv_id")["shard"]
    # shard-list string: per-group Python only for the rare multi-shard convs
    agg["shards"] = agg["main_shard"]
    multi = agg.index[agg["n_shards"] > 1]
    if len(multi):
        sub = seg[seg["conv_id"].isin(set(multi))]
        joined = sub.groupby("conv_id")["shard"].agg(
            lambda s: ",".join(sorted(set(s)))
        )
        agg.loc[multi, "shards"] = joined

    flags = tmp.groupby("conv_id", sort=True).agg(
        overlap=("overlap", "any"), cross_bad=("cross_bad", "any")
    )
    out = agg.join(flags)
    out["needs_exact"] = out["overlap"]
    out["n_distinct"] = out["n_rows"] - out["dup_in"]
    out["dup_turns"] = out["dup_in"]
    out["mono_ok"] = out["mono_local"] & ~out["cross_bad"]
    out["contiguous"] = (out["turn_lo"] == 0) & (
        out["n_distinct"] == out["turn_hi"].astype(np.int64) + 1
    )
    # undecidable under overlap — exact pass will overwrite
    out.loc[out["needs_exact"], ["mono_ok", "contiguous"]] = False
    out = out.reset_index()
    return _typed(out)


def exact_conv_frame(
    rows: pd.DataFrame,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Exact per-conversation check from raw rows (fallback path). Vectorized
    over a frame that may contain MANY whole conversations; ``shard`` column
    must be present. Returns (per-conv results, whole-row-duplicate rows
    [conv_id, turn_idx] — one per extra copy, when role/text/tool present)."""
    rowdup_cols = ["conv_id", "turn_idx"]
    if len(rows) == 0:
        return (
            pd.DataFrame(columns=RESULT_COLUMNS),
            pd.DataFrame(columns=rowdup_cols),
        )
    rows = rows.sort_values(["conv_id", "turn_idx", "ts"], kind="stable")
    conv = rows["conv_id"].to_numpy(dtype=object)
    turn = rows["turn_idx"].to_numpy().astype(np.int64)
    ts = rows["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)

    same = np.concatenate([[False], conv[1:] == conv[:-1]])
    dup_here = same & (turn == np.concatenate([[np.int64(-1 << 40)], turn[:-1]]))

    # strict-turn running max for the EXISTS-pair monotonicity definition
    df = pd.DataFrame({"conv_id": conv, "turn": turn, "ts": ts})
    new_run = ~same | (turn != np.concatenate([[np.int64(-1 << 40)], turn[:-1]]))
    run = np.cumsum(new_run) - 1
    per_run = df.groupby(run, sort=False).agg(
        conv_id=("conv_id", "first"), mx=("ts", "max"), mn=("ts", "min")
    )
    per_run["cm"] = per_run.groupby("conv_id", sort=False)["mx"].cummax()
    per_run["prev"] = per_run.groupby("conv_id", sort=False)["cm"].shift(1)
    per_run["bad"] = per_run["mn"] < per_run["prev"]

    g = df.assign(dup=dup_here, shard=rows["shard"].to_numpy(dtype=object)).groupby(
        "conv_id", sort=True
    )
    agg = g.agg(
        n_rows=("turn", "size"),
        dup_in=("dup", "sum"),
        turn_lo=("turn", "min"),
        turn_hi=("turn", "max"),
        min_ts=("ts", "min"),
        max_ts=("ts", "max"),
        n_shards=("shard", "nunique"),
    )
    by_shard = df.assign(shard=rows["shard"].to_numpy(dtype=object)).groupby(
        ["conv_id", "shard"], sort=True
    ).size().reset_index(name="n")
    by_shard = by_shard.sort_values(["conv_id", "n", "shard"],
                                    ascending=[True, False, True], kind="stable")
    agg["main_shard"] = by_shard.drop_duplicates("conv_id").set_index("conv_id")["shard"]
    agg["shards"] = agg["main_shard"]
    multi = agg.index[agg["n_shards"] > 1]
    if len(multi):
        sub = df.assign(shard=rows["shard"].to_numpy(dtype=object))
        sub = sub[sub["conv_id"].isin(set(multi))]
        agg.loc[multi, "shards"] = sub.groupby("conv_id")["shard"].agg(
            lambda s: ",".join(sorted(set(s)))
        )
    mono_bad = per_run.groupby("conv_id", sort=True)["bad"].any()
    agg["mono_ok"] = ~mono_bad.reindex(agg.index).fillna(False)
    agg["n_distinct"] = agg["n_rows"] - agg["dup_in"]
    agg["dup_turns"] = agg["dup_in"]
    agg["contiguous"] = (agg["turn_lo"] == 0) & (
        agg["n_distinct"] == agg["turn_hi"] + 1
    )
    agg["needs_exact"] = False

    content_cols = [c for c in ("role", "text", "tool") if c in rows.columns]
    if content_cols:
        key = rows.sort_values(["conv_id", "turn_idx", "ts"], kind="stable")
        dup_all = key.duplicated(
            subset=["conv_id", "turn_idx", "ts"] + content_cols, keep="first"
        )
        rowdups = key.loc[dup_all, rowdup_cols].reset_index(drop=True)
    else:
        rowdups = pd.DataFrame(columns=rowdup_cols)
    return _typed(agg.reset_index()), rowdups


def conv_violations(results: pd.DataFrame, registry: RuleRegistry) -> pd.DataFrame:
    """Per-conversation violation rows from merged results, using the group
    rules present in the registry."""
    cols = ["shard", "conv_id", "turn_idx", "rule_id", "rule_version",
            "severity", "column", "offending_value"]
    if len(results) == 0:
        return pd.DataFrame(columns=cols)
    frames = []

    def emit(mask: pd.Series, spec, value: pd.Series):
        sub = results.loc[mask]
        if len(sub) == 0:
            return
        frames.append(
            pd.DataFrame(
                {
                    "shard": sub["main_shard"],
                    "conv_id": sub["conv_id"],
                    "turn_idx": pd.array([None] * len(sub), dtype="Int32"),
                    "rule_id": spec.rule_id,
                    "rule_version": spec.version,
                    "severity": spec.severity,
                    "column": spec.column,
                    "offending_value": value.loc[sub.index].astype(str),
                }
            )
        )

    by_kind = {s.kind: s for s in registry.group_rules()}
    if "unique_key" in by_kind:
        emit(results["dup_turns"] > 0, by_kind["unique_key"],
             results["dup_turns"].astype("int64").astype(str))
    if "contiguous_in_group" in by_kind:
        emit(~results["contiguous"], by_kind["contiguous_in_group"],
             "min=" + results["turn_lo"].astype("int64").astype(str)
             + ",max=" + results["turn_hi"].astype("int64").astype(str)
             + ",distinct=" + results["n_distinct"].astype("int64").astype(str))
    if "monotonic_ts_in_group" in by_kind:
        emit(~results["mono_ok"], by_kind["monotonic_ts_in_group"],
             pd.Series("ts_out_of_order", index=results.index))
    if "single_shard_group" in by_kind:
        emit(results["n_shards"] > 1, by_kind["single_shard_group"],
             results["shards"])
    if not frames:
        return pd.DataFrame(columns=cols)
    return pd.concat(frames, ignore_index=True)[cols]


def _merge_out_table(res: pd.DataFrame, passthrough: pd.DataFrame) -> pa.Table:
    """Build the fixed-schema union table (conv_result + segment rows) so
    every Ray block has the identical Arrow schema."""
    n1, n2 = len(res), len(passthrough)
    cols: dict[str, pa.Array] = {}
    cols["kind"] = pa.array(["conv_result"] * n1 + ["segment"] * n2)
    for f in RESULT_SCHEMA:
        if f.name == "conv_id":
            vals = res["conv_id"].tolist() + passthrough["conv_id"].tolist()
        else:
            vals = res[f.name].tolist() + [None] * n2
        cols[f.name] = pa.array(vals, type=f.type)
    for name, t in SEG_FIELDS:
        vals = [None] * n1 + passthrough[name].tolist()
        cols[name] = pa.array(vals, type=t)
    return pa.Table.from_pydict(cols, schema=MERGE_OUT_SCHEMA)


class MergeSegments:
    """map_batches stage over the conv-sorted segment stream. Interior convs
    are finalized vectorized; the first/last conv of each batch is re-emitted
    as raw segments for the driver's tiny final reduce."""

    def __call__(self, seg: pd.DataFrame) -> pa.Table:
        if len(seg) == 0:
            return _merge_out_table(
                pd.DataFrame(columns=RESULT_COLUMNS),
                pd.DataFrame(columns=[n for n, _ in SEG_FIELDS] + ["conv_id"]),
            )
        conv = seg["conv_id"].to_numpy(dtype=object)
        boundary_vals = {conv[0], conv[-1]}
        is_boundary = seg["conv_id"].isin(boundary_vals)
        interior = seg.loc[~is_boundary]
        res = merge_segments_frame(interior)
        passthrough = seg.loc[is_boundary]
        return _merge_out_table(res, passthrough)

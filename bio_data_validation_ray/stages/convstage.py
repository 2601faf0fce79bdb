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

Note on SURVEY.md §6's "salting for hot conversations" plan: this module is
that plan's replacement, and strictly dominates it. Salting splits a hot
conv_id into conv_id#salt subgroups to unskew a groupby of RAW rows; here
the raw rows never enter a groupby at all — each batch contributes O(convs
in batch) segment rows regardless of conversation size, so a 10^9-turn
conversation costs the shuffle exactly as much as a 10-turn one (the
boundary merge sees 2 rows per batch). The salted path's "subgroup ranges
must tile" merge is exactly the segment merge below, applied universally
instead of only above a hotness threshold. Pinned by the 1M-turn
single-conversation stress test (test_property.py) which decides from
partials alone.

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

    Pure numpy over factorized integer keys (reduceat per sorted group) —
    no string sorts beyond the key factorize, no per-group Python.
    """
    if len(seg) == 0:
        return pd.DataFrame(columns=RESULT_COLUMNS)
    conv_codes, conv_uniq = pd.factorize(seg["conv_id"].to_numpy(dtype=object),
                                         sort=True)
    shard_codes, shard_uniq = pd.factorize(seg["shard"].to_numpy(dtype=object),
                                           sort=True)
    return _merge_segments_arrays(
        conv_codes.astype(np.int64), np.asarray(conv_uniq, dtype=object),
        shard_codes.astype(np.int64), np.asarray(shard_uniq, dtype=object),
        seg["seg_turn_lo"].to_numpy().astype(np.int64),
        seg["seg_turn_hi"].to_numpy().astype(np.int64),
        seg["seg_n"].to_numpy().astype(np.int64),
        seg["seg_dup"].to_numpy().astype(np.int64),
        seg["seg_min_ts"].to_numpy().astype(np.int64),
        seg["seg_max_ts"].to_numpy().astype(np.int64),
        np.asarray(seg["seg_mono_ok"], dtype=bool),
    )


def _merge_segments_arrays(conv_codes, conv_uniq, shard_codes, shard_uniq,
                           lo0, hi0, n0, dup0, mnts0, mxts0, mono0
                           ) -> pd.DataFrame:
    """Core of the segment merge over pre-factorized arrays; both key
    dictionaries MUST be sorted-unique (the main-shard tie-break encodes
    'lexicographically smaller' as 'smaller code').

    Measured dead end, recorded so it isn't retried blind: an Arrow-side
    prologue (pc.dictionary_encode + sort_indices rank remap instead of
    pandas factorize) ran 1.5-2x SLOWER at 8e5 distinct conversations —
    the dictionary uniques must materialize as Python strings for the
    output either way, and the khash factorize is simply faster."""
    order = np.lexsort((hi0, lo0, conv_codes))
    c = conv_codes[order]
    lo, hi, nn, dup = lo0[order], hi0[order], n0[order], dup0[order]
    mnts, mxts, mono = mnts0[order], mxts0[order], mono0[order]

    starts = np.concatenate([[0], np.flatnonzero(np.diff(c)) + 1]).astype(np.int64)
    G = starts.size
    same = np.concatenate([[False], c[1:] == c[:-1]])

    overlap_here = np.concatenate(
        [[False], same[1:] & (lo[1:] <= hi[:-1])]
    )
    # grouped running max of seg_max_ts (reset at group starts) — pandas
    # int-key cummax is the one Cython call here (no offset trick: it would
    # overflow int64 at large group counts x µs timestamps)
    cm = pd.Series(mxts).groupby(c).cummax().to_numpy()
    prev_cm = np.concatenate([[np.int64(-(1 << 62))], cm[:-1]])
    cross_bad_here = same & (mnts < prev_cm)

    n_rows = np.add.reduceat(nn, starts)
    dup_in = np.add.reduceat(dup, starts)
    turn_lo = lo[starts]  # sorted by lo within group
    turn_hi = np.maximum.reduceat(hi, starts)
    min_ts = np.minimum.reduceat(mnts, starts)
    max_ts = np.maximum.reduceat(mxts, starts)
    mono_local = np.minimum.reduceat(mono.astype(np.int8), starts).astype(bool)
    overlap_g = np.maximum.reduceat(overlap_here.astype(np.int8), starts).astype(bool)
    cross_bad_g = np.maximum.reduceat(cross_bad_here.astype(np.int8), starts).astype(bool)

    # per-(conv, shard) row counts -> n_shards + main shard (argmax rows,
    # ties to the lexicographically smaller shard via the encoded priority)
    sc = shard_codes[order]
    order2 = np.lexsort((sc, c))
    c2, sc2, n2 = c[order2], sc[order2], nn[order2]
    pair_break = np.concatenate(
        [[True], (c2[1:] != c2[:-1]) | (sc2[1:] != sc2[:-1])]
    )
    pstarts = np.flatnonzero(pair_break).astype(np.int64)
    pair_conv = c2[pstarts]
    pair_shard = sc2[pstarts]
    pair_n = np.add.reduceat(n2, pstarts)
    gstarts2 = np.concatenate([[0], np.flatnonzero(np.diff(pair_conv)) + 1])
    S = np.int64(len(shard_uniq))
    prio = pair_n * (S + 1) + (S - pair_shard)
    best = np.maximum.reduceat(prio, gstarts2)
    main_shard_code = (S - (best % (S + 1))).astype(np.int64)
    gends2 = np.concatenate([gstarts2[1:], [pair_conv.size]])
    n_shards = (gends2 - gstarts2).astype(np.int64)

    shard_arr = np.asarray(shard_uniq, dtype=object)
    out = pd.DataFrame(
        {
            "conv_id": np.asarray(conv_uniq, dtype=object)[c[starts]],
            "main_shard": shard_arr[main_shard_code],
            "n_rows": n_rows,
            "dup_turns": dup_in,
            "turn_lo": turn_lo,
            "turn_hi": turn_hi,
            "min_ts": min_ts,
            "max_ts": max_ts,
            "n_shards": n_shards,
            "mono_ok": mono_local & ~cross_bad_g,
            "needs_exact": overlap_g,
        }
    )
    out["n_distinct"] = out["n_rows"] - out["dup_turns"]
    out["contiguous"] = (out["turn_lo"] == 0) & (
        out["n_distinct"] == out["turn_hi"] + 1
    )
    # shard-list string: per-group Python only for the rare multi-shard
    # convs, built from the per-(conv, shard) pair arrays already computed
    # above (no second scan over the segments; pair_shard is ascending
    # within each conv group and shard_uniq is sorted, so the join is
    # lexicographic by construction)
    shards_col = out["main_shard"].to_numpy(copy=True)
    multi = np.flatnonzero(n_shards > 1)
    if multi.size:
        for gi in multi:
            codes = pair_shard[gstarts2[gi]:gends2[gi]]
            shards_col[gi] = ",".join(shard_arr[codes])
    out["shards"] = shards_col
    # undecidable under overlap — exact pass will overwrite
    out.loc[out["needs_exact"], ["mono_ok", "contiguous"]] = False
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
    codes0, uniq0 = pd.factorize(rows["conv_id"].to_numpy(dtype=object))
    t0 = rows["turn_idx"].to_numpy().astype(np.int64)
    s0 = rows["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    order = np.lexsort((s0, t0, codes0))  # int sort, not object-string sort
    rows = rows.iloc[order]
    conv = rows["conv_id"].to_numpy(dtype=object)
    turn = t0[order]
    ts = s0[order]

    same = np.concatenate([[False], codes0[order][1:] == codes0[order][:-1]])
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
        dup_all = rows.duplicated(  # rows already sorted by (conv, turn, ts)
            subset=["conv_id", "turn_idx", "ts"] + content_cols, keep="first"
        )
        rowdups = rows.loc[dup_all, rowdup_cols].reset_index(drop=True)
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

    def emit(mask: pd.Series, spec, value_of):
        # value_of(sub) builds the offending-value Series for the FLAGGED
        # rows only: on a clean 10^6-conversation run the old eager form
        # rendered per-row strings for every conversation just to discard
        # them — ~1 s of pure serial driver time per validation
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
                    "offending_value": value_of(sub).astype(str),
                }
            )
        )

    by_kind = {s.kind: s for s in registry.group_rules()}
    if "unique_key" in by_kind:
        emit(results["dup_turns"] > 0, by_kind["unique_key"],
             lambda sub: sub["dup_turns"].astype("int64").astype(str))
    if "contiguous_in_group" in by_kind:
        emit(~results["contiguous"], by_kind["contiguous_in_group"],
             lambda sub: "min=" + sub["turn_lo"].astype("int64").astype(str)
             + ",max=" + sub["turn_hi"].astype("int64").astype(str)
             + ",distinct=" + sub["n_distinct"].astype("int64").astype(str))
    if "monotonic_ts_in_group" in by_kind:
        emit(~results["mono_ok"], by_kind["monotonic_ts_in_group"],
             lambda sub: pd.Series("ts_out_of_order", index=sub.index))
    if "single_shard_group" in by_kind:
        emit(results["n_shards"] > 1, by_kind["single_shard_group"],
             lambda sub: sub["shards"])
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

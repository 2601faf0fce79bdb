"""Clean-data export — the gate's PRODUCT: after validation, write the
surviving rows as partitioned Parquet. The reference only gates (CI fails on
a rejected dataset, scripts/validation/check_status.py:39-50); at pipeline
scale the gate should also EMIT the clean view so downstream training jobs
consume a vetted table.

Survivor semantics (deterministic, SQL-statable — queries.t_clean_rows):
  - drop whole conversations flagged by any CONVERSATION rule (duplicate
    turn keys, non-contiguous turns, non-monotonic ts, shard-spanning);
  - drop rows flagged by any ROW-LOCAL rule (vocabulary, tool pattern/role
    coupling, empty/null text, turn range, ts window, length band);
  - collapse whole-row duplicates to one copy (DISTINCT over the data
    columns + shard). The collapse is GLOBAL: per-batch drop_duplicates
    handles copies inside a block, and copies that straddle blocks (Ray
    splits large files at row-group boundaries and big blocks dynamically)
    are found via compact (key, row-hash) count partials — only the few
    rows in actual cross-block dup groups ever reach the driver; clean
    rows stream straight through.

The exclusions come straight from the validation run's own violations
artifact — the export trusts the gate it ships with, and the violation
rules themselves are hash-checked against DuckDB oracles. Survivors pass
through BYTE-IDENTICAL (the north-star per-turn text equality rule): the
export never touches column values.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..sources.writers import write_parquet_idempotent

# conversation-scoped rule ids: a violation drops the whole conversation
CONV_RULES = frozenset({
    "DUP_002_TURN_KEY", "TXT_TURN_CONTIG", "TXT_TS_MONOTONIC",
    "TXT_CONV_SINGLE_SHARD",
})
# dataset-level rules: never exclude individual rows
AGG_RULES_PREFIX = ("BIAS_", "STAT_", "DRIFT_")
ROW_DUP_RULE = "DUP_001_ROW"

DATA_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def exclusions_from_violations(vio: pd.DataFrame
                               ) -> tuple[frozenset, frozenset]:
    """(bad conversation ids, bad (conv_id, turn_idx) row keys) from a
    violations frame. Row-dup violations are ignored here — duplicates are
    collapsed, not dropped."""
    conv_mask = vio["rule_id"].isin(CONV_RULES)
    bad_convs = frozenset(vio.loc[conv_mask, "conv_id"].dropna())
    row_mask = (
        ~conv_mask
        & (vio["rule_id"] != ROW_DUP_RULE)
        & ~vio["rule_id"].str.startswith(AGG_RULES_PREFIX)
        & vio["turn_idx"].notna()
    )
    bad_rows = frozenset(
        zip(vio.loc[row_mask, "conv_id"],
            vio.loc[row_mask, "turn_idx"].astype(np.int64))
    )
    return bad_convs, bad_rows


_DUP_KEY = ["shard", "conv_id", "turn_idx", "h"]


def _row_hashes(df: pd.DataFrame) -> np.ndarray:
    """Deterministic 64-bit whole-row hash over the export columns (pandas'
    unseeded hash — stable across processes for identical values/dtypes)."""
    return (pd.util.hash_pandas_object(df[DATA_COLS + ["shard"]],
                                       index=False)
            .to_numpy().view(np.int64))


def collapse_cross_block_dups(survivors, *, already_local_deduped: bool = True):
    """Exact GLOBAL whole-row dup collapse over a per-batch-deduplicated
    stream (ADVICE r3 medium: a dup pair straddling a Ray block boundary
    survives per-batch drop_duplicates — blocks are NOT files).

    Shape at scale: every batch emits one COMPACT (shard, conv_id,
    turn_idx, row-hash) key row per surviving row — no text — and a keyed
    reduce counts copies per key; only keys seen in 2+ blocks (rare: they
    are whole-row dup violations by definition) have their rows routed to
    a driver-side DISTINCT, while every other row streams through
    untouched. Returns a Dataset."""
    import ray
    import ray.data as rd

    from ..stages.keyed_reduce import keyed_reduce

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "shard": df["shard"] if len(df) else pd.Series(dtype=object),
            "conv_id": df["conv_id"] if len(df) else pd.Series(dtype=object),
            "turn_idx": (df["turn_idx"].astype(np.int64) if len(df)
                         else pd.Series(dtype=np.int64)),
            "h": (_row_hashes(df) if len(df)
                  else pd.Series(dtype=np.int64)),
        })
        out["n"] = np.int64(1)
        return out

    survivors = survivors.materialize()
    interior, boundary = keyed_reduce(
        survivors.map_batches(key_partial, batch_format="pandas"),
        _DUP_KEY, {"n": ("n", "sum")}, partial_applied=True,
    )
    dup_frames = [
        interior.map_batches(lambda df: df[df["n"] > 1],
                             batch_format="pandas").to_pandas()
    ]
    if len(boundary):
        dup_frames.append(boundary[boundary["n"] > 1])
    dup_keys = pd.concat(dup_frames, ignore_index=True)
    if len(dup_keys) == 0:
        return survivors
    dup_set = frozenset(zip(dup_keys["shard"], dup_keys["conv_id"],
                            dup_keys["turn_idx"].astype(np.int64),
                            dup_keys["h"].astype(np.int64)))
    dup_ref = ray.put(dup_set)

    def in_dup_group(df: pd.DataFrame) -> np.ndarray:
        dups = ray.get(dup_ref)
        keys = zip(df["shard"], df["conv_id"],
                   df["turn_idx"].astype(np.int64), _row_hashes(df))
        return np.fromiter((k in dups for k in keys), dtype=bool,
                           count=len(df))

    # ONE tagging pass: the row hash (full-row, incl. text — the dominant
    # cost) is computed once per batch; the clean/dup split is then two
    # cheap boolean filters over the tagged blocks
    tagged = survivors.map_batches(
        lambda df: df.assign(
            __dup=in_dup_group(df) if len(df)
            else pd.Series([], dtype=bool)),
        batch_format="pandas",
    ).materialize()
    clean = tagged.map_batches(
        lambda df: df[~df["__dup"]].drop(columns="__dup"),
        batch_format="pandas",
    )
    # the dup-group rows are violations-scale by construction; collapse
    # them once on the driver (exact DISTINCT over the full row)
    dup_rows = tagged.map_batches(
        lambda df: df[df["__dup"]].drop(columns="__dup"),
        batch_format="pandas",
    ).to_pandas()
    if "shard" not in dup_rows.columns:  # all-empty schema quirk
        return clean
    collapsed = dup_rows.drop_duplicates(DATA_COLS + ["shard"])
    return clean.union(rd.from_pandas(collapsed))


def write_clean_output(input_dir: str, out_dir: str, *,
                       violations: pd.DataFrame,
                       nparts: int | None = None) -> dict:
    """Export survivors of a validated run to ``out_dir`` (deterministic
    idempotent part names). ``violations`` is the run's violation frame
    (read it back from ``<run_dir>/violations``). Returns summary counts.

    Scale notes: the exclusion sets broadcast once via ray.put (compact —
    violation keys, not data); each batch filters vectorized and collapses
    duplicates locally; nothing shuffles and text never leaves the batch."""
    import ray
    import ray.data as rd

    from .validate import list_shards

    bad_convs, bad_rows = exclusions_from_violations(violations)
    convs_ref = ray.put(bad_convs)
    rows_ref = ray.put(bad_rows)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        bc = ray.get(convs_ref)
        br = ray.get(rows_ref)
        if len(df) == 0 and "path" not in df.columns:
            # schemaless empty block: emit DTYPE-CORRECT empty columns —
            # an all-object empty frame would give this block a different
            # Arrow schema (null/string) than the typed blocks and break
            # the downstream union/write
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=np.int64),
                "role": pd.Series([], dtype=object),
                "text": pd.Series([], dtype=object),
                "tool": pd.Series([], dtype=object),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "shard": pd.Series([], dtype=object),
            })
        df = df.rename(columns={"path": "shard"})
        df["shard"] = df["shard"].str.rsplit("/", n=1).str[-1]
        mask = ~df["conv_id"].isin(bc)
        if br:
            keys = pd.Series(
                list(zip(df["conv_id"], df["turn_idx"].astype(np.int64))),
                index=df.index,
            )
            mask &= ~keys.isin(br)
        out = df.loc[mask, DATA_COLS + ["shard"]]
        return out.drop_duplicates(DATA_COLS + ["shard"])

    ds = rd.read_parquet(list_shards(input_dir), include_paths=True)
    survivors = ds.map_batches(keep, batch_format="pandas")
    survivors = collapse_cross_block_dups(survivors)
    if nparts:
        survivors = survivors.repartition(nparts)
    survivors = survivors.materialize()
    write_parquet_idempotent(survivors, out_dir, prefix="clean")
    n_out = survivors.count()
    return {
        "rows_out": int(n_out),
        "excluded_convs": len(bad_convs),
        "excluded_row_keys": len(bad_rows),
        "out_dir": out_dir,
    }

"""Global prefix-scan primitives over a sorted Dataset.

The classic two-pass distributed scan: pass 1 reduces every block to one
compact (first-key snapshot, block sum) row, the driver runs an exclusive
prefix sum over those #blocks rows, and pass 2 revisits the SAME
materialized blocks adding each block's offset to its local cumulative sum
— the whole dataset is touched exactly twice and nothing but #blocks tiny
rows ever reaches the driver. Reference ancestor: cumulative/ordering
checks the reference does in a single pandas pass
(rule_validator.py ordering family); here the scan is the distributed
re-expression.

Precondition: the order key must be UNIQUE per row (a document / event id)
so a block is identifiable by its first key value across the two passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def block_prefix_offsets(srt, order_col: str, value_col: str) -> dict:
    """Pass 1: per-block sums keyed by the block's first ``order_col``
    value, exclusive-scanned into start offsets on the driver. ``srt``
    must be a MATERIALIZED sorted dataset (blocks stable across passes)."""

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=["first_key", "s"])
        return pd.DataFrame({
            "first_key": [df[order_col].iloc[0]],
            "s": [np.int64(df[value_col].to_numpy(np.int64).sum())],
        })

    parts = srt.map_batches(p1, batch_format="pandas",
                            batch_size=None).to_pandas()
    if len(parts) == 0:
        return {}
    parts = parts.sort_values("first_key", kind="stable")
    sums = parts["s"].to_numpy(np.int64)
    offsets = np.concatenate([[np.int64(0)], np.cumsum(sums)[:-1]])
    out = dict(zip(parts["first_key"].tolist(), offsets.tolist()))
    if len(out) != len(parts):
        # two blocks share a first key -> the unique-order_col precondition
        # is violated; failing loudly beats silently corrupting every
        # downstream offset
        raise ValueError(
            "block_prefix_offsets: duplicate order_col values straddle a "
            "block boundary; order_col must be unique")
    return out


def packed_bins(ds, *, order_col: str, value_col: str, capacity: int):
    """Token-budget packing by global cumulative offset: row i lands in
    bin ``floor(prefix_sum_before_i / capacity)`` in ``order_col`` order —
    the deterministic, offset-composable packing a training-data pipeline
    uses to cut a corpus into fixed token budgets (unlike greedy first-fit,
    the assignment is a pure function of the prefix sums, so it
    distributes as a two-pass scan).
    -> DataFrame[(bin, n_docs, sum_tokens)] sorted by bin."""
    import ray

    from ..stages.keyed_reduce import combine_low_card

    if int(capacity) <= 0:
        raise ValueError(f"packed_bins: capacity must be positive, got "
                         f"{capacity}")
    srt = ds.sort(order_col).materialize()
    off_ref = ray.put(block_prefix_offsets(srt, order_col, value_col))

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=["bin", "tok"])
        off = ray.get(off_ref)[df[order_col].iloc[0]]
        v = df[value_col].to_numpy(np.int64)
        before = off + np.cumsum(v) - v
        return pd.DataFrame({"bin": before // np.int64(capacity), "tok": v})

    out = combine_low_card(
        srt.map_batches(p2, batch_format="pandas", batch_size=None),
        ["bin"],
        {"n_docs": ("tok", "count"), "sum_tokens": ("tok", "sum")},
    )
    out["bin"] = out["bin"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_tokens"] = out["sum_tokens"].astype(np.int64)
    return out.sort_values("bin").reset_index(drop=True)

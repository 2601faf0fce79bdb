"""Distributed range / interval joins.

The reference engine has no non-equi join at all (its joins are pandas
merges inside one process, e.g. the batch/condition crosstab in
``src/validators/sample_metadata.py``); Ray Data's relational API stops at
hash equi-joins. This module adds the classic scale shape for a bounded
range predicate — the *banded* join: time is cut into fixed-width bands,
each interval is replicated into every band it covers (bounded copies,
because interval span is bounded), points land in exactly one band, and the
non-equi predicate becomes an equi-join on ``(key, band)`` followed by a
vectorized range filter. No sort, no unbounded boundary carry, and a hot
key's rows still spread across time bands, so skew in the key alone does
not serialize the join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_BAND = "__band"


def _ts_us(col) -> np.ndarray:
    """int64 microseconds from a timestamp-like or integer column
    (tz-aware columns convert to UTC wall time first)."""
    s = pd.Series(col)
    if isinstance(s.dtype, pd.DatetimeTZDtype):
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.astype("datetime64[us]").astype(np.int64).to_numpy()
    return s.astype(np.int64).to_numpy()


def banded_range_join(points, intervals, *, key: str,
                      point_ts_col: str, lo_col: str, hi_col: str,
                      band_width_us: int, num_partitions: int = 8,
                      max_copies: int = 8):
    """Inner-join ``points`` to every row of ``intervals`` with the same
    ``key`` and ``lo <= point_ts <= hi`` (both ends inclusive — SQL
    BETWEEN). Returns the joined Dataset with all point columns, the
    interval payload columns, and ``point_ts_col``/``lo_col``/``hi_col``
    as int64 microseconds; overlapping intervals yield one output row per
    matching (point, interval) pair, exactly like the SQL join.

    Both sides stay Datasets throughout: band assignment is a vectorized
    ``map_batches``, the equi-join is Ray's hash join on ``(key, band)``,
    and the range predicate is one boolean kernel per output block.
    Interval spans must be <= ``max_copies * band_width_us`` — covering at
    most ``max_copies + 1`` bands — asserted per batch so replication stays
    O(1) per interval; pick ``band_width_us`` on the order of the maximum
    span. An empty side yields an empty result (never a join crash).

    Column names must be disjoint across the two sides apart from ``key``
    (rename the interval side's payload before calling).
    """
    W = int(band_width_us)
    if W <= 0:
        raise ValueError("band_width_us must be positive")

    def tag_points(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out[point_ts_col] = pd.Series([], dtype=np.int64)
            out[_BAND] = pd.Series([], dtype=np.int64)
            return out
        out = df.copy()
        ts = _ts_us(out[point_ts_col])
        out[point_ts_col] = ts
        out[_BAND] = ts // W
        return out

    def replicate_intervals(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            for c in (lo_col, hi_col, _BAND):
                out[c] = pd.Series([], dtype=np.int64)
            return out
        lo = _ts_us(df[lo_col])
        hi = _ts_us(df[hi_col])
        b0, b1 = lo // W, hi // W
        ncopies = (b1 - b0 + 1).clip(min=0)
        # span <= max_copies*W covers at most max_copies+1 bands (a span of
        # exactly k*W can straddle k+1 bands), so that is the legal ceiling
        if ncopies.max(initial=0) > max_copies + 1:
            raise ValueError(
                f"interval spans {int(ncopies.max())} bands > max_copies+1="
                f"{max_copies + 1}; raise band_width_us")
        idx = np.repeat(np.arange(len(df)), ncopies)
        out = df.iloc[idx].copy()
        out[lo_col] = lo[idx]
        out[hi_col] = hi[idx]
        # offset within each interval's replication run: 0..ncopies-1
        starts = np.cumsum(ncopies) - ncopies
        offset = np.arange(len(idx)) - starts[idx]
        out[_BAND] = b0[idx] + offset
        return out.reset_index(drop=True)

    p = points.map_batches(tag_points, batch_format="pandas")
    iv = intervals.map_batches(replicate_intervals, batch_format="pandas")
    # empty-side guard: Ray's hash join cannot resolve key fields on a
    # schemaless empty side (ArrowInvalid); the join result is empty anyway
    p = p.materialize()
    iv = iv.materialize()
    if p.count() == 0 or iv.count() == 0:
        import ray.data as rd

        cols = ([c for c in (p.schema().names if p.count() else [])
                 if c != _BAND]
                + [lo_col, hi_col])
        return rd.from_pandas(pd.DataFrame(columns=cols))
    # no pre-repartition: Dataset.join is itself a hash shuffle into
    # num_partitions by key hash — a round-robin repartition before it is
    # a full extra exchange that the join immediately redistributes
    joined = p.join(
        iv, "inner", num_partitions,
        on=(key, _BAND), right_on=(key, _BAND),
    )

    iv_cols = [c for c in iv.schema().names if c not in (key, _BAND)]

    def in_range(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or lo_col not in df.columns:
            # a partition with no interval match omits right-side columns;
            # re-add ALL interval payload columns exactly once so every
            # block shares one schema
            cols = [c for c in df.columns if c != _BAND]
            extra = [c for c in iv_cols if c not in cols]
            return pd.DataFrame(columns=cols + extra)
        ts = df[point_ts_col].to_numpy()
        keep = (df[lo_col].to_numpy() <= ts) & (ts <= df[hi_col].to_numpy())
        return df.loc[keep].drop(columns=[_BAND]).reset_index(drop=True)

    return joined.map_batches(in_range, batch_format="pandas")

"""Vectorized keyed reduce — the engine's replacement for
``Dataset.groupby().aggregate()`` on anything beyond trivial cardinality.

Ray's built-in grouped aggregate pays per-group Python overhead (measured
~5-10ms per distinct key in Ray 2.49), which is unusable for keys like
content hashes or conversation ids. This operator keeps everything
vectorized:

  1. optional ``partial`` map_batches stage: pandas groupby inside each batch
     -> one partial row per (batch, key); mergeable aggregates only
  2. EITHER the key domain is known-small (``combine_low_card``): collect the
     tiny partial rows and combine driver-side — zero shuffle;
  3. OR ``keyed_reduce``: sort partials by key (Ray's sample-based range
     shuffle, fully vectorized) then a map_batches pass that finalizes every
     interior key vectorized and re-emits only each batch's first/last key
     for a tiny driver-side stitch (2 keys per batch) — the same
     boundary-stitching pattern as convstage.MergeSegments.

Mergeable aggregate hows: sum, min, max, count (count partials merge by
sum), first. sum/min/max/count are exact on every path. ``first`` is
exact through ``combine_low_card`` (which preserves dataset order) but
ORDER-DEPENDENT through the sort-based ``keyed_reduce`` path: the range
shuffle does not preserve intra-key partial order, so a key spanning
batches gets whichever partial lands first — use min/max (or carry an
explicit order column and take min over (order, value)) when the choice
must be deterministic. No in-repo caller uses ``first`` on the sorted
path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MERGE_HOW = {"sum": "sum", "min": "min", "max": "max", "count": "sum",
             "first": "first"}


def make_partial(keys: list[str], spec: dict[str, tuple[str, str]]):
    """Build the per-batch partial aggregator for ``spec``:
    {out_col: (src_col, how)} with how in sum|min|max|count|first."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or any(k not in df.columns for k in keys):
            return pd.DataFrame(columns=keys + list(spec))
        agg = {
            out: (src, "size" if how == "count" else how)
            for out, (src, how) in spec.items()
        }
        return df.groupby(keys, as_index=False).agg(**agg)

    return partial


def make_partial_arrow(keys: list[str], spec: dict[str, tuple[str, str]]):
    """Arrow-native twin of ``make_partial``: prunes the batch to the key +
    source columns and aggregates with ``pa.Table.group_by`` — zero-copy
    from the object store, no Arrow→pandas conversion paying for string
    columns the agg never touches. Same semantics as the pandas partial:
    count = row count (``count_all``), first = first non-null, null-key
    rows dropped (pandas ``groupby`` default)."""
    agg_of = {}  # (src, arrow_how) -> output name arrow will give it
    for out, (src, how) in spec.items():
        ahow = "count_all" if how == "count" else how
        agg_of[(src if how != "count" else "", ahow)] = None
    aggs = []
    for (src, ahow) in agg_of:
        if ahow == "count_all":
            aggs.append(([], "count_all"))
            agg_of[(src, ahow)] = "count_all"
        else:
            aggs.append((src, ahow))
            agg_of[(src, ahow)] = f"{src}_{ahow}"
    need = list(dict.fromkeys(
        keys + [src for _, (src, how) in spec.items() if how != "count"]))

    def partial(t: pa.Table) -> pa.Table:
        if any(k not in t.column_names for k in need):
            return pa.table({c: pa.array([], type=pa.null())
                             for c in keys + list(spec)})
        t = t.select(need)
        if any(t[k].null_count for k in keys):
            import pyarrow.compute as pc

            mask = None
            for k in keys:
                v = pc.is_valid(t[k])
                mask = v if mask is None else pc.and_(mask, v)
            t = t.filter(mask)
        g = t.group_by(keys, use_threads=False).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for out, (src, how) in spec.items():
            ahow = "count_all" if how == "count" else how
            cols[out] = g[agg_of[(src if how != "count" else "", ahow)]]
        return pa.table(cols)

    return partial


def _apply_partial(ds, keys, spec, batch_format: str):
    """Map the right partial flavor over ``ds`` for ``batch_format``."""
    if batch_format == "pyarrow":
        return ds.map_batches(make_partial_arrow(keys, spec),
                              batch_format="pyarrow")
    return ds.map_batches(make_partial(keys, spec),
                          batch_format=batch_format)


def _merge_frame(df: pd.DataFrame, keys: list[str],
                 spec: dict[str, tuple[str, str]]) -> pd.DataFrame:
    agg = {out: (out, MERGE_HOW[how]) for out, (_, how) in spec.items()}
    return df.groupby(keys, as_index=False).agg(**agg)


def combine_low_card(ds, keys: list[str], spec: dict[str, tuple[str, str]],
                     *, batch_format: str = "pandas") -> pd.DataFrame:
    """Partial-per-batch + driver combine. Use when the number of distinct
    keys is small (event types, severities, roles): partial rows are
    O(#batches x #keys), so no shuffle is ever needed."""
    partials = _apply_partial(ds, keys, spec, batch_format).to_pandas()
    if len(partials) == 0:
        return partials
    return _merge_frame(partials, keys, spec)


class _InteriorReduce:
    """map_batches stage over the key-sorted partial stream."""

    def __init__(self, keys: list[str], spec: dict[str, tuple[str, str]]):
        self.keys, self.spec = keys, spec

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cols = self.keys + list(self.spec)
        if len(df) == 0:
            out = df[cols].copy() if set(cols) <= set(df.columns) else pd.DataFrame(columns=cols)
            out["__boundary"] = pd.Series([], dtype=bool)
            return out
        # vectorized boundary mask: a row is boundary iff ALL its key columns
        # equal the batch's first row's keys or ALL equal the last row's —
        # no per-row Python tuples (O(#partial-rows) at conv_id cardinality)
        is_first = np.ones(len(df), dtype=bool)
        is_last = np.ones(len(df), dtype=bool)
        for k in self.keys:
            col = df[k].to_numpy()
            is_first &= col == col[0]
            is_last &= col == col[-1]
        is_boundary = pd.Series(is_first | is_last, index=df.index)
        interior = _merge_frame(df.loc[~is_boundary], self.keys, self.spec)
        interior["__boundary"] = False
        passthrough = df.loc[is_boundary, self.keys + list(self.spec)].copy()
        passthrough["__boundary"] = True
        return pd.concat([interior, passthrough], ignore_index=True)[
            self.keys + list(self.spec) + ["__boundary"]
        ]


def keyed_reduce(ds, keys: list[str], spec: dict[str, tuple[str, str]],
                 *, partial_applied: bool = False,
                 batch_format: str = "pandas"):
    """Exact grouped aggregation at any key cardinality.
    Returns (interior Dataset WITHOUT the boundary flag, driver-side frame of
    stitched boundary keys) — union them, or call ``keyed_reduce_pandas`` for
    a collected result."""
    partials = (
        ds if partial_applied
        else _apply_partial(ds, keys, spec, batch_format)
    )
    merged = partials.sort(keys).map_batches(
        _InteriorReduce(keys, spec), batch_format="pandas"
    ).materialize()
    interior = merged.map_batches(
        lambda df: df[~df["__boundary"]].drop(columns=["__boundary"]),
        batch_format="pandas",
    )
    boundary = merged.map_batches(
        lambda df: df[df["__boundary"]].drop(columns=["__boundary"]),
        batch_format="pandas",
    ).to_pandas()
    if len(boundary):
        boundary = _merge_frame(boundary, keys, spec)
    return interior, boundary


def keyed_reduce_pandas(ds, keys: list[str], spec: dict[str, tuple[str, str]],
                        *, partial_applied: bool = False,
                        batch_format: str = "pandas",
                        driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Collected variant: one pandas frame, exact, sorted by keys.

    driver_cap dual path: the per-batch PARTIAL stream is one row per
    (batch, key) — usually orders of magnitude smaller than the input — so
    when it fits the cap, collecting it once and merging in pandas beats the
    range-sort exchange (whose fixed launch cost dominates at small key
    volume). Above the cap (or with driver_cap=0, which tests use to force
    it) the sort + boundary-stitch path runs unchanged."""
    partials = (
        ds if partial_applied
        else _apply_partial(ds, keys, spec, batch_format)
    ).materialize()
    if partials.count() <= driver_cap:
        df = partials.to_pandas()
        if "__boundary" in df.columns:
            df = df.drop(columns=["__boundary"])
        out = _merge_frame(df, keys, spec) if len(df) else df
    else:
        interior, boundary = keyed_reduce(partials, keys, spec,
                                          partial_applied=True)
        idf = interior.to_pandas()
        if "__boundary" in idf.columns:  # empty-dataset schema quirk
            idf = idf.drop(columns=["__boundary"])
        out = pd.concat([idf, boundary], ignore_index=True)
    if len(out) == 0:
        return out
    return out.sort_values(keys, kind="stable").reset_index(drop=True)

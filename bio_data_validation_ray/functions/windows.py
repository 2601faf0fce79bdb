"""Gap-based session windows over an event stream — the stateful-windowing
operator a training-data pipeline needs (sessionize user/agent event logs)
that the reference, being strictly batch (SURVEY.md §2.11), never had. The
nearest reference ancestors are the per-group ordering checks
(sample_metadata_validator.py:486-504 grouped semantics) and this engine's
own conversation-segment merge.

Scale design — the same sorted-stream + boundary-stitch skeleton as
convstage.MergeSegments / keyed_reduce._InteriorReduce:

  events -> sort(key, ts) -> map_batches: vectorized per-batch session
  PARTIALS (one compact row per maximal within-batch run); every key that is
  interior to a batch finalizes there; each batch's first/last key's
  partials pass through to a tiny driver stitch (<= 2 keys per batch, and
  only their compact partials — never raw events).

Two adjacent partials of one key merge iff the gap between them is <= the
session gap, which is exactly the window semantics — so chunking cannot
split or glue sessions differently than a single pass would.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

SESSION_COLS = ["key", "ts_start", "ts_end", "n_events"]


def _ts_us(col) -> np.ndarray:
    return np.asarray(col).astype("datetime64[us]").astype(np.int64)


def _session_partials(df: pd.DataFrame, key: str, ts_col: str,
                      gap_us: int) -> pd.DataFrame:
    """One compact partial row per maximal session run inside a (key, ts)-
    sorted batch, with the batch's first/last key flagged for the stitch."""
    cols = {"key": object, "ts_start": np.int64, "ts_end": np.int64,
            "n_events": np.int64, "__boundary": bool}
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    k = df[key].to_numpy()
    ts = _ts_us(df[ts_col])
    newkey = np.concatenate([[True], k[1:] != k[:-1]])
    gap_brk = np.diff(ts, prepend=ts[0]) > gap_us
    brk = newkey | gap_brk
    starts = np.flatnonzero(brk)
    ends = np.concatenate([starts[1:], [len(k)]])
    out = pd.DataFrame({
        "key": k[starts],
        "ts_start": ts[starts],
        "ts_end": ts[ends - 1],
        "n_events": (ends - starts).astype(np.int64),
    })
    out["__boundary"] = out["key"].isin({k[0], k[-1]})
    return out


def _merge_partials(frame: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Merge a frame of session partials (any batching) into final sessions,
    vectorized: sort by (key, ts_start), break where the key changes or the
    inter-partial gap exceeds ``gap_us``."""
    if len(frame) == 0:
        return pd.DataFrame(columns=SESSION_COLS)
    frame = frame.sort_values(["key", "ts_start", "ts_end"],
                              kind="stable").reset_index(drop=True)
    k = frame["key"].to_numpy()
    s = frame["ts_start"].to_numpy()
    e = frame["ts_end"].to_numpy()
    n = frame["n_events"].to_numpy()
    same = np.concatenate([[False], k[1:] == k[:-1]])
    prev_end = np.concatenate([[np.int64(-(1 << 62))], e[:-1]])
    brk = ~same | (s - prev_end > gap_us)
    starts = np.flatnonzero(brk)
    out = pd.DataFrame({
        "key": k[starts],
        "ts_start": s[starts],
        "ts_end": np.maximum.reduceat(e, starts),
        "n_events": np.add.reduceat(n, starts).astype(np.int64),
    })
    return out


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts",
               gap_s: float = 3600.0, driver_cap: int = 5_000_000):
    """Session windows -> ``(sessions_ds, sessions_df)``.

    Driver path (partial volume under ``driver_cap``): every compact partial
    collects once and merges vectorized — ``(None, frame)``. Distributed
    path: interior keys' sessions stay a Dataset; only boundary keys'
    partials hit the driver — ``(Dataset, boundary_frame)``; the union of
    both is the full session set (a key is interior XOR boundary)."""
    import ray.data as rd

    gap_us = int(round(gap_s * 1_000_000))
    partials = (
        ds.sort([key, ts_col])
        .map_batches(
            lambda df: _session_partials(df, key, ts_col, gap_us),
            batch_format="pandas",
        )
        .materialize()
    )
    if partials.count() <= driver_cap:
        allp = partials.to_pandas()
        if "__boundary" in allp.columns:
            allp = allp.drop(columns=["__boundary"])
        return None, _merge_partials(allp, gap_us)
    interior = partials.map_batches(
        lambda df: df[~df["__boundary"]].drop(columns=["__boundary"]),
        batch_format="pandas",
    )
    boundary = partials.map_batches(
        lambda df: df[df["__boundary"]].drop(columns=["__boundary"]),
        batch_format="pandas",
    ).to_pandas()
    if "key" not in boundary.columns:
        boundary = pd.DataFrame(columns=SESSION_COLS)
    return interior, _merge_partials(boundary, gap_us)


def _asof_frame(df: pd.DataFrame, key: str, ts_col: str, out_cols: list[str],
                marker: str, marker_col: str, marker_value) -> pd.DataFrame:
    """Vectorized as-of attachment over a (key, ts)-sorted frame: for every
    row, the max marker timestamp at-or-before its own ts (RANGE semantics —
    timestamp ties share one answer regardless of tie order). Pure kernel,
    used by both the per-batch interior pass and the driver stitch."""
    if len(df) == 0:
        out = df[out_cols].copy() if set(out_cols) <= set(df.columns) \
            else pd.DataFrame(columns=out_cols)
        out[marker] = pd.Series(dtype=np.int64)
        return out
    k = df[key].to_numpy()
    ts = _ts_us(df[ts_col])
    is_mark = (df[marker_col] == marker_value).to_numpy()
    v = np.where(is_mark, ts, np.int64(-(1 << 62)))
    newkey = np.concatenate([[True], k[1:] != k[:-1]])
    # value-grouped (RANGE) running max: collapse timestamp ties to one
    # group, max within group, cummax across groups per key
    brk = newkey | np.concatenate([[True], ts[1:] != ts[:-1]])
    starts = np.flatnonzero(brk)
    gid = np.cumsum(brk) - 1
    gmax = np.maximum.reduceat(v, starts)
    gkey = pd.factorize(k[starts])[0]
    run = pd.Series(gmax).groupby(gkey).cummax().to_numpy()
    per_row = run[gid]
    out = df[out_cols].copy()
    out[marker] = per_row
    return out[per_row > np.int64(-(1 << 61))].reset_index(drop=True)


_SENTINEL = np.int64(-(1 << 62))


def _split_boundary(df: pd.DataFrame, key: str, want_boundary: bool
                    ) -> pd.DataFrame:
    """Rows of the batch's FIRST and LAST key (boundary) or everything else
    (interior) — every sorted-stream window op's partitioning rule: a key is
    interior to a batch XOR boundary of some batch."""
    if len(df) == 0:
        return df
    kk = df[key].to_numpy()
    bmask = df[key].isin({kk[0], kk[-1]}).to_numpy()
    return df[bmask] if want_boundary else df[~bmask]


def _dual_path_merge(partials, merge_fn, driver_cap: int):
    """Shared finalize for the compact-partial window ops ->
    ``(interior_ds | None, frame)``.

    Driver path (partial volume under ``driver_cap``): every compact
    partial collects once and merges vectorized — ``(None, frame)``.
    Distributed path: interior keys merge to FINAL rows inside map_batches
    and stay a Dataset (the driver never holds them — at 10^9 keys the
    final rows are themselves big data); only each block's boundary keys
    (at most two per block) stitch centrally — ``(Dataset,
    boundary_frame)``; the union of both is the full result (a key is
    interior XOR boundary). ``merge_fn(frame) -> frame`` must be
    chunking-invariant over stream-ordered partials — exactly the property
    each op's hypothesis test pins — and must itself restore stream order
    from the partials' order snapshots (``__ord{i}`` / first_ts), never
    rely on collection order."""
    partials = partials.materialize()
    if partials.count() <= driver_cap:
        return None, merge_fn(partials.to_pandas())
    interior = partials.map_batches(
        lambda df: merge_fn(_split_boundary(df, "key", False)),
        batch_format="pandas",
    )
    boundary = partials.map_batches(
        lambda df: _split_boundary(df, "key", True), batch_format="pandas"
    ).to_pandas()
    return interior, merge_fn(boundary)


def _collect_pair(interior_ds, frame: pd.DataFrame) -> pd.DataFrame:
    """Convenience collapse of a ``(interior_ds, boundary_frame)`` pair to
    one driver frame. COLLECTS the interior Dataset — callers at unbounded
    key cardinality must consume the pair form instead (write/aggregate
    the Dataset, stitch only the small boundary frame)."""
    if interior_ds is None:
        return frame
    got = interior_ds.to_pandas()
    frames = [f for f in (got, frame) if len(f)]
    if not frames:
        return frame
    return pd.concat(frames, ignore_index=True)


def _asof_partials(df: pd.DataFrame, key: str, ts_col: str, marker_col: str,
                   marker_value) -> pd.DataFrame:
    """One COMPACT partial per key run in a (key, ts)-sorted batch slice:
    (key, first_ts, last_ts, max marker ts [sentinel when none], and whether
    a marker sits exactly at first_ts — the tie the next-batch stitch needs
    under RANGE semantics)."""
    cols = {"key": object, "first_ts": np.int64, "last_ts": np.int64,
            "m": np.int64, "mk_first": bool}
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    k = df[key].to_numpy()
    ts = _ts_us(df[ts_col])
    is_mark = (df[marker_col] == marker_value).to_numpy()
    v = np.where(is_mark, ts, _SENTINEL)
    newkey = np.concatenate([[True], k[1:] != k[:-1]])
    starts = np.flatnonzero(newkey)
    ends = np.concatenate([starts[1:], [len(k)]])
    first_ts = ts[starts]
    gid = np.cumsum(newkey) - 1
    mk_first = np.zeros(starts.size, dtype=bool)
    np.logical_or.at(mk_first, gid[is_mark & (ts == first_ts[gid])], True)
    return pd.DataFrame({
        "key": k[starts],
        "first_ts": first_ts,
        "last_ts": ts[ends - 1],
        "m": np.maximum.reduceat(v, starts),
        "mk_first": mk_first,
    })


def _asof_carry_map(partials: pd.DataFrame) -> dict:
    """Driver stitch over compact as-of partials: for every (key, first_ts,
    last_ts) batch-run signature, the marker carry-in from earlier runs and
    whether a marker ties at the run's last_ts from a later run. Runs with
    identical (t, t) signatures are interchangeable (all rows at ts t) and
    share one merged entry."""
    if len(partials) == 0:
        return {}
    p = partials.sort_values(["key", "first_ts", "last_ts"],
                             kind="stable").reset_index(drop=True)
    k = p["key"].to_numpy()
    newkey = np.concatenate([[True], k[1:] != k[:-1]])
    m = p["m"].to_numpy()
    # carry_in = running max of m over the key's EARLIER runs: shift m down
    # one run, reset at key starts, per-key cummax
    carry = np.concatenate([[_SENTINEL], m[:-1]])
    carry[newkey] = _SENTINEL
    carry = pd.Series(carry).groupby(np.cumsum(newkey)).cummax().to_numpy()
    out: dict = {}
    first = p["first_ts"].to_numpy()
    last = p["last_ts"].to_numpy()
    mkf = p["mk_first"].to_numpy()
    # per key: ts values where some run starts with a marker at its first_ts
    tie_ts: dict = {}
    for i in range(len(p)):
        if mkf[i]:
            tie_ts.setdefault(k[i], set()).add(int(first[i]))
    for i in range(len(p)):
        sig = (k[i], int(first[i]), int(last[i]))
        tie = int(last[i]) in tie_ts.get(k[i], ())
        if sig in out:  # merged (t, t) group keeps the earliest carry
            out[sig] = (min(out[sig][0], int(carry[i])), out[sig][1] or tie)
        else:
            out[sig] = (int(carry[i]), tie)
    return out


def asof_last_marker(ds, *, key: str = "user_id", ts_col: str = "ts",
                     marker_col: str, marker_value, out_cols: list[str],
                     out_name: str = "last_marker_us",
                     driver_cap: int = 5_000_000):
    """As-of join against the stream itself: for every row, attach the
    latest marker-row timestamp of the same key at-or-before the row's own
    ts (RANGE semantics: timestamp ties share one answer; rows with no
    prior marker are dropped). The as-of/range-join class is absent from
    both the reference and Ray Data's relational API (SURVEY.md §2.4 has no
    joins at all); this is the sorted-stream re-expression: sort by
    (key, ts), interior keys finalize vectorized per batch, and boundary
    keys exchange only COMPACT per-(batch, key) partials with the driver —
    (first_ts, last_ts, max marker ts, marker-at-first flag), O(batches)
    rows — never raw rows, so a pathologically hot key costs the driver a
    few bytes per batch. The driver computes each batch-run's marker
    carry-in (+ the RANGE tie at its last_ts from later batches), broadcasts
    the tiny map, and a second pass over the SAME materialized blocks
    finalizes boundary rows distributed. Returns ``(Dataset, frame)`` whose
    union is the result; the frame is empty on the distributed path."""
    import ray

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return _asof_frame(df, key, ts_col, out_cols, out_name,
                           marker_col, marker_value)

    srt = ds.sort([key, ts_col]).materialize()
    if srt.count() <= driver_cap:
        allrows = srt.to_pandas()
        # global frame is fully sorted -> one kernel pass decides every key
        return None, kernel(allrows)

    # batch_size=None pins batches to the materialized blocks so both passes
    # see identical (key-run -> signature) boundaries
    interior = srt.map_batches(
        lambda df: kernel(_split_boundary(df, key, False)),
        batch_format="pandas", batch_size=None,
    )
    partials = srt.map_batches(
        lambda df: _asof_partials(_split_boundary(df, key, True), key,
                                  ts_col, marker_col, marker_value),
        batch_format="pandas", batch_size=None,
    ).to_pandas()
    if "key" not in partials.columns:
        partials = pd.DataFrame(columns=["key", "first_ts", "last_ts", "m",
                                         "mk_first"])
    carry_ref = ray.put(_asof_carry_map(partials))

    def finalize_boundary(df: pd.DataFrame) -> pd.DataFrame:
        carry_map = ray.get(carry_ref)
        b = _split_boundary(df, key, True)
        res = kernel_with_carry(b, carry_map)
        return res

    def kernel_with_carry(b: pd.DataFrame, carry_map: dict) -> pd.DataFrame:
        if len(b) == 0:
            out = pd.DataFrame(columns=out_cols)
            out[out_name] = pd.Series(dtype=np.int64)
            return out
        kk = b[key].to_numpy()
        ts = _ts_us(b[ts_col])
        is_mark = (b[marker_col] == marker_value).to_numpy()
        v = np.where(is_mark, ts, _SENTINEL)
        newkey = np.concatenate([[True], kk[1:] != kk[:-1]])
        brk = newkey | np.concatenate([[True], ts[1:] != ts[:-1]])
        starts = np.flatnonzero(brk)
        gid = np.cumsum(brk) - 1
        gmax = np.maximum.reduceat(v, starts)
        gkey = pd.factorize(kk[starts])[0]
        within = pd.Series(gmax).groupby(gkey).cummax().to_numpy()[gid]
        # per-run carry / tie from the driver map
        kstarts = np.flatnonzero(newkey)
        kends = np.concatenate([kstarts[1:], [len(kk)]])
        ans = within.copy()
        for s, e in zip(kstarts, kends):
            sig = (kk[s], int(ts[s]), int(ts[e - 1]))
            carry, tie = carry_map.get(sig, (_SENTINEL, False))
            seg = ans[s:e]
            np.maximum(seg, np.int64(carry), out=seg)
            if tie:
                at_last = ts[s:e] == ts[e - 1]
                seg[at_last] = np.maximum(seg[at_last], ts[e - 1])
        out = b[out_cols].copy()
        out[out_name] = ans
        return out[ans > np.int64(-(1 << 61))].reset_index(drop=True)

    boundary_done = srt.map_batches(
        finalize_boundary, batch_format="pandas", batch_size=None,
    )
    empty = pd.DataFrame(columns=out_cols + [out_name])
    return interior.union(boundary_done), empty


GAP_PARTIAL_COLS = ["key", "first_ts", "last_ts", "n_gaps", "max_gap_us"]


def _ord_cols_of(frame: pd.DataFrame) -> list[str]:
    """The ``__ord{i}`` order-column snapshots a gap partial carries, in
    declaration order."""
    return sorted((c for c in frame.columns if c.startswith("__ord")),
                  key=lambda c: int(c[5:]))


def _gap_partials(df: pd.DataFrame, key: str, ts_col: str,
                  order_cols: list[str] = ()) -> pd.DataFrame:
    """One COMPACT partial per key inside a sorted batch: (first_ts,
    last_ts, internal gap count, internal max gap). A key's rows are
    contiguous in the sorted stream, so partials merge exactly across
    batches: each stitch adds one bridging gap last_ts(i) -> first_ts(i+1).

    The stream's row order is (key, *order_cols, ts); when timestamps are
    non-monotonic in that order the partial's first_ts does NOT reflect its
    stream position, so each partial also snapshots its first row's
    order-column values (``__ord{i}``) and the merge sorts by those — not by
    first_ts — restoring the exact single-pass gap sequence."""
    if len(df) == 0:
        return pd.DataFrame(columns=GAP_PARTIAL_COLS
                            + [f"__ord{i}" for i in range(len(order_cols))])
    k = df[key].to_numpy()
    ts = _ts_us(df[ts_col])
    newkey = np.concatenate([[True], k[1:] != k[:-1]])
    starts = np.flatnonzero(newkey)
    ends = np.concatenate([starts[1:], [len(k)]])
    gap = np.diff(ts, prepend=ts[0])
    gap[starts] = np.int64(-(1 << 62))  # gaps never cross keys
    out = pd.DataFrame({
        "key": k[starts],
        "first_ts": ts[starts],
        "last_ts": ts[ends - 1],
        "n_gaps": (ends - starts - 1).astype(np.int64),
        "max_gap_us": np.maximum.reduceat(gap, starts),
    })
    for i, oc in enumerate(order_cols):
        out[f"__ord{i}"] = df[oc].to_numpy()[starts]
    return out


def _merge_gap_partials(frame: pd.DataFrame) -> pd.DataFrame:
    """Merge gap partials in stream order — (key, *__ord snapshots,
    first_ts) — per key: total gaps = internal gaps + one bridge per
    adjacent partial pair; max gap = max of internal maxima and bridges."""
    if len(frame) == 0:
        return pd.DataFrame(columns=["key", "n_gaps", "max_gap_us"])
    frame = frame.sort_values(
        ["key", *_ord_cols_of(frame), "first_ts", "last_ts"],
        kind="stable").reset_index(drop=True)
    k = frame["key"].to_numpy()
    f = frame["first_ts"].to_numpy()
    last = frame["last_ts"].to_numpy()
    same = np.concatenate([[False], k[1:] == k[:-1]])
    bridge = np.where(
        same, f - np.concatenate([[np.int64(0)], last[:-1]]),
        np.int64(-(1 << 62)),
    )
    starts = np.flatnonzero(~same)
    n_gaps = (np.add.reduceat(frame["n_gaps"].to_numpy(), starts)
              + np.add.reduceat(same.astype(np.int64), starts))
    maxg = np.maximum(
        np.maximum.reduceat(frame["max_gap_us"].to_numpy(), starts),
        np.maximum.reduceat(bridge, starts),
    )
    out = pd.DataFrame({"key": k[starts], "n_gaps": n_gaps.astype(np.int64),
                        "max_gap_us": maxg})
    return out[out["n_gaps"] > 0].reset_index(drop=True)


def gap_stats(ds, *, key: str, order_cols: list[str], ts_col: str,
              driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Per-key inter-row gap summary (n_gaps, max_gap_us) in the key's own
    ordering — e.g. per-conversation response latency between consecutive
    turns, the windowed-aggregate analog of the reference's per-group
    ordering checks (SURVEY.md §2.6). Fully compact at scale: every batch
    reduces to one partial per key (first/last ts + internal stats), and
    partials merge exactly — a hot key crossing many batches reaches the
    merge as #batches tiny rows, never as raw rows. COLLECTS the full
    per-key result — use ``gap_stats_ds`` at unbounded key cardinality.
    -> DataFrame[(key, n_gaps, max_gap_us)] sorted by key."""
    out = _collect_pair(*gap_stats_ds(
        ds, key=key, order_cols=order_cols, ts_col=ts_col,
        driver_cap=driver_cap))
    out["n_gaps"] = out["n_gaps"].astype(np.int64)
    out["max_gap_us"] = out["max_gap_us"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def gap_stats_ds(ds, *, key: str, order_cols: list[str], ts_col: str,
                 driver_cap: int = 5_000_000):
    """Scale form of ``gap_stats`` -> ``(interior_ds | None,
    boundary_frame)``: interior keys merge to final (key, n_gaps,
    max_gap_us) rows inside map_batches and stay a Dataset; only each
    block's first/last keys' partials stitch on the driver."""
    partials = (
        ds.sort([key] + order_cols + [ts_col])
        .map_batches(lambda df: _gap_partials(df, key, ts_col, order_cols),
                     batch_format="pandas")
        .materialize()
    )
    ord_snap = [f"__ord{i}" for i in range(len(order_cols))]
    if partials.count() <= driver_cap:
        return None, _merge_gap_partials(partials.to_pandas())
    # sort the COMPACT partials into stream order — (key, order-column
    # snapshots, first_ts), NOT bare first_ts, which lies when ts is
    # non-monotonic in the key's own ordering; interior keys merge to
    # final rows in place, each batch's first/last key's partials
    # stitch on the driver (same invariant as sessionize)
    srt2 = partials.sort(["key", *ord_snap, "first_ts"]).materialize()

    split = functools.partial(_split_boundary, key="key")

    interior = srt2.map_batches(
        lambda df: _merge_gap_partials(split(df, want_boundary=False)),
        batch_format="pandas",
    )
    boundary = srt2.map_batches(
        lambda df: split(df, want_boundary=True), batch_format="pandas"
    ).to_pandas()
    if "key" not in boundary.columns:
        boundary = pd.DataFrame(columns=GAP_PARTIAL_COLS)
    return interior, _merge_gap_partials(boundary)


def grouped_top_n(ds, *, key: str, order_cols: list[str], n: int,
                  driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Deterministic top-``n`` rows per key in (order_cols) order — the
    stratified-head / per-group ranking op (SQL row_number() <= n). Same
    sorted-stream skeleton as the other window ops: keys interior to a
    batch take their head vectorized in place; boundary keys send the
    driver only their per-batch head-``n`` (the global head-n of a key is a
    prefix of its concatenated batch runs, and a length-n prefix intersects
    each run in a prefix of length <= n), so a hot key costs the driver
    O(n) rows per batch, never its full row set. order_cols + the sort's
    stability must give a total order per key for determinism (include a
    tiebreaker id column). COLLECTS the full head-n result — use
    ``grouped_top_n_ds`` at unbounded key cardinality."""
    out = _collect_pair(*grouped_top_n_ds(
        ds, key=key, order_cols=order_cols, n=n, driver_cap=driver_cap))
    return out.sort_values([key] + order_cols, kind="stable") \
        .reset_index(drop=True)


def grouped_top_n_ds(ds, *, key: str, order_cols: list[str], n: int,
                     driver_cap: int = 5_000_000):
    """Scale form of ``grouped_top_n`` -> ``(interior_ds | None,
    boundary_frame)``: interior keys' head-n rows stay a Dataset; the
    driver only ever holds the boundary keys' per-batch head-n
    partials."""
    srt = ds.sort([key] + order_cols).materialize()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        # dropna=False: a null key is a group, not a silent row drop
        return df.groupby(key, sort=False, dropna=False).head(n)

    if srt.count() <= driver_cap:
        return None, kernel(srt.to_pandas())
    interior = srt.map_batches(
        lambda df: kernel(_split_boundary(df, key, False)),
        batch_format="pandas",
    )
    # compact boundary partial: this batch's head-n per boundary key
    boundary = srt.map_batches(
        lambda df: kernel(_split_boundary(df, key, True)),
        batch_format="pandas",
    ).to_pandas()
    if len(boundary):
        boundary = kernel(
            boundary.sort_values([key] + order_cols, kind="stable"))
    return interior, boundary


def _pdisc_partials(df: pd.DataFrame, key: str, value_col: str
                    ) -> pd.DataFrame:
    """One COMPACT partial per key run in a (key, value)-sorted batch
    slice: (key, n_rows, first value, last value)."""
    if len(df) == 0:
        return pd.DataFrame({"key": pd.Series(dtype=object),
                             "n_rows": pd.Series(dtype=np.int64),
                             "v_first": pd.Series(dtype=np.float64),
                             "v_last": pd.Series(dtype=np.float64)})
    k = df[key].to_numpy()
    v = df[value_col].to_numpy()
    newkey = np.concatenate([[True], k[1:] != k[:-1]])
    starts = np.flatnonzero(newkey)
    ends = np.concatenate([starts[1:], [len(k)]])
    return pd.DataFrame({"key": k[starts],
                         "n_rows": (ends - starts).astype(np.int64),
                         "v_first": v[starts], "v_last": v[ends - 1]})


def _pdisc_resolve(partials: pd.DataFrame, q: float
                   ) -> tuple[pd.DataFrame, dict]:
    """Driver stitch over compact percentile partials: per key, total count
    -> 1-based rank max(1, ceil(q*n)) -> the batch run containing the rank.
    Runs with v_first == v_last decide immediately (the answer IS that
    value); otherwise the run's unique (key, v_first, v_last) signature maps
    to the in-run offset for a targeted second-pass extraction."""
    done_rows: list = []
    need: dict = {}
    if len(partials) == 0:
        return pd.DataFrame(columns=["key", "p"]), need
    p = partials.sort_values(["key", "v_first", "v_last"],
                             kind="stable").reset_index(drop=True)
    for kk, grp in p.groupby("key", sort=False):
        counts = grp["n_rows"].to_numpy()
        total = int(counts.sum())
        rank = max(1, int(np.ceil(q * total)))
        ends = np.cumsum(counts)
        i = int(np.searchsorted(ends, rank))
        off = rank - (int(ends[i - 1]) if i else 0)  # 1-based within run
        vf, vl = grp["v_first"].iloc[i], grp["v_last"].iloc[i]
        if vf == vl:
            done_rows.append((kk, vf))
        else:
            need[(kk, vf, vl)] = off
    return pd.DataFrame(done_rows, columns=["key", "p"]), need


def grouped_percentile_disc(ds, *, key: str, value_col: str, q: float,
                            driver_cap: int = 5_000_000) -> pd.DataFrame:
    """EXACT per-key discrete percentile (SQL percentile_disc semantics:
    the value at 1-based rank max(1, ceil(q*n)) of the key's sorted values)
    — the hash-green exact twin of the t-digest quantile sketch. Sorted-
    stream skeleton: interior keys hold all their rows in one batch, so the
    rank row selects locally; boundary keys exchange only COMPACT
    per-(batch, key) count partials (key, n_rows, v_first, v_last) with the
    driver — O(batches) rows, never raw rows or value runs. The driver
    locates each key's rank inside one batch run; when that run spans a
    single value the answer is immediate, otherwise a targeted second pass
    over the SAME materialized blocks extracts exactly one row per pending
    key. COLLECTS the full per-key result — use
    ``grouped_percentile_disc_ds`` at unbounded key cardinality.
    -> DataFrame[(key, p)] sorted by key."""
    out = _collect_pair(*grouped_percentile_disc_ds(
        ds, key=key, value_col=value_col, q=q, driver_cap=driver_cap))
    return out.sort_values(key, kind="stable").reset_index(drop=True)


def grouped_percentile_disc_ds(ds, *, key: str, value_col: str, q: float,
                               driver_cap: int = 5_000_000):
    """Scale form of ``grouped_percentile_disc`` -> ``(interior_ds | None,
    boundary_frame)``: interior keys' (key, p) rows stay a Dataset; the
    driver resolves only boundary keys from compact count partials (plus
    the targeted one-row-per-pending-key extraction)."""
    import ray

    srt = ds.sort([key, value_col]).materialize()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=[key, "p"])
        k = df[key].to_numpy()
        starts = np.concatenate(
            [[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [len(k)]]))
        ranks = np.maximum(1, np.ceil(q * counts)).astype(np.int64)
        idx = starts + ranks - 1
        return pd.DataFrame({key: k[starts],
                             "p": df[value_col].to_numpy()[idx]})

    if srt.count() <= driver_cap:
        return None, kernel(srt.to_pandas())
    # batch_size=None pins batches to the materialized blocks so the
    # partial pass and the extraction pass see identical key runs
    interior = srt.map_batches(
        lambda df: kernel(_split_boundary(df, key, False)),
        batch_format="pandas", batch_size=None,
    )
    partials = srt.map_batches(
        lambda df: _pdisc_partials(
            _split_boundary(df, key, True), key, value_col),
        batch_format="pandas", batch_size=None,
    ).to_pandas()
    if "key" not in partials.columns:
        partials = pd.DataFrame(
            columns=["key", "n_rows", "v_first", "v_last"])
    done, need = _pdisc_resolve(partials, q)
    frames = []
    if len(done):
        frames.append(done.rename(columns={"key": key}))
    if need:
        need_ref = ray.put(need)

        def extract(df: pd.DataFrame) -> pd.DataFrame:
            todo = ray.get(need_ref)
            b = _split_boundary(df, key, True)
            if len(b) == 0:
                return pd.DataFrame(columns=[key, "p"])
            k = b[key].to_numpy()
            v = b[value_col].to_numpy()
            starts = np.concatenate(
                [[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
            ends = np.concatenate([starts[1:], [len(k)]])
            rows = []
            for s, e in zip(starts, ends):
                off = todo.get((k[s], v[s], v[e - 1]))
                if off is not None:
                    rows.append((k[s], v[s + off - 1]))
            return pd.DataFrame(rows, columns=[key, "p"])

        frames.append(srt.map_batches(
            extract, batch_format="pandas", batch_size=None,
        ).to_pandas())
    frames = [f for f in frames if len(f)]
    boundary = (pd.concat(frames, ignore_index=True)
                if frames else pd.DataFrame(columns=[key, "p"]))
    return interior, boundary


def _pcont_kernel(df: pd.DataFrame, key: str, value_col: str, q: float
                  ) -> pd.DataFrame:
    """Vectorized percentile_cont over complete key runs: 1-based fractional
    rank rn = 1 + q*(n-1); p = v[lo] + (rn-lo)*(v[hi]-v[lo])."""
    if len(df) == 0:
        return pd.DataFrame(columns=[key, "p"])
    k = df[key].to_numpy()
    v = df[value_col].to_numpy().astype(np.float64)
    starts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
    counts = np.diff(np.concatenate([starts, [len(k)]]))
    rn = 1.0 + q * (counts - 1)
    lo = np.floor(rn).astype(np.int64)
    hi = np.ceil(rn).astype(np.int64)
    vlo = v[starts + lo - 1]
    vhi = v[starts + hi - 1]
    return pd.DataFrame({key: k[starts], "p": vlo + (rn - lo) * (vhi - vlo)})


def grouped_percentile_cont(ds, *, key: str, value_col: str, q: float,
                            driver_cap: int = 5_000_000) -> pd.DataFrame:
    """EXACT per-key INTERPOLATED percentile (SQL percentile_cont): at
    fractional 1-based rank rn = 1 + q*(n-1), p = v_lo + (rn-lo)*(v_hi-v_lo)
    over the key's sorted values. Same compact-partial skeleton as
    grouped_percentile_disc — interior keys interpolate locally inside
    their batch; a boundary key exchanges only (key, n_rows, v_first,
    v_last) count partials, the driver locates its TWO bracketing ranks,
    and a targeted second pass extracts at most two rows per pending key.
    Over integer inputs with q = 0.5 the result is exact in float64 (frac
    is 0 or 0.5), which is how the SQL twin states it bit-identically.
    COLLECTS the full per-key result — use ``grouped_percentile_cont_ds``
    at unbounded key cardinality.
    -> DataFrame[(key, p: float64)] sorted by key."""
    out = _collect_pair(*grouped_percentile_cont_ds(
        ds, key=key, value_col=value_col, q=q, driver_cap=driver_cap))
    return out.sort_values(key, kind="stable").reset_index(drop=True)


def grouped_percentile_cont_ds(ds, *, key: str, value_col: str, q: float,
                               driver_cap: int = 5_000_000):
    """Scale form of ``grouped_percentile_cont`` -> ``(interior_ds | None,
    boundary_frame)``: interior keys interpolate inside map_batches and
    stay a Dataset; boundary keys resolve centrally from compact count
    partials plus an at-most-two-rows-per-key targeted extraction."""
    import ray

    srt = ds.sort([key, value_col]).materialize()
    if srt.count() <= driver_cap:
        return None, _pcont_kernel(srt.to_pandas(), key, value_col, q)

    interior = srt.map_batches(
        lambda df: _pcont_kernel(_split_boundary(df, key, False),
                                 key, value_col, q),
        batch_format="pandas", batch_size=None,
    )
    partials = srt.map_batches(
        lambda df: _pdisc_partials(_split_boundary(df, key, True),
                                   key, value_col),
        batch_format="pandas", batch_size=None,
    ).to_pandas()
    if "key" not in partials.columns:
        partials = pd.DataFrame(columns=["key", "n_rows", "v_first",
                                         "v_last"])
    # resolve the two bracketing ranks per boundary key from counts alone
    vals: dict = {}    # (key, tag) -> value, tag in {0: lo, 1: hi}
    meta: dict = {}    # key -> (rn, lo)
    need: dict = {}    # (key, v_first, v_last) -> [(tag, off), ...]
    if len(partials):
        p = partials.sort_values(["key", "v_first", "v_last"],
                                 kind="stable").reset_index(drop=True)
        for kk, grp in p.groupby("key", sort=False):
            counts = grp["n_rows"].to_numpy()
            total = int(counts.sum())
            rn = 1.0 + q * (total - 1)
            lo, hi = int(np.floor(rn)), int(np.ceil(rn))
            meta[kk] = (rn, lo)
            ends = np.cumsum(counts)
            for tag, rank in ((0, lo), (1, hi)):
                i = int(np.searchsorted(ends, rank))
                off = rank - (int(ends[i - 1]) if i else 0)
                vf, vl = grp["v_first"].iloc[i], grp["v_last"].iloc[i]
                if vf == vl:
                    vals[(kk, tag)] = float(vf)
                else:
                    need.setdefault((kk, vf, vl), []).append((tag, off))
    if need:
        need_ref = ray.put(need)

        def extract(df: pd.DataFrame) -> pd.DataFrame:
            todo = ray.get(need_ref)
            b = _split_boundary(df, key, True)
            if len(b) == 0:
                return pd.DataFrame(columns=["key", "tag", "v"])
            k = b[key].to_numpy()
            v = b[value_col].to_numpy()
            starts = np.concatenate(
                [[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
            ends = np.concatenate([starts[1:], [len(k)]])
            rows = []
            for s, e in zip(starts, ends):
                for tag, off in todo.get((k[s], v[s], v[e - 1]), ()):
                    rows.append((k[s], tag, float(v[s + off - 1])))
            return pd.DataFrame(rows, columns=["key", "tag", "v"])

        got = srt.map_batches(extract, batch_format="pandas",
                              batch_size=None).to_pandas()
        for r in got.itertuples():
            vals[(r.key, r.tag)] = r.v
    rows = []
    for kk, (rn, lo) in meta.items():
        vlo, vhi = vals[(kk, 0)], vals[(kk, 1)]
        rows.append((kk, vlo + (rn - lo) * (vhi - vlo)))
    boundary = pd.DataFrame(rows, columns=[key, "p"])
    return interior, boundary


def session_stats(ds, *, key: str = "user_id", ts_col: str = "ts",
                  gap_s: float = 3600.0,
                  driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Per-key session summary -> DataFrame[(key, n_sessions, n_events)],
    sorted by key. In the distributed path the interior sessions reduce via
    the keyed-reduce stage; the driver only ever sees per-key aggregates
    plus the boundary keys' compact partials."""
    from ..stages.keyed_reduce import keyed_reduce_pandas

    sessions_ds, sessions_df = sessionize(ds, key=key, ts_col=ts_col,
                                          gap_s=gap_s, driver_cap=driver_cap)
    frames = []
    if len(sessions_df):
        frames.append(
            sessions_df.groupby("key", as_index=False).agg(
                n_sessions=("n_events", "size"), n_events=("n_events", "sum")
            )
        )
    if sessions_ds is not None:
        agg = keyed_reduce_pandas(
            sessions_ds, ["key"],
            {"n_sessions": ("n_events", "count"),
             "n_events": ("n_events", "sum")},
            driver_cap=driver_cap,
        )
        if len(agg):
            frames.append(agg)
    if not frames:
        return pd.DataFrame(columns=["key", "n_sessions", "n_events"])
    out = pd.concat(frames, ignore_index=True)
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


# --- rolling (sliding row-window) aggregate -------------------------------

_ROLL_SENT = np.int64(-(1 << 62))


def _roll_partials(df: pd.DataFrame, key: str, value_col: str, k: int,
                   order_cols: list[str] = ()) -> pd.DataFrame:
    """One COMPACT partial per key-run of a sorted batch for a k-row
    rolling-sum maximum: run length / total sum / max over FULL k-windows
    contained in the batch, plus the run's first and last (k-1) values as
    fixed columns (h0..h{k-2} chronological head, t0..t{k-2} tail with t0 =
    last row). A hot key crossing many batches costs O(k) values per batch —
    never its raw rows (the compact-partial discipline of gap_stats /
    sessionize; SURVEY.md §2.6 windowed aggregates)."""
    cols = (["key", "n", "total", "interior_max"]
            + [f"h{j}" for j in range(k - 1)]
            + [f"t{j}" for j in range(k - 1)]
            + [f"__ord{i}" for i in range(len(order_cols))])
    if len(df) == 0:
        return pd.DataFrame(columns=cols)
    kcol = df[key].to_numpy()
    if not np.issubdtype(df[value_col].dtype, np.integer):
        raise TypeError(
            f"rolling_sum_max: {value_col} must be an integer column "
            f"(got {df[value_col].dtype}); floats would truncate silently")
    v = df[value_col].to_numpy(dtype=np.int64)
    if v.min(initial=0) < 0:
        raise ValueError(
            "rolling_sum_max requires value_col >= 0 (the leading-window "
            "domination argument in the docstring fails otherwise)")
    newkey = np.concatenate([[True], kcol[1:] != kcol[:-1]])
    starts = np.flatnonzero(newkey)
    ends = np.concatenate([starts[1:], [len(kcol)]])
    n = ends - starts
    run_start_of_row = np.repeat(starts, n)
    cum0 = np.concatenate([[np.int64(0)], np.cumsum(v)])
    idx = np.arange(len(v))
    valid = (idx - run_start_of_row) >= (k - 1)
    winsum = np.where(valid, cum0[idx + 1] - cum0[np.maximum(idx + 1 - k, 0)],
                      _ROLL_SENT)
    out = pd.DataFrame({
        "key": kcol[starts],
        "n": n.astype(np.int64),
        "total": (cum0[ends] - cum0[starts]).astype(np.int64),
        "interior_max": np.maximum.reduceat(winsum, starts),
    })
    for j in range(k - 1):
        hidx = starts + j
        out[f"h{j}"] = np.where(j < n, v[np.minimum(hidx, len(v) - 1)],
                                np.int64(0))
        tidx = ends - 1 - j
        out[f"t{j}"] = np.where(j < n, v[np.maximum(tidx, 0)], np.int64(0))
    # first-row order-column snapshot: the merge re-sorts partials by
    # (key, __ord...) instead of trusting collection order (cf. gap_stats)
    for i, oc in enumerate(order_cols):
        out[f"__ord{i}"] = df[oc].to_numpy()[starts]
    return out


def _merge_roll_partials(frame: pd.DataFrame, k: int) -> pd.DataFrame:
    """Merge rolling partials per key in stream order. Partials carry their
    first row's order-column snapshot (``__ord{i}``), so the merge
    re-sorts by (key, snapshots) instead of trusting collection order —
    Ray's block order surviving a collect is an implementation detail, not
    a contract. Keys living in a single partial resolve fully vectorized;
    only keys that span batch boundaries walk the O(k) stitch (numpy row
    arrays, no per-row pandas indexing)."""
    if len(frame) == 0:
        return pd.DataFrame(columns=["key", "max_roll"])
    frame = frame.sort_values(["key", *_ord_cols_of(frame)],
                              kind="stable").reset_index(drop=True)
    counts = frame["key"].value_counts()
    singles = counts[counts == 1].index
    one = frame[frame["key"].isin(singles)]
    res_one = pd.DataFrame({
        "key": one["key"].to_numpy(),
        "max_roll": np.where(one["n"].to_numpy() >= k,
                             one["interior_max"].to_numpy(),
                             one["total"].to_numpy()),
    })
    multi = frame[~frame["key"].isin(singles)]
    rows = []
    hcols = [f"h{j}" for j in range(k - 1)]
    tcols = [f"t{j}" for j in range(k - 1)]
    for key_val, g in multi.groupby("key", sort=False):
        pn_a = g["n"].to_numpy(dtype=np.int64)
        im_a = g["interior_max"].to_numpy(dtype=np.int64)
        tt_a = g["total"].to_numpy(dtype=np.int64)
        h_a = g[hcols].to_numpy(dtype=np.int64) if hcols else \
            np.empty((len(g), 0), dtype=np.int64)
        t_a = g[tcols].to_numpy(dtype=np.int64) if tcols else \
            np.empty((len(g), 0), dtype=np.int64)
        carry: list[int] = []
        best = int(_ROLL_SENT)
        for r in range(len(g)):
            pn = int(pn_a[r])
            m = min(pn, k - 1)
            head = h_a[r, :m].tolist()
            if carry:
                for j in range(m):
                    need = k - 1 - j
                    if need > 0 and len(carry) >= need:
                        s = sum(carry[-need:]) + sum(head[: j + 1])
                        best = max(best, s)
            best = max(best, int(im_a[r]))
            if pn >= k - 1:
                carry = t_a[r, ::-1].tolist()
            else:
                carry = (carry + head)[-(k - 1):]
        tot_n = int(pn_a.sum())
        tot_s = int(tt_a.sum())
        rows.append((key_val, best if tot_n >= k else tot_s))
    res_multi = pd.DataFrame(rows, columns=["key", "max_roll"])
    out = pd.concat([res_one, res_multi], ignore_index=True)
    out["max_roll"] = out["max_roll"].astype(np.int64)
    return out


def rolling_sum_max(ds, *, key: str, order_cols: list[str], value_col: str,
                    k: int = 3, driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Per-key maximum of the k-row rolling sum of ``value_col`` in the
    key's own ordering — SQL ``max(sum(v) OVER (PARTITION BY key ORDER BY
    order_cols ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW))``.

    Requires value_col >= 0 (leading partial windows are then dominated by
    the first full window, so only full k-windows — plus the whole-key total
    when the key has < k rows — can carry the max). Distributed shape: one
    sorted scan emitting O(k) bytes per (batch, key); keys interior to a
    batch finalize vectorized; boundary keys stitch from compact partials
    only, so a 10^9-row hot key reaches the driver as #batches tiny rows.
    COLLECTS the full per-key result on the driver — use
    ``rolling_sum_max_ds`` at unbounded key cardinality.
    -> DataFrame[(key, max_roll)] sorted by key."""
    out = _collect_pair(*rolling_sum_max_ds(
        ds, key=key, order_cols=order_cols, value_col=value_col, k=k,
        driver_cap=driver_cap))
    out["max_roll"] = out["max_roll"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def rolling_sum_max_ds(ds, *, key: str, order_cols: list[str],
                       value_col: str, k: int = 3,
                       driver_cap: int = 5_000_000):
    """Scale form of ``rolling_sum_max`` -> ``(interior_ds | None,
    boundary_frame)``: interior keys' final (key, max_roll) rows stay a
    Dataset (write/aggregate them without a driver collect); only boundary
    keys' stitched rows hit the driver. Partials carry order-column
    snapshots, so the merge never depends on collection order."""
    partials = ds.sort([key] + list(order_cols)).map_batches(
        lambda df: _roll_partials(df, key, value_col, k, order_cols),
        batch_format="pandas")
    return _dual_path_merge(
        partials, lambda f: _merge_roll_partials(f, k), driver_cap)


# --- ordered per-key document assembly ------------------------------------


def _assemble_partials(df: pd.DataFrame, key: str, text_col: str,
                       order_cols: list[str], sep: str) -> pd.DataFrame:
    """One partial per key-run of a sorted batch: the run's texts joined
    with ``sep`` plus the first row's order-column snapshot (``__ord{i}``)
    so partials of a key re-order exactly even after a shuffle."""
    cols = ["key", "seg"] + [f"__ord{i}" for i in range(len(order_cols))]
    if len(df) == 0:
        return pd.DataFrame(columns=cols)
    k = df[key].to_numpy()
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    txt = df[text_col].fillna("").astype(str)
    seg = (txt.groupby(k, sort=False).agg(sep.join)
           .reindex(k[starts]).to_numpy())
    out = pd.DataFrame({"key": k[starts], "seg": seg})
    for i, oc in enumerate(order_cols):
        out[f"__ord{i}"] = df[oc].to_numpy()[starts]
    return out


def _finalize_docs(frame: pd.DataFrame, sep: str) -> pd.DataFrame:
    """Join each key's segments in stream order and reduce to the compact
    (doc_len, doc_md5) summary — the raw document never leaves this step."""
    import hashlib

    if len(frame) == 0:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "doc_len": pd.Series([], dtype=np.int64),
                             "doc_md5": pd.Series([], dtype=object)})
    frame = frame.sort_values(["key", *_ord_cols_of(frame)],
                              kind="stable")
    docs = frame.groupby("key", sort=False)["seg"].agg(sep.join)
    return pd.DataFrame({
        "key": docs.index.to_numpy(),
        "doc_len": docs.str.len().to_numpy(np.int64),
        "doc_md5": [hashlib.md5(d.encode("utf-8")).hexdigest()
                    for d in docs.to_numpy()],
    })


def assemble_docs(ds, *, key: str, order_cols: list[str], text_col: str,
                  sep: str = "\n",
                  driver_byte_cap: int = 32 << 20,
                  driver_cap: int | None = None) -> pd.DataFrame:
    """Ordered per-key text assembly (conversation -> training document,
    SQL ``string_agg(text, sep ORDER BY order_cols)``), summarized as
    (key, doc_len, doc_md5). One sorted scan emits one joined segment per
    (batch, key); keys interior to a block finalize inside map_batches —
    their assembled text reduces to len+md5 WITHOUT crossing to the driver
    — and only boundary keys' segments stitch centrally. Per-key locality
    is inherent to assembly (a conversation's bytes must meet somewhere);
    the partitioning assumption is that one key's text fits a worker.

    Unlike the compact-partial ops, these partial rows carry TEXT, so the
    driver fast path gates on ``size_bytes`` (not row count): beyond
    ``driver_byte_cap`` the interior keys hash in parallel inside
    map_batches and only the two boundary keys per block reach the driver.
    ``driver_cap`` (rows) is kept for tests that force a path. COLLECTS
    the full per-key (len, md5) result — use ``assemble_docs_ds`` at
    unbounded key cardinality."""
    out = _collect_pair(*assemble_docs_ds(
        ds, key=key, order_cols=order_cols, text_col=text_col, sep=sep,
        driver_byte_cap=driver_byte_cap, driver_cap=driver_cap))
    out["doc_len"] = out["doc_len"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def assemble_docs_ds(ds, *, key: str, order_cols: list[str], text_col: str,
                     sep: str = "\n",
                     driver_byte_cap: int = 32 << 20,
                     driver_cap: int | None = None):
    """Scale form of ``assemble_docs`` -> ``(interior_ds | None,
    boundary_frame)``: interior keys' (key, doc_len, doc_md5) rows stay a
    Dataset; only boundary keys' text segments reach the driver."""
    partials = (
        ds.sort([key] + list(order_cols))
        .map_batches(
            lambda df: _assemble_partials(df, key, text_col, order_cols,
                                          sep),
            batch_format="pandas")
        .materialize()
    )
    take_driver = (partials.count() <= driver_cap if driver_cap is not None
                   else partials.size_bytes() <= driver_byte_cap)
    if take_driver:
        return None, _finalize_docs(partials.to_pandas(), sep)
    interior = partials.map_batches(
        lambda df: _finalize_docs(_split_boundary(df, "key", False), sep),
        batch_format="pandas",
    )
    boundary = partials.map_batches(
        lambda df: _split_boundary(df, "key", True),
        batch_format="pandas",
    ).to_pandas()
    return interior, _finalize_docs(boundary, sep)


def grouped_quota_head(ds, *, key: str, order_cols: list[str],
                       quota: dict, driver_cap: int = 5_000_000
                       ) -> pd.DataFrame:
    """Per-key VARIABLE-quota head: the first ``quota[key]`` rows of each
    key in (order_cols) order. Runs as one grouped_top_n at n = max(quota)
    (same compact boundary partials, so a hot key still costs the driver
    O(n) rows per batch), then trims each key to its own quota on the
    already-bounded result (<= #keys * n rows)."""
    if not quota:
        return pd.DataFrame(columns=[key] + order_cols)
    n_max = max(quota.values())
    out = grouped_top_n(ds, key=key, order_cols=order_cols, n=n_max,
                        driver_cap=driver_cap)
    if not len(out):
        return out
    rank = out.groupby(key, sort=False).cumcount()
    keep = rank < out[key].map(quota).fillna(0).astype(np.int64)
    return out[keep.to_numpy()].reset_index(drop=True)


_TS_NEG = np.int64(np.iinfo(np.int64).min)
_TS_INF = np.int64(np.iinfo(np.int64).max)


def _funnel_partials(df: pd.DataFrame, key: str, ts_col: str,
                     type_col: str, steps: tuple) -> pd.DataFrame:
    """One compact partial per key inside a (key, ts)-sorted batch: the
    funnel automaton's TRANSITION TABLE f(s_in) -> s_out for every possible
    incoming step count s_in. Because the stream is ts-sorted within a key,
    every event in this batch is >= every earlier timestamp of the key, so
    the ``ts >= t_prev_step`` constraint is vacuous across the boundary and
    the carried state collapses to the step count alone — a segment of ANY
    size reduces to k+1 small ints. That is what makes this hot-key safe:
    a user with 10^9 events spanning B batches reaches the merge as B rows
    of k+1 ints, never raw events (the parallel-automaton / function-
    composition form of a sequential scan).

    For each start state s0 the within-batch chain is the greedy
    t_{j+1} = min{ ts : type == steps[j+1], ts >= t_j }, evaluated
    vectorized over all key-runs at once with masked minimum.reduceat —
    k(k+1)/2 reduceat passes total, no per-key Python."""
    k = len(steps)
    cols = (["key", "first_ts", "last_ts"]
            + [f"f{s}" for s in range(k + 1)])
    if len(df) == 0:
        return pd.DataFrame(columns=cols)
    kk = df[key].to_numpy()
    ts = _ts_us(df[ts_col])
    tv = df[type_col].to_numpy()
    code = np.full(len(tv), -1, dtype=np.int64)
    for j, s in enumerate(steps):
        code[tv == s] = j
    newkey = np.concatenate([[True], kk[1:] != kk[:-1]])
    starts = np.flatnonzero(newkey)
    run_id = np.cumsum(newkey) - 1
    nruns = len(starts)
    out = {"key": kk[starts], "first_ts": ts[starts],
           "last_ts": ts[np.concatenate([starts[1:], [len(kk)]]) - 1]}
    for s0 in range(k):
        t = np.full(nruns, _TS_NEG, dtype=np.int64)
        done = np.full(nruns, s0, dtype=np.int64)
        for j in range(s0, k):
            cand = np.where((code == j) & (ts >= t[run_id]), ts, _TS_INF)
            tnew = np.minimum.reduceat(cand, starts)
            ok = tnew != _TS_INF
            done = np.where(ok, j + 1, done)
            t = np.where(ok, tnew, _TS_INF)
        out[f"f{s0}"] = done
    out[f"f{k}"] = np.full(nruns, k, dtype=np.int64)
    return pd.DataFrame(out)


def _merge_funnel_partials(frame: pd.DataFrame, k: int) -> pd.DataFrame:
    """Compose each key's transition tables in stream order starting from
    state 0. The loop runs max-partials-per-key rounds (the number of
    batches the hottest key spans), each round a vectorized gather over ALL
    keys — never a per-key Python pass."""
    if len(frame) == 0:
        return pd.DataFrame({"key": [], "steps_completed": []})
    frame = frame.sort_values(["key", "first_ts", "last_ts"],
                              kind="stable").reset_index(drop=True)
    keys = frame["key"].to_numpy()
    starts = np.flatnonzero(
        np.concatenate([[True], keys[1:] != keys[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(keys)]]))
    ftab = frame[[f"f{s}" for s in range(k + 1)]].to_numpy()
    state = np.zeros(len(starts), dtype=np.int64)
    for r in range(int(counts.max())):
        live = counts > r
        state[live] = ftab[starts[live] + r, state[live]]
    return pd.DataFrame({"key": keys[starts], "steps_completed": state})


def _transition_partials(df: pd.DataFrame, key: str, type_col: str
                         ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One batch of the (key, order)-sorted stream reduces to (a) the
    batch-internal transition counts — at most n_types^2 rows however large
    the batch — and (b) one compact (first_type, last_type) boundary row
    per key-run for cross-batch bridging. No raw rows survive the batch."""
    if len(df) == 0:
        return (pd.DataFrame(columns=["from_type", "to_type", "n"]),
                pd.DataFrame(columns=["key", "first_type", "last_type"]))
    kk = df[key].to_numpy()
    # use_na_sentinel=False: a null type becomes a real category instead of
    # code -1 (which would feed np.bincount a negative and mislabel run
    # endpoints as the lexicographically-last type)
    codes, types = pd.factorize(df[type_col], sort=True,
                                use_na_sentinel=False)
    same = kk[1:] == kk[:-1]
    frm, to = codes[:-1][same], codes[1:][same]
    t = len(types)
    counts = np.bincount(frm * t + to, minlength=t * t).reshape(t, t)
    nz = np.nonzero(counts)
    pairs = pd.DataFrame({"from_type": types[nz[0]], "to_type": types[nz[1]],
                          "n": counts[nz].astype(np.int64)})
    starts = np.flatnonzero(np.concatenate([[True], ~same]))
    ends = np.concatenate([starts[1:], [len(kk)]])
    bounds = pd.DataFrame({"key": kk[starts],
                           "first_type": np.asarray(types)[codes[starts]],
                           "last_type": np.asarray(types)[codes[ends - 1]]})
    return pairs, bounds


def _bridge_transitions(bounds: pd.DataFrame) -> pd.DataFrame:
    """Adjacent same-key runs (already in stream order) contribute one
    bridging transition last_type(i) -> first_type(i+1) each."""
    if len(bounds) < 2:
        return pd.DataFrame(columns=["from_type", "to_type", "n"])
    kk = bounds["key"].to_numpy()
    same = kk[1:] == kk[:-1]
    out = pd.DataFrame({
        "from_type": bounds["last_type"].to_numpy()[:-1][same],
        "to_type": bounds["first_type"].to_numpy()[1:][same],
    })
    return (out.groupby(["from_type", "to_type"], as_index=False)
            .size().rename(columns={"size": "n"}))


def transition_counts(ds, *, key: str, order_cols: list[str],
                      type_col: str) -> pd.DataFrame:
    """Global first-order transition (bigram / Markov) counts over per-key
    event sequences: for each key's rows in (order_cols) order, count
    consecutive (type_i -> type_{i+1}) pairs — the sequence-statistics op
    (SQL lead() OVER (PARTITION BY key ORDER BY ...)). Each sorted batch
    reduces to <= n_types^2 count rows plus one (first, last) row per
    key-run; the driver only ever sees counts and run endpoints, so the
    result volume is O(batches + n_types^2) regardless of data size.
    -> DataFrame[(from_type, to_type, n)] sorted."""
    mats: list[pd.DataFrame] = []
    bound_parts: list[pd.DataFrame] = []

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        pairs, bounds = _transition_partials(df, key, type_col)
        pairs["__kind"] = 0
        bounds = bounds.rename(columns={"key": "from_type",
                                        "first_type": "to_type"})
        bounds["n"] = np.int64(0)
        bounds["__kind"] = 1
        cols = ["from_type", "to_type", "n", "__kind", "last_type"]
        pairs["last_type"] = ""
        bounds["from_type"] = bounds["from_type"].astype(str)
        return pd.concat([pairs[cols], bounds[cols]], ignore_index=True)

    srt = ds.sort([key] + order_cols)
    rows = srt.map_batches(kernel, batch_format="pandas").to_pandas()
    if len(rows) == 0:
        return pd.DataFrame(columns=["from_type", "to_type", "n"])
    mats.append(rows[rows["__kind"] == 0][["from_type", "to_type", "n"]])
    b = rows[rows["__kind"] == 1]
    # boundary rows come back in stream order per input block; Ray preserves
    # block order for map_batches over a sorted dataset, so adjacent rows of
    # one key are adjacent here (same invariant every window op relies on)
    bound_parts.append(pd.DataFrame({
        "key": b["from_type"].to_numpy(),
        "first_type": b["to_type"].to_numpy(),
        "last_type": b["last_type"].to_numpy(),
    }))
    mats.append(_bridge_transitions(pd.concat(bound_parts,
                                              ignore_index=True)))
    out = (pd.concat(mats, ignore_index=True)
           .groupby(["from_type", "to_type"], as_index=False)["n"].sum())
    out["n"] = out["n"].astype(np.int64)
    out = out[out["n"] > 0]
    return (out.sort_values(["from_type", "to_type"], kind="stable")
            .reset_index(drop=True))


def funnel(ds, *, key: str, ts_col: str, type_col: str, steps: tuple,
           driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Ordered multi-step funnel: per key, the number of consecutive steps
    completed where step j+1 must occur at a timestamp >= step j's earliest
    qualifying timestamp (the classic view -> click -> purchase conversion
    chain; DuckDB oracle = chained min-ts CTEs). ``steps`` must be distinct
    event types (an event holds one type, so a single event can never
    satisfy two steps even at equal timestamps, and >= ties are
    order-independent). Same sorted-stream + compact-partial skeleton as
    gap_stats; partials are function tables, so merging is function
    composition and a hot key costs O(batches), never O(rows). COLLECTS
    the full per-key result — use ``funnel_ds`` at unbounded key
    cardinality. -> DataFrame[(key, steps_completed)] sorted by key."""
    out = _collect_pair(*funnel_ds(
        ds, key=key, ts_col=ts_col, type_col=type_col, steps=steps,
        driver_cap=driver_cap))
    out["steps_completed"] = out["steps_completed"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def funnel_ds(ds, *, key: str, ts_col: str, type_col: str, steps: tuple,
              driver_cap: int = 5_000_000):
    """Scale form of ``funnel`` -> ``(interior_ds | None,
    boundary_frame)`` — interior keys' final rows never touch the
    driver."""
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    partials = (
        ds.sort([key, ts_col])
        .map_batches(
            lambda df: _funnel_partials(df, key, ts_col, type_col, steps),
            batch_format="pandas")
        .materialize()
    )
    if partials.count() <= driver_cap:
        return None, _merge_funnel_partials(partials.to_pandas(), k)
    srt2 = partials.sort(["key", "first_ts"]).materialize()

    interior = srt2.map_batches(
        lambda df: _merge_funnel_partials(
            _split_boundary(df, "key", False), k),
        batch_format="pandas",
    )
    boundary = srt2.map_batches(
        lambda df: _split_boundary(df, "key", True),
        batch_format="pandas",
    ).to_pandas()
    return interior, _merge_funnel_partials(boundary, k)


def temperature_sample(ds, *, key: str, order_cols: list[str],
                       driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Sqrt-temperature mixture sampling (the multilingual-corpus
    balancing rule, exponent 0.5 on group counts): each group contributes
    floor(sqrt(count)) rows drawn in (order_cols) order — hot groups are
    damped, rare groups keep proportionally more. Counts come from one
    zero-shuffle combine (group keys are low-card by definition of a
    mixture); the draw is grouped_quota_head. The quota uses IEEE
    floor(sqrt(double)) so the SQL twin's floor(sqrt(count(*))) states the
    bit-identical number."""
    from ..stages.keyed_reduce import combine_low_card

    counts = combine_low_card(ds, [key], {"n": (key, "count")})
    quota = {k: int(np.floor(np.sqrt(float(n))))
             for k, n in zip(counts[key], counts["n"])}
    return grouped_quota_head(ds, key=key, order_cols=order_cols,
                              quota=quota, driver_cap=driver_cap)


def uniform_sample(ds, *, k: int, id_col: str,
                   columns: list[str] | None = None) -> pd.DataFrame:
    """Deterministic UNIFORM k-sample: the rows whose splitmix64-mixed id
    is smallest. The bijective mixer (similarity._mix64) makes the draw
    pseudo-random over ids yet exactly reproducible (and SQL-statable —
    the oracle re-derives the same 64-bit arithmetic with 32-bit-split
    HUGEINT multiplies). Distributed shape: per-batch nsmallest partials
    of k rows each, then one driver nsmallest over #batches*k rows —
    no shuffle, no full collect; the corpus-scale analog of SQL
    ``ORDER BY hash(id) LIMIT k``."""
    from .similarity import _mix64

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[columns].copy() if columns else df.copy()
        out["__h"] = _mix64(df[id_col].to_numpy())
        return out.nsmallest(k, "__h")

    samp = ds.map_batches(part, batch_format="pandas").to_pandas()
    if "__h" not in samp.columns:  # empty dataset: no block ran part()
        return pd.DataFrame(columns=columns or [id_col])
    return (samp.nsmallest(k, "__h").drop(columns="__h")
            .reset_index(drop=True))


def weighted_sample(ds, *, k: int, id_col: str, weight_col: str,
                    columns: list[str] | None = None) -> pd.DataFrame:
    """Deterministic weight-proportional k-sample (Duffield-Lund-Thorup
    priority sampling with a hashed uniform): rank ascending by
    floor(h32 * 2^31 / w) where h32 is the top 32 bits of splitmix64(id)
    and w = max(weight, 1) — heavier rows draw smaller priorities, so
    inclusion probability grows with weight (the domain-reweighting
    sampler of pretraining mixes). All arithmetic is int64-exact (h32 <
    2^32, scale 2^31 — no float ever enters the ordering), ties break on
    id, so the draw is reproducible AND SQL-statable verbatim. Same
    distributed shape as ``uniform_sample``: k-row nsmallest partials per
    batch, one driver nsmallest."""
    from .similarity import _mix64

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[columns].copy() if columns else df.copy()
        h32 = (_mix64(df[id_col].to_numpy())
               >> np.uint64(32)).astype(np.int64)
        wv = df[weight_col].to_numpy()
        if not np.issubdtype(wv.dtype, np.integer):
            raise TypeError(
                f"weighted_sample: {weight_col} must be an integer column "
                f"(got {wv.dtype}); float weights would truncate silently "
                "and NaN would clamp to weight 1 — the int64-exact "
                "ordering contract only holds for integer weights")
        w = np.maximum(wv.astype(np.int64), 1)
        out["__p"] = (h32 * np.int64(1 << 31)) // w
        return out.nsmallest(k, ["__p", id_col])

    samp = ds.map_batches(part, batch_format="pandas").to_pandas()
    if "__p" not in samp.columns:  # empty dataset: no block ran part()
        return pd.DataFrame(columns=columns or [id_col, weight_col])
    return (samp.nsmallest(k, ["__p", id_col]).drop(columns="__p")
            .reset_index(drop=True))


# --- trailing time-range window peak ---------------------------------------

_PWC_COLS = ["key", "interior_peak", "first_ts", "last_ts",
             "head_ts", "head_cnt", "tail_ts"]


def _pack_i64(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a, dtype="<i8").tobytes()


def _unpack_i64(b) -> np.ndarray:
    if b is None or len(b) == 0:
        return np.empty(0, dtype=np.int64)
    return np.frombuffer(b, dtype="<i8")


def _pwc_partials(df: pd.DataFrame, key: str, ts_col: str,
                  window_us: int) -> pd.DataFrame:
    """Per-batch partials for the peak trailing time-window count over a
    (key, ts)-sorted stream. Interior runs (keys that begin and end inside
    the batch) finalize here with a fully vectorized peak; only the batch's
    FIRST and LAST runs — the only keys that can span a block boundary —
    also carry the events within ``window_us`` of the run's head/tail as
    packed int64 microsecond arrays. Carry size is bounded by the key's
    window occupancy (the statistic itself), never its row count.

    Vectorization note: trailing in-run counts use one global searchsorted
    over a monotone surrogate ``ts + run_id*SPAN`` (SPAN > global ts range +
    window), so runs never bleed into each other and there is no per-run
    Python loop."""
    if len(df) == 0:
        return pd.DataFrame({
            "key": pd.Series([], dtype=object),
            "interior_peak": pd.Series([], dtype=np.int64),
            "first_ts": pd.Series([], dtype=np.int64),
            "last_ts": pd.Series([], dtype=np.int64),
            "head_ts": pd.Series([], dtype=object),
            "head_cnt": pd.Series([], dtype=object),
            "tail_ts": pd.Series([], dtype=object),
        })
    kcol = df[key].to_numpy()
    ts = _ts_us(df[ts_col])
    newkey = np.concatenate([[True], kcol[1:] != kcol[:-1]])
    starts = np.flatnonzero(newkey)
    ends = np.concatenate([starts[1:], [len(kcol)]])
    run_id = np.cumsum(newkey) - 1
    # normalize to the batch's min ts so the surrogate stays far from int64
    # overflow: max surrogate = range + nruns*(range+window); with a 10-year
    # range (3e14 us) and 1e4 runs/batch that is ~3e18 < 2^63.
    t0 = ts.min()
    span = np.int64(int(ts.max()) - int(t0) + window_us + 1)
    if int(span) * len(starts) < (1 << 62):
        s = (ts - t0) + run_id * span
        lb = np.searchsorted(s, s - window_us, side="left")
    else:
        # the surrogate would overflow int64 (enormous ts range x many
        # runs in one batch): per-run searchsorted fallback, correct at
        # any scale, just not single-pass
        lb = np.empty(len(ts), dtype=np.int64)
        for a, b in zip(starts, ends):
            lb[a:b] = a + np.searchsorted(ts[a:b], ts[a:b] - window_us,
                                          side="left")
    cnt = np.arange(len(ts)) - lb + 1  # trailing in-run count per row
    peaks = np.maximum.reduceat(cnt, starts).astype(np.int64)
    out = pd.DataFrame({
        "key": kcol[starts],
        "interior_peak": peaks,
        "first_ts": ts[starts].astype(np.int64),
        "last_ts": ts[ends - 1].astype(np.int64),
    })
    out["head_ts"] = b""
    out["head_cnt"] = b""
    out["tail_ts"] = b""
    for ridx in {0, len(starts) - 1}:
        lo, hi = starts[ridx], ends[ridx]
        rts, rcnt = ts[lo:hi], cnt[lo:hi]
        # INCLUSIVE masks: the RANGE frame [a-W, a] is closed on both
        # ends, and a duplicate timestamp can recur across the block
        # boundary, so an anchor in the next block can sit exactly W from
        # a carried event — strict masks drop that event and undercount
        head = rts <= rts[0] + window_us
        tail = rts >= rts[-1] - window_us
        out.at[ridx, "head_ts"] = _pack_i64(rts[head])
        out.at[ridx, "head_cnt"] = _pack_i64(rcnt[head])
        out.at[ridx, "tail_ts"] = _pack_i64(rts[tail])
    return out


def _merge_pwc_partials(frame: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """Merge peak-window partials per key in stream order. The stream is
    (key, ts)-sorted, so (key, first_ts, last_ts) IS stream order — the
    merge re-sorts by it rather than trusting collection order. Keys
    living in a single partial resolve vectorized; spanning keys walk an
    O(#partials) stitch whose state is one window's worth of
    timestamps."""
    if len(frame) == 0:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "peak_cnt": pd.Series([], dtype=np.int64)})
    frame = frame.sort_values(["key", "first_ts", "last_ts"],
                              kind="stable").reset_index(drop=True)
    counts = frame["key"].value_counts()
    singles = counts[counts == 1].index
    one = frame[frame["key"].isin(singles)]
    res_one = pd.DataFrame({
        "key": one["key"].to_numpy(),
        "peak_cnt": one["interior_peak"].to_numpy(dtype=np.int64),
    })
    rows = []
    for key_val, g in frame[~frame["key"].isin(singles)].groupby(
            "key", sort=False):
        ip_a = g["interior_peak"].to_numpy(dtype=np.int64)
        last_a = g["last_ts"].to_numpy(dtype=np.int64)
        hts_l = g["head_ts"].to_list()
        hcnt_l = g["head_cnt"].to_list()
        tail_l = g["tail_ts"].to_list()
        carry = np.empty(0, dtype=np.int64)
        best = 0
        for r in range(len(g)):
            if len(carry):
                h_ts = _unpack_i64(hts_l[r])
                h_cnt = _unpack_i64(hcnt_l[r])
                extra = len(carry) - np.searchsorted(
                    carry, h_ts - window_us, side="left")
                if len(h_ts):
                    best = max(best, int((h_cnt + extra).max()))
            best = max(best, int(ip_a[r]))
            tail = _unpack_i64(tail_l[r])
            carry = np.concatenate(
                [carry[carry >= last_a[r] - window_us], tail])
        rows.append((key_val, best))
    res_multi = pd.DataFrame(rows, columns=["key", "peak_cnt"])
    out = pd.concat([res_one, res_multi], ignore_index=True)
    out["peak_cnt"] = out["peak_cnt"].astype(np.int64)
    return out


def peak_window_count(ds, *, key: str, ts_col: str, window_us: int,
                      driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Per-key PEAK trailing time-range window count — SQL
    ``max(count(*) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    <window> PRECEDING AND CURRENT ROW))`` (peers included, boundary
    inclusive). The burst-rate profiler for event/transcript streams: "what
    is each agent's busiest 4-hour window?".

    Distributed shape: one (key, ts) range sort, one vectorized partial per
    (batch, run) with O(window-occupancy) boundary bytes for at most two
    runs per batch, then the standard interior/boundary dual path — a
    10^9-row hot key ships #batches compact partials, never raw rows.
    Reference ancestor: the per-group ordering checks at
    sample_metadata_validator.py:486-504; semantics from the SQL standard
    RANGE frame. COLLECTS the full per-key result — use
    ``peak_window_count_ds`` at unbounded key cardinality."""
    out = _collect_pair(*peak_window_count_ds(
        ds, key=key, ts_col=ts_col, window_us=window_us,
        driver_cap=driver_cap))
    out["peak_cnt"] = out["peak_cnt"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def peak_window_count_ds(ds, *, key: str, ts_col: str, window_us: int,
                         driver_cap: int = 5_000_000):
    """Scale form of ``peak_window_count`` -> ``(interior_ds | None,
    boundary_frame)`` — interior keys' final rows never touch the
    driver."""
    partials = ds.sort([key, ts_col]).map_batches(
        lambda df: _pwc_partials(df, key, ts_col, window_us),
        batch_format="pandas")
    return _dual_path_merge(
        partials, lambda f: _merge_pwc_partials(f, window_us), driver_cap)


# --- per-key adjacent-equal-pair counts ------------------------------------

def _adjpair_partials(df: pd.DataFrame, key: str, col: str,
                      order_cols: list[str] = ()) -> pd.DataFrame:
    """One compact row per key-run of a (key, order)-sorted batch for the
    per-key adjacent-equal count: in-run count of positions where
    col[i] == col[i+1], plus the run's first/last value for cross-batch
    bridging — the transition-partials discipline specialized to equality,
    with PER-KEY output (transition_counts aggregates globally). Carries
    the first row's order-column snapshot so the merge can restore stream
    order."""
    if len(df) == 0:
        return pd.DataFrame(
            {"key": pd.Series([], dtype=object),
             "n_pairs": pd.Series([], dtype=np.int64),
             "first_v": pd.Series([], dtype=object),
             "last_v": pd.Series([], dtype=object),
             **{f"__ord{i}": pd.Series([], dtype=object)
                for i in range(len(order_cols))}})
    kk = df[key].to_numpy()
    vv = df[col].to_numpy()
    same_key = kk[1:] == kk[:-1]
    # SQL equality semantics: NULL = NULL is not a match
    notna = ~pd.isna(vv)
    eq = (vv[1:] == vv[:-1]) & same_key & notna[1:] & notna[:-1]
    starts = np.flatnonzero(np.concatenate([[True], ~same_key]))
    ends = np.concatenate([starts[1:], [len(kk)]])
    # count of equal-adjacent pairs inside each run
    cum = np.concatenate([[0], np.cumsum(eq)])
    n_pairs = cum[ends - 1] - cum[starts]
    out = pd.DataFrame({
        "key": kk[starts],
        "n_pairs": n_pairs.astype(np.int64),
        "first_v": vv[starts],
        "last_v": vv[ends - 1],
    })
    for i, oc in enumerate(order_cols):
        out[f"__ord{i}"] = df[oc].to_numpy()[starts]
    return out


def _merge_adjpair_partials(frame: pd.DataFrame) -> pd.DataFrame:
    """Sum per-key in-run counts and add one bridge per adjacent same-key
    partial pair where last_v(i) == first_v(i+1). Re-sorts by the
    partials' order snapshots — bridging needs true stream adjacency, not
    collection order."""
    if len(frame) == 0:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "n_pairs": pd.Series([], dtype=np.int64)})
    frame = frame.sort_values(["key", *_ord_cols_of(frame)],
                              kind="stable").reset_index(drop=True)
    kk = frame["key"].to_numpy()
    same = kk[1:] == kk[:-1]
    lv = frame["last_v"].to_numpy()[:-1][same]
    fv = frame["first_v"].to_numpy()[1:][same]
    bridge = (lv == fv) & ~pd.isna(lv) & ~pd.isna(fv)
    base = frame.groupby("key", as_index=False, sort=False)["n_pairs"].sum()
    if bridge.any():
        extra = (pd.Series(kk[1:][same][bridge]).value_counts()
                 .rename_axis("key").reset_index(name="b"))
        base = base.merge(extra, on="key", how="left")
        base["n_pairs"] = (base["n_pairs"]
                           + base["b"].fillna(0).astype(np.int64))
        base = base.drop(columns=["b"])
    base["n_pairs"] = base["n_pairs"].astype(np.int64)
    return base


def adjacent_pair_counts(ds, *, key: str, order_cols: list[str], col: str,
                         driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Per-key count of ADJACENT EQUAL values in the key's own ordering —
    SQL ``count(*) FILTER (col = lag(col) OVER (PARTITION BY key ORDER BY
    order_cols))`` grouped by key. The dialogue-structure rule primitive
    ("same role speaks twice in a row"). One sorted scan, one compact row
    per (batch, run); bridging across batches compares two scalars per
    boundary — a hot key costs O(batches) rows, never raw turns.
    COLLECTS the full per-key result — use ``adjacent_pair_counts_ds`` at
    unbounded key cardinality."""
    out = _collect_pair(*adjacent_pair_counts_ds(
        ds, key=key, order_cols=order_cols, col=col,
        driver_cap=driver_cap))
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def adjacent_pair_counts_ds(ds, *, key: str, order_cols: list[str],
                            col: str, driver_cap: int = 5_000_000):
    """Scale form of ``adjacent_pair_counts`` -> ``(interior_ds | None,
    boundary_frame)`` — interior keys' final rows never touch the
    driver."""
    partials = ds.sort([key] + list(order_cols)).map_batches(
        lambda df: _adjpair_partials(df, key, col, order_cols),
        batch_format="pandas")
    return _dual_path_merge(partials, _merge_adjpair_partials, driver_cap)


# --- per-key maximum run length (RLE / gaps-and-islands) --------------------

_RUN_COLS = ["key", "n", "first_v", "first_run", "last_v", "last_run",
             "interior_max"]


def _runlen_partials(df: pd.DataFrame, key: str, col: str,
                     order_cols: list[str] = ()) -> pd.DataFrame:
    """One compact row per key-run of a (key, order)-sorted batch for the
    per-key longest constant-value streak: the run's total length, its
    leading and trailing streak (value, length), and the max interior
    streak — the run-length-encoding boundary discipline (SQL
    gaps-and-islands). NULL values break streaks (SQL equality)."""
    if len(df) == 0:
        return pd.DataFrame({
            "key": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "first_v": pd.Series([], dtype=object),
            "first_run": pd.Series([], dtype=np.int64),
            "last_v": pd.Series([], dtype=object),
            "last_run": pd.Series([], dtype=np.int64),
            "interior_max": pd.Series([], dtype=np.int64),
            **{f"__ord{i}": pd.Series([], dtype=object)
               for i in range(len(order_cols))},
        })
    kk = df[key].to_numpy()
    vv = df[col].to_numpy()
    notna = ~pd.isna(vv)
    same_key = kk[1:] == kk[:-1]
    cont = (vv[1:] == vv[:-1]) & same_key & notna[1:] & notna[:-1]
    # streak ids: increment whenever continuity breaks. Streak boundaries
    # are a superset of key boundaries (continuity requires same_key), so
    # per-key streak ranges slice exactly — all fully vectorized below.
    sid = np.concatenate([[0], np.cumsum(~cont)])
    streak_starts = np.flatnonzero(np.concatenate([[True], ~cont]))
    streak_lens = np.diff(np.concatenate([streak_starts, [len(kk)]]))
    key_starts = np.flatnonzero(np.concatenate([[True], ~same_key]))
    key_ends = np.concatenate([key_starts[1:], [len(kk)]])
    s0 = sid[key_starts]   # first streak id of each key-run
    s1 = sid[key_ends - 1]  # last streak id of each key-run
    # interior max: zero the first/last streak of every key, then a
    # reduceat over [s0(i), s0(i+1)) — the next key's first streak starts
    # at s1(i)+1, so each segment covers exactly one key's streaks
    lens2 = streak_lens.copy()
    lens2[s0] = 0
    lens2[s1] = 0
    interior = np.maximum.reduceat(lens2, s0) if len(s0) else np.array(
        [], dtype=np.int64)
    out = pd.DataFrame({
        "key": kk[key_starts],
        "n": (key_ends - key_starts).astype(np.int64),
        "first_v": vv[key_starts],
        "first_run": streak_lens[s0].astype(np.int64),
        "last_v": vv[key_ends - 1],
        "last_run": streak_lens[s1].astype(np.int64),
        "interior_max": interior.astype(np.int64),
    })
    for i, oc in enumerate(order_cols):
        out[f"__ord{i}"] = df[oc].to_numpy()[key_starts]
    return out


def _merge_runlen_partials(frame: pd.DataFrame) -> pd.DataFrame:
    """Merge run-length partials per key in stream order (restored from the
    partials' order snapshots, never collection order): a trailing streak
    chains into the next partial's leading streak iff the values match
    (non-null); a partial that is one single streak chains through."""
    if len(frame) == 0:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "max_run": pd.Series([], dtype=np.int64)})
    frame = frame.sort_values(["key", *_ord_cols_of(frame)],
                              kind="stable").reset_index(drop=True)
    counts = frame["key"].value_counts()
    singles = counts[counts == 1].index
    one = frame[frame["key"].isin(singles)]
    res_one = pd.DataFrame({
        "key": one["key"].to_numpy(),
        "max_run": np.maximum(
            np.maximum(one["first_run"].to_numpy(np.int64),
                       one["last_run"].to_numpy(np.int64)),
            one["interior_max"].to_numpy(np.int64)),
    })
    rows = []
    for key_val, g in frame[~frame["key"].isin(singles)].groupby(
            "key", sort=False):
        n_a = g["n"].to_numpy(dtype=np.int64)
        fr_a = g["first_run"].to_numpy(dtype=np.int64)
        lr_a = g["last_run"].to_numpy(dtype=np.int64)
        im_a = g["interior_max"].to_numpy(dtype=np.int64)
        fv_l = g["first_v"].to_list()
        lv_l = g["last_v"].to_list()
        best = 0
        carry_v, carry_len = None, 0
        for r in range(len(g)):
            n, fv, fr = int(n_a[r]), fv_l[r], int(fr_a[r])
            chains = (carry_len > 0 and not pd.isna(carry_v)
                      and not pd.isna(fv) and carry_v == fv)
            if fr == n:  # whole partial is one streak
                if chains:
                    carry_len += n
                else:
                    best = max(best, carry_len)
                    carry_v, carry_len = fv, n
            else:
                head = carry_len + fr if chains else max(carry_len, fr)
                best = max(best, head, int(im_a[r]))
                carry_v, carry_len = lv_l[r], int(lr_a[r])
        best = max(best, carry_len)
        rows.append((key_val, best))
    res_multi = pd.DataFrame(rows, columns=["key", "max_run"])
    out = pd.concat([res_one, res_multi], ignore_index=True)
    out["max_run"] = out["max_run"].astype(np.int64)
    return out


def max_run_length(ds, *, key: str, order_cols: list[str], col: str,
                   driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Per-key LONGEST CONSTANT-VALUE STREAK in the key's own ordering —
    the gaps-and-islands maximum (SQL: row_number diff islands, max
    count). Dialogue use: longest uninterrupted same-role burst per
    conversation. One sorted scan; each (batch, run) reduces to a 7-field
    partial; the stitch chains trailing/leading streaks on value equality
    — a hot key costs O(batches) rows, never raw turns. COLLECTS the full
    per-key result — use ``max_run_length_ds`` at unbounded key
    cardinality."""
    out = _collect_pair(*max_run_length_ds(
        ds, key=key, order_cols=order_cols, col=col,
        driver_cap=driver_cap))
    out["max_run"] = out["max_run"].astype(np.int64)
    return out.sort_values("key", kind="stable").reset_index(drop=True)


def max_run_length_ds(ds, *, key: str, order_cols: list[str], col: str,
                      driver_cap: int = 5_000_000):
    """Scale form of ``max_run_length`` -> ``(interior_ds | None,
    boundary_frame)`` — interior keys' final rows never touch the
    driver."""
    partials = ds.sort([key] + list(order_cols)).map_batches(
        lambda df: _runlen_partials(df, key, col, order_cols),
        batch_format="pandas")
    return _dual_path_merge(partials, _merge_runlen_partials, driver_cap)

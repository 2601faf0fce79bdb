"""Generic table-profiling operators: unit extraction / mixed-units,
grouped-nunique confounding, naming-variant normalization, and per-column
matrix-style statistics.

Reference ancestors (all single-process pandas in the reference, re-expressed
as partial-per-batch map_batches + tiny driver combines — the key domains
here are SMALL (units, group keys, column names), so no shuffle is needed
beyond the vectorized keyed reduce):

- unit extraction + invalid-unit vocab + mixed units in one column
  (sample_metadata_validator.py:366-442)
- batch <-> condition confounding via groupby(batch)[cond].nunique()
  (sample_metadata_validator.py:486-504)
- organism naming variants (human / Homo sapiens / HUMAN ...) detected over
  distinct values (sample_metadata_validator.py:221-268)
- all-zero / constant / all-NaN / negative column checks
  (matrix_validator.py:351-440, 567-586, 632-659)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.keyed_reduce import combine_low_card, keyed_reduce_pandas


def extract_value_counts(ds, column: str, pattern: str,
                         out: str = "unit") -> pd.DataFrame:
    """Vectorized regex extraction + count-by-extracted-value.
    ``pattern`` must contain one capture group. -> DataFrame[(out, n)],
    missing/no-match rows counted under None."""
    import pyarrow as pa
    import pyarrow.compute as pc

    miss = "\x00__miss__"  # combine_low_card's pandas groupby drops null
    # keys, so no-match/missing rows travel under a sentinel and map back

    def ex(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[column], pattern=pattern.replace(
            "(", "(?P<u>", 1) if "(?P<" not in pattern else pattern)
        unit = pc.struct_field(m, "u")
        return pa.table({out: pc.fill_null(unit, miss)})

    res = combine_low_card(
        ds.map_batches(ex, batch_format="pyarrow"),
        [out], {"n": (out, "count")},
    )
    if len(res):
        res[out] = res[out].where(res[out] != miss, None)
    return res


def mixed_units_check(ds, column: str, pattern: str,
                      allowed: set[str] | None = None) -> dict:
    """Mixed-units rule (sample_metadata_validator.py:366-442): extract the
    unit token from every value; ERROR-worthy when more than one distinct
    unit appears; also reports units outside ``allowed``."""
    counts = extract_value_counts(ds, column, pattern)
    units = sorted(u for u in counts["unit"] if u is not None and u == u)
    invalid = sorted(set(units) - allowed) if allowed is not None else []
    return {
        "units": units,
        "mixed": len(units) > 1,
        "invalid_units": invalid,
        "counts": dict(zip(counts["unit"], counts["n"].astype(int))),
    }


def grouped_nunique(ds, key: str, of: str, *,
                    driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Exact per-key distinct-count of ``of`` plus the per-key row count
    -> DataFrame[(key, n_rows, nunique)] (one row per key).

    Distributed end-to-end at high key cardinality: stage 1 reduces to the
    distinct (key, of) pairs; stage 2 reduces the pair STREAM per key — when
    the pair volume exceeds ``driver_cap`` both stages stay Datasets
    (keyed_reduce interior path) and the driver collects only the final
    O(#keys) rows, never the O(#distinct-pairs) frame. Below the cap the
    pairs collect once and combine in pandas (zero extra exchanges)."""
    from ..stages.keyed_reduce import keyed_reduce, make_partial

    pair_spec = {"c": (of, "count")}
    partials = ds.map_batches(
        make_partial([key, of], pair_spec), batch_format="pandas"
    ).materialize()
    if partials.count() <= driver_cap:
        pairs = keyed_reduce_pandas(partials, [key, of], pair_spec,
                                    partial_applied=True,
                                    driver_cap=driver_cap)
        out = pairs.groupby(key, as_index=False).agg(
            n_rows=("c", "sum"), nunique=("c", "size")
        )
    else:
        import ray.data as rd

        interior, boundary = keyed_reduce(partials, [key, of], pair_spec,
                                          partial_applied=True)
        pairs_ds = interior
        if len(boundary):
            pairs_ds = pairs_ds.union(rd.from_pandas(boundary))
        # each distinct pair appears exactly once in the unioned stream, so
        # per-key sum(c) / count(pairs) are exact mergeable partials
        out = keyed_reduce_pandas(
            pairs_ds, [key],
            {"n_rows": ("c", "sum"), "nunique": ("c", "count")},
            driver_cap=driver_cap,
        )
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["nunique"] = out["nunique"].astype(np.int64)
    return out.sort_values(key, kind="stable").reset_index(drop=True)


def confounding_check(ds, batch_col: str, cond_col: str, *,
                      driver_cap: int = 5_000_000) -> dict:
    """batch <-> condition confounding (sample_metadata_validator.py:486-504):
    flag when every multi-row batch carries exactly one condition value
    (batch perfectly predicts condition)."""
    g = grouped_nunique(ds, batch_col, cond_col, driver_cap=driver_cap)
    multi = g[g["n_rows"] >= 2]
    n_conf = int((multi["nunique"] == 1).sum())
    return {
        "n_batches": int(len(g)),
        "n_multi_row_batches": int(len(multi)),
        "n_confounded": n_conf,
        "confounded": len(multi) > 1 and n_conf == len(multi),
    }


def variant_groups(ds, column: str,
                   synonyms: dict[str, str] | None = None) -> pd.DataFrame:
    """Naming-variant detection (sample_metadata_validator.py:221-268):
    distinct raw values grouped by a canonical key (lowercased, stripped,
    synonym-mapped); groups with more than one raw spelling are
    normalization candidates. -> DataFrame[(canonical, n_variants, n_rows)]
    for groups with >= 2 variants."""
    counts = keyed_reduce_pandas(ds, [column], {"n": (column, "count")})
    raw = counts[column].astype(str)
    canon = raw.str.strip().str.lower()
    if synonyms:
        canon = canon.map(lambda v: synonyms.get(v, v))
    counts = counts.assign(canonical=canon)
    g = counts.groupby("canonical", as_index=False).agg(
        n_variants=(column, "nunique"), n_rows=("n", "sum")
    )
    out = g[g["n_variants"] > 1].reset_index(drop=True)
    out["n_variants"] = out["n_variants"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out


def histogram_fixed(ds, column: str, edges, by: list[str] | None = None
                    ) -> pd.DataFrame:
    """Exact fixed-edge histogram counts, optionally per group —
    the deterministic building block under drift scoring (drift.py's PSI
    bins come from t-digest cdfs, which are approximate by design; this is
    the exact-count twin, SQL-statable as a sum of threshold indicators).

    Bin index of value v = #edges <= v (0 = below the first edge). Null
    values are dropped (state WHERE column IS NOT NULL in the oracle).
    -> DataFrame[(by..., bin, n)] sorted by keys."""
    bys = list(by or [])
    edges_arr = np.asarray(edges, dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[column])
        b = np.searchsorted(edges_arr, df[column].to_numpy(dtype=np.float64),
                            side="right")
        g = pd.DataFrame({**{k: df[k].to_numpy() for k in bys},
                          "bin": b.astype(np.int64)})
        return g.groupby(bys + ["bin"], as_index=False).size().rename(
            columns={"size": "n"})

    out = combine_low_card(
        ds.map_batches(partial, batch_format="pandas"),
        bys + ["bin"], {"n": ("n", "sum")},
    )
    out["bin"] = out["bin"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(bys + ["bin"]).reset_index(drop=True)


def column_pair_stats(ds, cols: dict[str, int]) -> pd.DataFrame:
    """Exact pairwise second-moment sums for column-pair correlation
    (matrix_validator.py:588-610's duplicate-sample r > 0.99 check, which
    the reference caps at 100 columns; here one streaming pass over integer-
    scaled values — no cap needed at this, the per-COLUMN-pair, scale).

    ``cols`` maps column -> integer scale (value := round(x * scale) as
    int64, e.g. 100 for cents); integer sums make the operator exactly
    SQL-statable (hash-green oracle) where float accumulation would drift.
    -> DataFrame[(col_a, col_b, n, sum_a, sum_b, sum_ab, sum_a2, sum_b2)],
    one row per unordered pair, rows with a null in either column dropped
    (pairwise-complete, matching pandas/DuckDB corr semantics).
    Scales must keep sum(a*b) inside int64 (caller's contract).
    Use ``pearson_of_pair_stats`` to turn the sums into r."""
    import pyarrow as pa
    import pyarrow.compute as pc

    names = sorted(cols)
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    def partial(t: pa.Table) -> pa.Table:
        ints = {}
        for c in names:
            # half-away-from-zero to match SQL round() — numpy/Arrow default
            # half-to-even diverges from DuckDB exactly at representable .5
            # ties (e.g. integer-dollar rounding of a *.50 price)
            v = pc.round(pc.multiply(t[c].cast(pa.float64()),
                                     float(cols[c])),
                         round_mode="half_towards_infinity")
            ints[c] = v  # keep float for null handling; cast per pair below
        rows = {"col_a": [], "col_b": [], "n": [], "sum_a": [], "sum_b": [],
                "sum_ab": [], "sum_a2": [], "sum_b2": []}
        for a, b in pairs:
            va, vb = ints[a], ints[b]
            ok = pc.and_(pc.is_valid(va), pc.is_valid(vb))
            xa = pc.filter(va, ok).to_numpy(zero_copy_only=False).astype(np.int64)
            xb = pc.filter(vb, ok).to_numpy(zero_copy_only=False).astype(np.int64)
            rows["col_a"].append(a)
            rows["col_b"].append(b)
            rows["n"].append(int(xa.size))
            rows["sum_a"].append(int(xa.sum()))
            rows["sum_b"].append(int(xb.sum()))
            rows["sum_ab"].append(int(np.dot(xa, xb)))
            rows["sum_a2"].append(int(np.dot(xa, xa)))
            rows["sum_b2"].append(int(np.dot(xb, xb)))
        return pa.table(rows)

    out = combine_low_card(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["col_a", "col_b"],
        {k: (k, "sum") for k in
         ("n", "sum_a", "sum_b", "sum_ab", "sum_a2", "sum_b2")},
    )
    for c in ("n", "sum_a", "sum_b", "sum_ab", "sum_a2", "sum_b2"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["col_a", "col_b"]).reset_index(drop=True)


def pearson_of_pair_stats(stats: pd.DataFrame,
                          dup_threshold: float = 0.99) -> pd.DataFrame:
    """Pearson r per column pair from the exact sums, plus the reference's
    possible-duplicate flag (r > threshold, matrix_validator.py:600-607)."""
    n = stats["n"].to_numpy(dtype=np.float64)
    sa, sb = stats["sum_a"].astype(float), stats["sum_b"].astype(float)
    cov = stats["sum_ab"].astype(float) - sa * sb / np.maximum(n, 1)
    va = stats["sum_a2"].astype(float) - sa * sa / np.maximum(n, 1)
    vb = stats["sum_b2"].astype(float) - sb * sb / np.maximum(n, 1)
    denom = np.sqrt(va * vb)
    out = stats[["col_a", "col_b", "n"]].copy()
    out["r"] = np.where(denom > 0, cov / np.where(denom > 0, denom, 1.0),
                        np.nan)
    out["possible_duplicate"] = out["r"] > dup_threshold
    return out


def column_profile(ds, cols: list[str], *,
                   low_var_threshold: float = 0.01,
                   mean_outlier_sigma: float = 3.0) -> pd.DataFrame:
    """Per-column matrix-style checks in ONE pass (matrix_validator.py
    family: all-zero :410-424, constant :426-440, low-variance :567-586,
    sample-mean outliers :632-659, all-NaN/negative/infinite :351-408):
    counts plus constancy (min == max), low-variance (population var below
    threshold), and mean-outlier (column mean beyond ``sigma`` std devs of
    the across-column means, computed only when >= 3 columns report a mean).
    -> DataFrame[(column, n, n_null, n_zero, n_negative, n_inf, constant,
    all_null, low_variance, mean_outlier)]."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "n_null": [], "n_zero": [],
                "n_negative": [], "n_inf": [], "vmin": [], "vmax": [],
                "vsum": [], "vsumsq": []}
        for c in cols:
            col = t[c]
            valid = pc.drop_null(col)
            fv = valid.cast(pa.float64())
            rows["column"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            rows["n_zero"].append(
                int(pc.sum(pc.equal(fv, 0.0)).as_py() or 0))
            rows["n_negative"].append(
                int(pc.sum(pc.less(fv, 0.0)).as_py() or 0))
            rows["n_inf"].append(
                int(pc.sum(pc.is_inf(fv)).as_py() or 0))
            mn = pc.min(fv).as_py()
            mx = pc.max(fv).as_py()
            rows["vmin"].append(np.inf if mn is None else mn)
            rows["vmax"].append(-np.inf if mx is None else mx)
            rows["vsum"].append(float(pc.sum(fv).as_py() or 0.0))
            npv = fv.to_numpy(zero_copy_only=False)
            rows["vsumsq"].append(float(np.dot(npv, npv)))
        return pa.table(rows)

    parts = combine_low_card(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["column"],
        {"n": ("n", "sum"), "n_null": ("n_null", "sum"),
         "n_zero": ("n_zero", "sum"), "n_negative": ("n_negative", "sum"),
         "n_inf": ("n_inf", "sum"),
         "vmin": ("vmin", "min"), "vmax": ("vmax", "max"),
         "vsum": ("vsum", "sum"), "vsumsq": ("vsumsq", "sum")},
    )
    parts["all_null"] = parts["n_null"] == parts["n"]
    parts["constant"] = (~parts["all_null"]) & (parts["vmin"] == parts["vmax"])
    nv = (parts["n"] - parts["n_null"]).clip(lower=1)
    mean = parts["vsum"] / nv
    var = (parts["vsumsq"] / nv - mean**2).clip(lower=0.0)
    parts["low_variance"] = (~parts["all_null"]) & (var < low_var_threshold)
    means = mean[~parts["all_null"]]
    if len(means) >= 3 and means.std() > 0:
        z = (mean - means.mean()).abs() / means.std()
        parts["mean_outlier"] = (~parts["all_null"]) & (z > mean_outlier_sigma)
    else:
        parts["mean_outlier"] = False
    for c in ("n", "n_null", "n_zero", "n_negative", "n_inf"):
        parts[c] = parts[c].astype(np.int64)
    return (
        parts.drop(columns=["vmin", "vmax", "vsum", "vsumsq"])
        .sort_values("column")
        .reset_index(drop=True)
    )


def grouped_zscore_outliers(ds, keys: list[str], value_col: str, *,
                            k: int = 2, derive=None) -> pd.DataFrame:
    """Per-GROUP |x - mu| > k*sigma outlier counts, exactly, via the
    broadcast-stats two-pass shape (the per-group twin of statstage's
    global outlier rule, reference matrix_validator.py:567-586 which holds
    the whole matrix in memory):

      pass 1: combine_low_card -> per-group integer (n, s1=sum v,
              s2=sum v^2); per-batch partials stay int64 (bounded values),
              the driver merge is exact.
      pass 2: the driver turns each group's moments into an INTEGER
              threshold with arbitrary-precision math (population sigma:
              (n*sigma)^2 = n*s2 - s1^2, outlier <=> |n*v - s1| >
              isqrt(k^2 * (n*s2 - s1^2)), exact for integers at ANY n —
              no float sigma, no int64 overflow in the comparison), ships
              the tiny {group: (n, s1, bound)} map in the task closure,
              and one more map_batches counts per-group hits.

    ``value_col`` must be (or ``derive`` must produce) an int64 column.
    Returns DataFrame[keys..., n_rows, n_outliers] sorted by keys. The SQL
    twin states the squared comparison over HUGEINT; both sides evaluate
    the same integer predicate.

    Exactness bound: the s2 accumulation is int64, so a group needs
    n * max(v)^2 < 2^63 (e.g. 9e10 rows at |v| <= 1e4). For hotter
    magnitudes, pre-shift ``v`` toward the group's rough center in
    ``derive`` (shrinks v^2 by orders of magnitude without changing
    |x - mu| or sigma).
    """
    from math import isqrt

    if derive is not None:
        ds = ds.map_batches(derive, batch_format="pandas")
    stats = combine_low_card(
        ds.map_batches(
            lambda df: df.assign(
                __v=df[value_col].to_numpy(dtype=np.int64),
                __v2=df[value_col].to_numpy(dtype=np.int64) ** 2),
            batch_format="pandas"),
        keys, {"n": (value_col, "count"), "s1": ("__v", "sum"),
               "s2": ("__v2", "sum")},
    )
    bounds: dict = {}
    for row in stats.itertuples(index=False):
        key = tuple(getattr(row, c) for c in keys)
        n, s1, s2 = int(row.n), int(row.s1), int(row.s2)
        bounds[key] = (n, s1, isqrt(k * k * (n * s2 - s1 * s1)))

    def count_hits(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=keys + ["n_outliers"])
        v = df[value_col].to_numpy(dtype=np.int64)
        out_rows = []
        for key, g in df.groupby(keys, sort=False).indices.items():
            kt = key if isinstance(key, tuple) else (key,)
            n, s1, bound = bounds[kt]
            dev = np.abs(n * v[g] - s1)
            out_rows.append(kt + (np.int64((dev > bound).sum()),))
        return pd.DataFrame(out_rows, columns=keys + ["n_outliers"])

    hits = combine_low_card(
        ds.map_batches(count_hits, batch_format="pandas"),
        keys, {"n_outliers": ("n_outliers", "sum")},
        # partial already emits one row per (batch, group)
    )
    out = stats[keys + ["n"]].rename(columns={"n": "n_rows"}).merge(
        hits, on=keys, how="left")
    out["n_outliers"] = out["n_outliers"].fillna(0).astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.sort_values(keys, kind="stable").reset_index(drop=True)


def cdf_quantiles(ds, value_col: str, qs: list[float],
                  *, distinct_cap: int = 2_000_000) -> list[int]:
    """EXACT global quantiles of a bounded-cardinality integer column in
    ONE pass and NO sort: each batch collapses to (value, count) partials,
    a keyed reduce merges them into the value CDF, and every requested
    quantile reads off the cumulative table at rank max(1, ceil(q*n)) —
    percentile_disc semantics for any number of qs at once. The scalable
    multi-quantile path whenever distinct values are bounded (cents,
    lengths, codes): the shuffle moves at most #distinct rows, vs a full
    range sort per quantile. Raises if the distinct count exceeds
    ``distinct_cap`` (then the t-digest sketch or the sorted-stream
    percentile operator is the right tool)."""
    import numpy as np
    import pandas as pd

    from ..stages.keyed_reduce import keyed_reduce_pandas

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[value_col].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(np.int64),
                             "c": vc.to_numpy(np.int64)})

    cdf = keyed_reduce_pandas(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], {"c": ("c", "sum")}, partial_applied=True)
    if len(cdf) > distinct_cap:
        raise ValueError(
            f"cdf_quantiles: {len(cdf)} distinct values exceeds "
            f"distinct_cap={distinct_cap}; use a digest or the sorted "
            f"percentile operator")
    if len(cdf) == 0:
        raise ValueError("cdf_quantiles: empty input")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"cdf_quantiles: qs must be in [0, 1], got {qs}")
    cdf = cdf.sort_values("v").reset_index(drop=True)
    cum = cdf["c"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        out.append(int(cdf["v"].iloc[int(np.searchsorted(cum, rank))]))
    return out

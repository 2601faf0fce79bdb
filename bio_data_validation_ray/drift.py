"""Distribution drift scoring: KS statistic + Population Stability Index
over t-digest histograms, per partition vs a stored baseline digest.

New capability per BASELINE.json north_star (the reference's nearest
ancestors are the skewness rule rule_validator.py:394-405 and the
median-centering check validate_depmap.py:66-74). Standard public formulas:

  KS  = max_x |CDF_part(x) - CDF_base(x)|        (evaluated on merged support)
  PSI = sum_i (p_i - b_i) * ln(p_i / b_i)        (deciles of the baseline)

Both are computed purely from the mergeable t-digests produced in the single
validation pass — no second scan of the data.
"""

from __future__ import annotations

import json

import numpy as np

from .sketches import TDigest

PSI_EPS = 1e-6


def ks_statistic(part: TDigest, base: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS distance from two digests, evaluated on a
    merged quantile grid of both supports."""
    if part.total_weight == 0 or base.total_weight == 0:
        return float("nan")
    qs = np.linspace(0.0, 1.0, n_points)
    xs = np.unique(
        np.concatenate([[part.quantile(q) for q in qs], [base.quantile(q) for q in qs]])
    )
    diffs = [abs(part.cdf(x) - base.cdf(x)) for x in xs]
    return float(max(diffs))


def psi(part: TDigest, base: TDigest, n_bins: int = 10) -> float:
    """Population Stability Index over the baseline's decile bins."""
    if part.total_weight == 0 or base.total_weight == 0:
        return float("nan")
    edges = [base.quantile(q) for q in np.linspace(0.0, 1.0, n_bins + 1)]
    edges[0] -= 1e-9
    edges[-1] += 1e-9
    edges = np.array(edges)
    b = np.clip(base.histogram(edges), PSI_EPS, None)
    p = np.clip(part.histogram(edges), PSI_EPS, None)
    b = b / b.sum()
    p = p / p.sum()
    return float(np.sum((p - b) * np.log(p / b)))


def psi_from_counts(part_counts: np.ndarray, base_counts: np.ndarray) -> float:
    """EXACT PSI from integer bin counts at shared fixed edges — the
    deterministic twin of the digest-based ``psi`` (pair with
    functions/profile.histogram_fixed, whose per-group counts are
    hash-oracle-checked; use when the bin edges are known up front and
    exactness matters more than the single-pass digest)."""
    p = np.asarray(part_counts, dtype=np.float64)
    b = np.asarray(base_counts, dtype=np.float64)
    if p.sum() == 0 or b.sum() == 0:
        return float("nan")
    p = np.clip(p / p.sum(), PSI_EPS, None)
    b = np.clip(b / b.sum(), PSI_EPS, None)
    return float(np.sum((p - b) * np.log(p / b)))


def score_partitions_exact(shard_hist, baseline_hist: np.ndarray, *,
                           psi_threshold: float = 0.2) -> dict[str, dict]:
    """Per-partition drift verdicts from EXACT fixed-edge histograms:
    ``shard_hist`` maps shard -> bin-count vector (same edges as
    ``baseline_hist``)."""
    out = {}
    for shard, counts in shard_hist.items():
        v = psi_from_counts(counts, baseline_hist)
        out[shard] = {"psi": round(v, 6),
                      "drifted": bool(v > psi_threshold)}
    return out


def build_baseline(input_dir: str, *, text_col: str = "text") -> str:
    """Build the drift-baseline digest artifact from a CLEAN reference
    directory of transcript Parquet shards: distributed per-batch t-digest
    partials over utf8_length(text), merged driver-side (one partial per
    batch — no shuffle), serialized with ``baseline_to_json``. Feed the
    result to ``validate_dir(baseline_json=...)`` / CLI ``--baseline``."""
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .sketches import dumps as _dumps
    from .sketches import loads as _loads

    files = sorted(_glob.glob(os.path.join(input_dir, "*.parquet")))

    def part(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t[text_col]).to_numpy(
            zero_copy_only=False).astype(float)
        return pa.table({"payload": pa.array([_dumps(TDigest().add_array(lens))],
                                             type=pa.binary())})

    payloads = (
        rd.read_parquet(files, columns=[text_col])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()["payload"]
    )
    merged = TDigest()
    for p in payloads:
        merged.merge(_loads(p))
    return baseline_to_json({"text_len": merged})


def per_shard_digests(input_dir: str, *, text_col: str = "text"
                      ) -> dict[str, TDigest]:
    """Distributed per-shard text-length digests: one partial per (shard,
    batch) emitted from map_batches, merged per shard driver-side (same
    shape as the flagship sketch stream) — no serial per-file re-read."""
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .sketches import dumps as _dumps
    from .sketches import loads as _loads

    files = sorted(_glob.glob(os.path.join(input_dir, "*.parquet")))

    def part(t: pa.Table) -> pa.Table:
        enc = t["path"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        shards = [os.path.basename(p) for p in enc.dictionary.to_pylist()]
        lens = pc.utf8_length(t[text_col]).to_numpy(
            zero_copy_only=False).astype(float)
        rows_s, rows_p = [], []
        for c, shard in enumerate(shards):
            sub = lens[codes == c]
            if sub.size:
                rows_s.append(shard)
                rows_p.append(_dumps(TDigest().add_array(sub)))
        return pa.table({"shard": pa.array(rows_s, type=pa.string()),
                         "payload": pa.array(rows_p, type=pa.binary())})

    parts = (
        rd.read_parquet(files, columns=[text_col], include_paths=True)
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    out: dict[str, TDigest] = {}
    for shard, payload in zip(parts["shard"], parts["payload"]):
        out.setdefault(shard, TDigest()).merge(_loads(payload))
    return out


def baseline_to_json(digests: dict[str, TDigest]) -> str:
    """Serialize named baseline digests (centroid means+weights) to JSON —
    the FIXTURES.md §2 baseline_digests artifact."""
    out = {}
    for name, td in digests.items():
        td._compress()
        out[name] = {
            "compression": td.compression,
            "means": [float(x) for x in td.means],
            "weights": [float(x) for x in td.weights],
        }
    return json.dumps(out)


def baseline_from_json(s: str) -> dict[str, TDigest]:
    raw = json.loads(s)
    out = {}
    for name, d in raw.items():
        td = TDigest(compression=d["compression"])
        td.means = np.asarray(d["means"], dtype=float)
        td.weights = np.asarray(d["weights"], dtype=float)
        out[name] = td
    return out


def score_partitions(
    per_shard_digests: dict[str, TDigest],
    baseline: TDigest,
    *,
    ks_threshold: float = 0.2,
    psi_threshold: float = 0.2,
) -> dict[str, dict]:
    """Per-partition drift verdicts vs the baseline digest."""
    out = {}
    for shard, td in per_shard_digests.items():
        if shard == "__all__":
            continue
        k, p = ks_statistic(td, baseline), psi(td, baseline)
        if not (np.isfinite(k) and np.isfinite(p)):
            # empty digest (e.g. an all-null column): there is NO signal —
            # say so explicitly instead of a confident 'not drifted', and
            # keep the report JSON-valid (NaN is not JSON)
            out[shard] = {"ks": None, "psi": None, "drifted": False,
                          "insufficient_data": True}
            continue
        out[shard] = {
            "ks": round(k, 6),
            "psi": round(p, 6),
            "drifted": bool(k > ks_threshold or p > psi_threshold),
        }
    return out

"""Sketch-partial reduction + aggregate (dataset-level) rules.

rowstage.py emits one serialized sketch per (shard, batch); there are
O(#batches) of them, so the reduce is tiny and runs driver-side (the partials
stream through the same single pass as everything else — no extra scan).

Aggregate rules evaluated here (reference ancestors):
- missing_rate   BIAS_002  rule_validator.py:376-388
- class_balance  BIAS_001  rule_validator.py:336-352
- drift (KS/PSI) new per north_star; skew ancestor rule_validator.py:394-405
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import pandas as pd

from ..registry import RuleRegistry
from ..sketches import HLL, Moments, TDigest, loads


@dataclass
class ShardStats:
    moments: Moments = field(default_factory=Moments)
    tdigest: TDigest = field(default_factory=TDigest)
    hll: HLL = field(default_factory=HLL)
    role_counts: dict = field(default_factory=dict)
    null_counts: dict = field(default_factory=dict)  # col -> [nulls, total]
    content_hash_sum: int = 0
    content_rows: int = 0

    def merge_payload(self, name: str, payload: bytes) -> None:
        if name == "text_len_moments":
            self.moments.merge(loads(payload))
        elif name == "text_len_tdigest":
            self.tdigest.merge(loads(payload))
        elif name == "hll_conv":
            self.hll.merge(loads(payload))
        elif name == "role_counts":
            for k, v in pickle.loads(payload).items():
                self.role_counts[k] = self.role_counts.get(k, 0) + int(v)
        elif name == "null_counts":
            for c, (nulls, total) in pickle.loads(payload).items():
                cur = self.null_counts.setdefault(c, [0, 0])
                cur[0] += int(nulls)
                cur[1] += int(total)
        elif name == "content_hash":
            s, n = pickle.loads(payload)
            self.content_hash_sum = (self.content_hash_sum + s) % (1 << 64)
            self.content_rows += n

    def merge(self, o: "ShardStats") -> "ShardStats":
        self.moments.merge(o.moments)
        self.tdigest.merge(o.tdigest)
        self.hll.merge(o.hll)
        for k, v in o.role_counts.items():
            self.role_counts[k] = self.role_counts.get(k, 0) + v
        for c, (a, b) in o.null_counts.items():
            cur = self.null_counts.setdefault(c, [0, 0])
            cur[0] += a
            cur[1] += b
        self.content_hash_sum = (self.content_hash_sum + o.content_hash_sum) % (1 << 64)
        self.content_rows += o.content_rows
        return self

    def summary(self) -> dict:
        m = self.moments
        return {
            "rows": int(self.content_rows),
            "distinct_convs_hll": round(self.hll.estimate(), 1),
            "text_len": {
                "n": m.n, "mean": m.mean, "std": m.std,
                "skew_adjusted": m.skewness_adjusted,
                "min": m.min, "max": m.max,
                "p50": self.tdigest.quantile(0.5),
                "p95": self.tdigest.quantile(0.95),
            },
            "role_counts": dict(sorted(self.role_counts.items())),
            "null_fractions": {
                c: (n / t if t else 0.0) for c, (n, t) in sorted(self.null_counts.items())
            },
            "content_hash_sum": self.content_hash_sum,
        }


def reduce_sketches(sketch_rows: pd.DataFrame) -> dict[str, ShardStats]:
    """Merge sketch-partial rows (columns: shard, sketch_name, payload) into
    one ShardStats per shard; key "__all__" holds the global merge."""
    per_shard: dict[str, ShardStats] = {}
    for shard, name, payload in zip(
        sketch_rows["shard"], sketch_rows["sketch_name"], sketch_rows["payload"]
    ):
        per_shard.setdefault(shard, ShardStats()).merge_payload(name, payload)
    allstats = ShardStats()
    for s in per_shard.values():
        allstats.merge(s)
    per_shard["__all__"] = allstats
    return per_shard


def agg_violations(
    stats: dict[str, ShardStats], registry: RuleRegistry
) -> pd.DataFrame:
    """Dataset-level violation rows from merged stats (one row per failed
    aggregate rule, affected-count in offending_value — matching the
    reference's one-issue-per-rule aggregate semantics)."""
    cols = ["shard", "conv_id", "turn_idx", "rule_id", "rule_version",
            "severity", "column", "offending_value"]
    rows = []
    g = stats["__all__"]
    for spec in registry.agg_rules():
        if spec.kind == "missing_rate":
            nulls, total = g.null_counts.get(spec.column, (0, 0))
            frac = nulls / total if total else 0.0
            if frac > spec.params["threshold"]:
                rows.append(("__all__", None, None, spec.rule_id, spec.version,
                             spec.severity, spec.column,
                             f"null_fraction={frac:.6f}"))
        elif spec.kind == "class_balance":
            total = sum(g.role_counts.values())
            if total and g.role_counts:
                mn = min(g.role_counts.values()) / total
                if mn < spec.params["threshold"]:
                    rows.append(("__all__", None, None, spec.rule_id, spec.version,
                                 spec.severity, spec.column,
                                 f"min_proportion={mn:.6f}"))
        elif spec.kind == "missing_rate_by_group":
            # missing-rate-by-batch dispersion
            # (sample_metadata_validator.py:544-585): population std of the
            # per-shard null fraction of a column above threshold -> one
            # dataset-level violation. Uses the per-shard sketch stats that
            # the single scan already produced — no extra pass.
            import numpy as np

            fracs = []
            for shard, st in stats.items():
                if shard == "__all__":
                    continue
                nulls, total = st.null_counts.get(spec.column, (0, 0))
                if total:
                    fracs.append(nulls / total)
            if len(fracs) >= 2:
                std = float(np.std(fracs))
                if std > spec.params["threshold"]:
                    rows.append(("__all__", None, None, spec.rule_id,
                                 spec.version, spec.severity, spec.column,
                                 f"missing_rate_std={std:.6f}"))
        elif spec.kind == "quantile_balance":
            # BIAS_001B (rule_validator.py:355-371): qcut(q=4,
            # duplicates='drop') proportions, min < threshold -> WARNING.
            # Single-pass re-expression: quartile edges via the digest's
            # STEP quantile (exact on fat tie centroids, so duplicate edges
            # collapse exactly like qcut's duplicates='drop'), bin masses
            # via the upper-step CDF, leftmost edge inclusive like qcut.
            td, m = g.tdigest, g.moments
            if td.total_weight > 0:
                q = spec.params.get("q", 4)
                edges = [m.min] + [td.quantile_step(i / q)
                                   for i in range(1, q)] + [m.max]
                uniq_edges = sorted(set(edges))
                props, prev_f = [], 0.0
                for e in uniq_edges[1:]:
                    f = td.cdf_leq(e)
                    props.append(f - prev_f)
                    prev_f = f
                props = [p for p in props if p > 1e-12]
                mn = min(props) if props else 1.0
                if mn < spec.params["threshold"]:
                    rows.append(("__all__", None, None, spec.rule_id,
                                 spec.version, spec.severity, spec.column,
                                 f"min_quartile_proportion={mn:.6f}"))
        elif spec.kind == "global_outlier":
            # matrix_validator.py:536-563: |x - mu| > k*sigma for > pct_max
            # of values -> WARNING. Single-pass re-expression: mu/sigma from
            # the merged moments, tail mass from the t-digest CDF (the
            # two-pass exact count is only needed when the estimate is
            # borderline; digest tails are tight at these extremes).
            m, td = g.moments, g.tdigest
            if m.n > 0 and m.std > 0 and td.total_weight > 0:
                kk = spec.params.get("sigma", 5.0)
                lo, hi = m.mean - kk * m.std, m.mean + kk * m.std
                frac = td.cdf(lo) + (1.0 - td.cdf(hi))
                if frac * 100.0 > spec.params.get("pct_max", 5.0):
                    rows.append(("__all__", None, None, spec.rule_id,
                                 spec.version, spec.severity, spec.column,
                                 f"outlier_pct={frac * 100.0:.4f}"))
        elif spec.kind == "skewness":
            # |adjusted skew| above threshold -> INFO/WARNING
            # (BIAS_003 analog, rule_validator.py:394-405)
            sk = g.moments.skewness_adjusted
            thr = spec.params.get("threshold", 2.0)
            if sk == sk and abs(sk) > thr:  # NaN-safe
                rows.append(("__all__", None, None, spec.rule_id, spec.version,
                             spec.severity, spec.column,
                             f"abs_skew={abs(sk):.6f}"))
        # drift is scored in drift.py against a baseline (needs the baseline
        # artifact, so pipeline.py wires it explicitly)
    return pd.DataFrame(rows, columns=cols)

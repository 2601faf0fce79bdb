"""Aggregate-rule unit tests: BIAS_001B quantile imbalance and the global
outlier rule, seeded to fire and cross-checked against the exact pandas
semantics of the reference (rule_validator.py:355-371,
matrix_validator.py:536-563)."""

import numpy as np
import pandas as pd

from bio_data_validation_ray.registry import RuleRegistry
from bio_data_validation_ray.rules import RuleSpec
from bio_data_validation_ray.sketches import Moments, TDigest
from bio_data_validation_ray.stages.statstage import ShardStats, agg_violations


def stats_for(values: np.ndarray) -> dict:
    s = ShardStats()
    s.moments.add_array(values.astype(float))
    s.tdigest.add_array(values.astype(float))
    s.content_rows = len(values)
    return {"__all__": s}


def reg_with(spec: RuleSpec) -> RuleRegistry:
    return RuleRegistry(version="t", rules=[spec])


class TestQuantileBalance:
    SPEC = RuleSpec("BIAS_001B_T", "quantile_balance", "text_len",
                    {"threshold": 0.05, "q": 4}, "WARNING", "1", "t")

    def test_fires_on_tiny_trailing_bin(self):
        # ties spanning the q25..q75 edges collapse those edges (qcut
        # duplicates='drop'), leaving one tiny trailing bin: min proportion
        # 0.04 < 0.05 -> WARNING, matching the reference decision exactly
        v = np.concatenate([np.full(2600, 5.0), np.full(7000, 10.0),
                            np.linspace(11, 20, 400)])
        binned = pd.qcut(pd.Series(v), q=4, labels=False, duplicates="drop")
        ref_min = binned.value_counts(normalize=True).min()
        assert ref_min < 0.05  # the reference fires
        out = agg_violations(stats_for(v), reg_with(self.SPEC))
        assert list(out["rule_id"]) == ["BIAS_001B_T"]

    def test_silent_on_total_collapse_like_qcut(self):
        # 98% one value: every qcut edge equals it, duplicates='drop' leaves
        # a SINGLE bin -> reference min proportion is 1.0 and stays silent;
        # the digest mirror (step quantiles collapse the same way) must too
        v = np.concatenate([np.full(9800, 50.0), np.linspace(100, 200, 200)])
        binned = pd.qcut(pd.Series(v), q=4, labels=False, duplicates="drop")
        assert binned.value_counts(normalize=True).min() == 1.0
        out = agg_violations(stats_for(v), reg_with(self.SPEC))
        assert len(out) == 0

    def test_silent_on_balanced(self):
        rng = np.random.default_rng(4)
        v = rng.normal(100, 15, 20_000)
        out = agg_violations(stats_for(v), reg_with(self.SPEC))
        assert len(out) == 0


class TestGlobalOutlier:
    def test_fires_at_two_sigma(self):
        # >5% of mass beyond 5 sigma is impossible (Chebyshev caps it at 4%),
        # mirroring the reference's always-quiet default; the rule fires with
        # tighter params: 8% of values far from a 92% spike -> >5% beyond 2s
        spec = RuleSpec("OUT_T", "global_outlier", "text_len",
                        {"sigma": 2.0, "pct_max": 5.0}, "WARNING", "1", "t")
        v = np.concatenate([np.zeros(9200), np.full(800, 1000.0)])
        mean, std = v.mean(), v.std()
        exact_pct = 100.0 * (np.abs(v - mean) > 2.0 * std).mean()
        assert exact_pct > 5.0  # the exact rule fires
        out = agg_violations(stats_for(v), reg_with(spec))
        assert list(out["rule_id"]) == ["OUT_T"]

    def test_silent_on_normal(self):
        spec = RuleSpec("OUT_T", "global_outlier", "text_len",
                        {"sigma": 5.0, "pct_max": 5.0}, "WARNING", "1", "t")
        rng = np.random.default_rng(7)
        v = rng.normal(100, 15, 20_000)
        out = agg_violations(stats_for(v), reg_with(spec))
        assert len(out) == 0


class TestMissingRateByGroup:
    SPEC = RuleSpec("BIAS_004_T", "missing_rate_by_group", "tool",
                    {"threshold": 0.2}, "ERROR", "1", "t")

    def shard(self, nulls, total):
        s = ShardStats()
        s.null_counts["tool"] = [nulls, total]
        s.content_rows = total
        return s

    def test_fires_on_divergent_shards(self):
        stats = {"a": self.shard(0, 100), "b": self.shard(90, 100),
                 "__all__": self.shard(90, 200)}
        out = agg_violations(stats, reg_with(self.SPEC))
        assert list(out["rule_id"]) == ["BIAS_004_T"]
        # np.std([0.0, 0.9]) = 0.45 > 0.2
        assert "missing_rate_std=0.45" in out["offending_value"].iloc[0]

    def test_silent_on_uniform_shards(self):
        stats = {"a": self.shard(30, 100), "b": self.shard(32, 100),
                 "__all__": self.shard(62, 200)}
        assert len(agg_violations(stats, reg_with(self.SPEC))) == 0

    def test_silent_on_single_shard(self):
        stats = {"a": self.shard(90, 100), "__all__": self.shard(90, 100)}
        assert len(agg_violations(stats, reg_with(self.SPEC))) == 0


class TestNearDupRule:
    def test_dup004_emits_pair_count(self, ray_session, tmp_path):
        """A registry carrying a near_dup spec makes validate_dir run the
        MinHash pipeline and emit one DUP_004 count violation
        (rule_validator.py:307-322 semantics: a count, not pair rows)."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.registry import transcript_registry

        rng = np.random.default_rng(13)
        words = [f"tok{i}" for i in range(300)]
        texts = [" ".join(rng.choice(words, 40)) for _ in range(30)]
        texts.append(texts[0].replace("tok", "xok", 1))  # one near-dup pair
        n = len(texts)
        t = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array([dt.datetime(2025, 1, 1)] * n,
                           type=pa.timestamp("us")),
        })
        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(t, din / "shard-0.parquet")
        reg = transcript_registry()
        reg.rules.append(RuleSpec("DUP_004_NEAR", "near_dup", "text",
                                  {"threshold": 0.6}, "WARNING", "1",
                                  "near-duplicate text pair count"))
        rep = validate_dir(str(din), run_dir=str(tmp_path / "r"),
                           registry=reg, concurrency=2)
        vio = pd.read_parquet(tmp_path / "r" / "violations")
        nd = vio[vio["rule_id"] == "DUP_004_NEAR"]
        assert len(nd) == 1
        assert nd["offending_value"].iloc[0] == "near_dup_pairs=1"


def test_registry_includes_new_rules_and_hash_changed():
    from bio_data_validation_ray.registry import transcript_registry

    reg = transcript_registry()
    kinds = {r.kind for r in reg.agg_rules()}
    assert {"quantile_balance", "global_outlier"} <= kinds
    assert reg.version == "1.2.0"

"""Tests for the extension surface: YAML rulesets, expression rules, finite
rule, CLI, generic readers, review prioritization."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bio_data_validation_ray import registry as reg_mod
from bio_data_validation_ray.rules import RuleSpec, compile_rule


class TestYamlRegistry:
    def test_roundtrip_preserves_hash(self):
        r = reg_mod.transcript_registry()
        text = reg_mod.to_yaml(r)
        r2 = reg_mod.from_yaml(text)
        assert r2.ruleset_hash == r.ruleset_hash
        assert r2.version == r.version
        assert [x.rule_id for x in r2.rules] == [x.rule_id for x in r.rules]

    def test_custom_yaml_ruleset(self):
        text = """
version: "2.1.0"
changelog: ["2.1.0: tightened ranges"]
rules:
  - rule_id: R1
    kind: range
    column: x
    params: {min: 0, max: 10}
    severity: ERROR
  - rule_id: R2
    kind: pandas_expr
    column: x
    params: {expr: "x < y"}
    severity: WARNING
"""
        r = reg_mod.from_yaml(text)
        assert len(r.rules) == 2 and r.version == "2.1.0"
        t = pa.table({"x": [5.0, 20.0], "y": [9.0, 25.0]})
        assert compile_rule(r.rules[0])(t).to_pylist() == [False, True]


class TestNewRuleKinds:
    def test_pandas_expr(self):
        spec = RuleSpec("E", "pandas_expr", "a", {"expr": "a + b >= 10"})
        t = pa.table({"a": [1, 9], "b": [2, 8]})
        assert compile_rule(spec)(t).to_pylist() == [True, False]

    def test_finite(self):
        spec = RuleSpec("F", "finite", "v", {})
        t = pa.table({"v": [1.0, float("inf"), float("nan"), None]})
        assert compile_rule(spec)(t).to_pylist() == [False, True, True, False]


class TestReaders:
    def test_read_table_formats(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from bio_data_validation_ray.sources.readers import from_records, read_table

        df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        pq.write_table(pa.Table.from_pandas(df), tmp_path / "t.parquet")
        df.to_csv(tmp_path / "t.csv", index=False)
        df.to_json(tmp_path / "t.json", orient="records", lines=True)
        for name in ("t.parquet", "t.csv", "t.json"):
            ds = read_table(str(tmp_path / name))
            out = ds.to_pandas().sort_values("a").reset_index(drop=True)
            assert out["a"].tolist() == [1, 2, 3], name
        ds = from_records([{"a": 1}, {"a": 2}])
        assert ds.count() == 2

    def test_read_records_with(self, ray_session, tmp_path):
        from bio_data_validation_ray.sources.readers import read_records_with

        # FASTA-ish custom format: >id then one line of payload
        p = tmp_path / "records.fa"
        p.write_text(">r1\nACGT\n>r2\nGGTT\n")

        def parse(b: bytes):
            out = []
            lines = b.decode().strip().splitlines()
            for i in range(0, len(lines), 2):
                out.append({"id": lines[i][1:], "seq": lines[i + 1]})
            return out

        ds = read_records_with([str(p)], parse)
        got = ds.to_pandas().sort_values("id")
        assert got["id"].tolist() == ["r1", "r2"]
        assert got["seq"].tolist() == ["ACGT", "GGTT"]


class TestCli:
    def test_cli_validate_exit_codes_and_output(self, tmp_path):
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        seeded = ensure_transcripts("sf0.001")
        clean = ensure_transcripts("sf0.001", clean=True)
        env = dict(os.environ)
        # seeded -> rejected -> exit 1, text format mentions decision
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "validate",
             seeded, "--format", "text", "--num-cpus", "4"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r.returncode == 1, r.stderr[-500:]
        assert "decision:  rejected" in r.stdout
        assert "[CRITICAL]" in r.stdout or "[ERROR]" in r.stdout
        # clean -> accepted -> exit 0, json format parses
        r2 = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "validate",
             clean, "--format", "json", "--num-cpus", "4"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r2.returncode == 0, r2.stderr[-500:]
        rep = json.loads(r2.stdout)
        assert rep["final_decision"] == "accepted"

    def test_cli_validate_missing_input_is_an_error(self, tmp_path):
        """A typo'd input path must exit 2 with a message — never an
        'accepted' empty run."""
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli",
             "validate", str(tmp_path / "nope"), "--format", "json",
             "--num-cpus", "2"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 2
        assert "no parquet shards" in r.stderr

    def test_cli_dedup_subcommand(self, tmp_path):
        """dedup CLI: exact groups and minhash pairs over the documents
        fixture; planted duplicate must pair up."""
        import pandas as pd
        import pyarrow.parquet as pq

        src = "/root/testdata/sf0.001/documents.parquet"
        t = pq.read_table(src, columns=["doc_id", "text"]).to_pandas()
        dup = t.iloc[:1].assign(doc_id=999999)  # plant an exact copy of doc 0
        import pyarrow as pa

        inp = tmp_path / "docs.parquet"
        pq.write_table(
            pa.Table.from_pandas(pd.concat([t, dup], ignore_index=True),
                                 preserve_index=False),
            inp,
        )
        out = tmp_path / "pairs.parquet"
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "dedup",
             str(inp), "-o", str(out), "--method", "minhash",
             "--threshold", "0.99", "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-800:]
        meta = json.loads(r.stdout.strip().splitlines()[-1])
        pairs = pd.read_parquet(out)
        assert meta["rows"] == len(pairs)
        assert ((pairs["id_a"] == t["doc_id"].iloc[0])
                & (pairs["id_b"] == 999999)).any()
        out2 = tmp_path / "groups.parquet"
        r2 = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "dedup",
             str(inp), "-o", str(out2), "--method", "exact",
             "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r2.returncode == 0, r2.stderr[-800:]
        groups = pd.read_parquet(out2)
        assert len(groups) == len(t)  # one group per distinct text
        assert (groups["n_copies"] == 2).sum() == 1

    def test_cli_validate_clean_out(self, tmp_path):
        import pandas as pd

        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        seeded = ensure_transcripts("sf0.001")
        run = tmp_path / "run"
        out = tmp_path / "clean"
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "validate",
             seeded, "--run-dir", str(run), "--no-resume",
             "--clean-out", str(out), "--format", "json", "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 1, r.stderr[-500:]  # seeded -> rejected
        rep = json.loads(r.stdout)
        exp = rep["clean_export"]
        clean = pd.read_parquet(out)
        assert exp["rows_out"] == len(clean) > 0
        assert exp["excluded_convs"] > 0 and exp["excluded_row_keys"] > 0

    def test_cli_curate_subcommand(self, tmp_path):
        import pandas as pd

        src = "/root/testdata/sf0.001/documents.parquet"
        out = tmp_path / "verdicts"
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "curate",
             src, "-o", str(out), "--min-tokens", "30",
             "--no-terminal-punct-rule", "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-800:]
        meta = json.loads(r.stdout.strip().splitlines()[-1])
        verdicts = pd.read_parquet(out)
        assert len(verdicts) == 500
        assert sum(meta["stages"].values()) == 500
        assert meta["stages"]["kept"] == int(verdicts["keep"].sum())

    def test_cli_custom_yaml_rules(self, tmp_path):
        from bio_data_validation_ray import registry as rm
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts("sf0.001", clean=True)
        # a deliberately impossible rule: every text must be empty
        custom = rm.RuleRegistry(
            version="9.9.9",
            rules=[rm.RuleSpec("MUST_EMPTY", "length_range", "text",
                               {"max": 0}, "ERROR", "1")],
        )
        p = tmp_path / "rules.yml"
        p.write_text(rm.to_yaml(custom))
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "validate",
             clean, "--rules", str(p), "--format", "json", "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 1
        rep = json.loads(r.stdout)
        assert rep["final_decision"] == "rejected"
        assert rep["ruleset_metadata"]["rules_version"] == "9.9.9"


class TestReviewPrioritization:
    def test_top_issues_severity_ordered(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts("sf0.001")
        rep = validate_dir(d, run_dir=str(tmp_path / "r"), concurrency=2)
        top = rep["top_issues"]
        assert 0 < len(top) <= 20
        rank = {"CRITICAL": 3, "ERROR": 2, "WARNING": 1, "INFO": 0}
        rs = [rank[t["severity"]] for t in top]
        assert rs == sorted(rs, reverse=True)
        assert top[0]["severity"] == "CRITICAL"
        assert rep["rationale"].startswith("rejected")
        assert all("novelty" in t and "informativeness" in t for t in top)

    def test_novelty_ranks_rare_rules_first(self):
        import pandas as pd

        from bio_data_validation_ray.policy import (novelty_score,
                                                    select_top_issues)

        # same severity band: the rule that fired 500x must rank BELOW the
        # one that fired twice (human_review_coordinator.py:364-434 analog)
        sample = pd.DataFrame({
            "rule_id": ["HOT_001"] * 10 + ["RARE_001"] * 2,
            "severity": ["ERROR"] * 12,
            "message": [f"m{i}" for i in range(12)],
        })
        totals = {"HOT_001": 500, "RARE_001": 2}
        top = select_top_issues(sample, totals, cap=5)
        assert top[0]["rule_id"] == "RARE_001"
        assert top[0]["novelty"] == 0.7
        assert top[0]["informativeness"] > top[-1]["informativeness"]
        # severity still dominates novelty: one CRITICAL from the hot rule
        # leads the list anyway
        sample2 = pd.concat(
            [sample, pd.DataFrame({"rule_id": ["HOT_001"],
                                   "severity": ["CRITICAL"],
                                   "message": ["c"]})],
            ignore_index=True)
        top2 = select_top_issues(sample2, totals, cap=5)
        assert top2[0]["severity"] == "CRITICAL"
        # the seen-count step function mirrors the reference bands
        assert [novelty_score(n) for n in (1, 11, 51, 101)] == \
            [0.7, 0.5, 0.3, 0.1]
        assert select_top_issues(sample.iloc[:0], totals) == []


class TestLeftAntiCount:
    def test_nonzero_difference(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.pipelines.queries import (
            left_anti_count,
        )

        left = rd.from_pandas(pd.DataFrame(
            {"user_id": np.arange(100, dtype=np.int64)}))
        right = rd.from_pandas(pd.DataFrame(
            {"buyer_id": np.arange(0, 100, 3, dtype=np.int64)}))
        n = left_anti_count(left, right, left_key="user_id",
                            right_key="buyer_id")
        assert n == 100 - len(range(0, 100, 3))

    def test_all_matched_and_none_matched(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.pipelines.queries import (
            left_anti_count,
        )

        ids = pd.DataFrame({"a": np.arange(20, dtype=np.int64)})
        full = rd.from_pandas(ids)
        assert left_anti_count(
            full, rd.from_pandas(ids.rename(columns={"a": "b"})),
            left_key="a", right_key="b") == 0
        other = rd.from_pandas(
            pd.DataFrame({"b": np.arange(100, 120, dtype=np.int64)}))
        assert left_anti_count(full, other, left_key="a",
                               right_key="b") == 20

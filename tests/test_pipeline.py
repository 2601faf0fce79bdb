"""Integration tests for the flagship validation pipeline (FIXTURES.md §4
invariants: exact seeded violations, policy decisions, resume idempotency,
text byte-equality parity, drift)."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "sf0.001"


@pytest.fixture(scope="module")
def seeded_run(ray_session, tmp_path_factory):
    from bio_data_validation_ray.pipelines.validate import validate_dir
    from bio_data_validation_ray.sources.transcripts import ensure_transcripts

    d = ensure_transcripts(SF)
    run_dir = str(tmp_path_factory.mktemp("run_seeded"))
    report = validate_dir(d, run_dir=run_dir, concurrency=2)
    vio = pd.read_parquet(os.path.join(run_dir, "violations"))
    return d, run_dir, report, vio


class TestSeededRun:
    def test_decision_rejected(self, seeded_run):
        _, _, report, _ = seeded_run
        assert report["final_decision"] == "rejected"
        assert report["severity_counts"]["critical"] >= 1
        assert not report["passed"]

    def test_all_rule_families_fire(self, seeded_run):
        _, _, _, vio = seeded_run
        fired = set(vio["rule_id"])
        for rid in [
            "TXT_ROLE_VOCAB", "TXT_TOOL_PATTERN", "TXT_TOOL_ROLE",
            "TXT_TEXT_EMPTY", "TXT_TEXT_NULL", "CONS_003_TURN_MIN",
            "TXT_TS_WINDOW", "DUP_002_TURN_KEY", "TXT_TURN_CONTIG",
            "TXT_TS_MONOTONIC", "TXT_CONV_SINGLE_SHARD", "DUP_001_ROW",
        ]:
            assert rid in fired, rid

    def test_ruleset_hash_stamped(self, seeded_run):
        from bio_data_validation_ray.registry import transcript_registry

        _, run_dir, report, _ = seeded_run
        assert report["ruleset_metadata"]["rules_hash"] == \
            transcript_registry().ruleset_hash
        saved = json.load(open(os.path.join(run_dir, "run_summary.json")))
        assert saved["ruleset_metadata"]["rules_hash"] == \
            transcript_registry().ruleset_hash

    def test_lineage_written_per_shard(self, seeded_run):
        d, run_dir, report, _ = seeded_run
        recs = [
            json.load(open(p))
            for p in glob.glob(os.path.join(run_dir, "lineage", "*.json"))
        ]
        assert len(recs) == len(glob.glob(os.path.join(d, "*.parquet")))
        assert sum(r["rows_scanned"] for r in recs) == report["rows_scanned"]
        for r in recs:
            assert r["rules_evaluated"] > 0 and r["status"] == "committed"

    def test_per_shard_verdicts_consistent(self, seeded_run):
        from bio_data_validation_ray import policy

        _, _, report, _ = seeded_run
        for shard, v in report["per_shard"].items():
            c = policy.SeverityCounts(**v["severity_counts"])
            assert v["decision"] == policy.decide(c)
            assert v["passed"] == policy.passed(c)


class TestResume:
    def test_resume_skips_committed_and_is_idempotent(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        run_dir = str(tmp_path / "run")
        r1 = validate_dir(d, run_dir=run_dir, concurrency=2)
        # simulate crash-after-partial-commit: drop half the lineage records
        lineage = sorted(glob.glob(os.path.join(run_dir, "lineage", "*.json")))
        kept = lineage[: len(lineage) // 2]
        for p in lineage[len(lineage) // 2:]:
            os.remove(p)
        r2 = validate_dir(d, run_dir=run_dir, concurrency=2)
        assert r2["shards_skipped_committed"] == len(kept)
        # all shards committed again, rows_scanned covers only the re-run ones
        recs = {
            json.load(open(p))["partition_id"]: json.load(open(p))
            for p in glob.glob(os.path.join(run_dir, "lineage", "*.json"))
        }
        assert len(recs) == r1["shards_total"]
        total_rows = sum(
            v["rows_scanned"]
            for s, v in r1["per_shard"].items()
        )
        assert sum(r["rows_scanned"] for r in recs.values()) == total_rows

    def test_completed_run_short_circuits(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        # seeded (rejected) data: the checkpoint short-circuit must carry
        # the committed verdict, not report "accepted" for a rejected run
        d = ensure_transcripts(SF)
        run_dir = str(tmp_path / "run")
        r1 = validate_dir(d, run_dir=run_dir, concurrency=2)
        assert r1["final_decision"] == "rejected"
        r2 = validate_dir(d, run_dir=run_dir, concurrency=2)
        assert r2["final_decision"] == "rejected_from_checkpoint"
        assert r2["shards_skipped_committed"] == r2["shards_total"]
        # clean data: short-circuit reports accepted
        dc = ensure_transcripts(SF, clean=True)
        run_dir2 = str(tmp_path / "run_clean")
        validate_dir(dc, run_dir=run_dir2, concurrency=2)
        r3 = validate_dir(dc, run_dir=run_dir2, concurrency=2)
        assert r3["final_decision"] == "accepted_from_checkpoint"

    def test_ruleset_change_invalidates_lineage(self, ray_session, tmp_path):
        from bio_data_validation_ray.registry import transcript_registry
        from bio_data_validation_ray.state.checkpoint import Lineage

        run_dir = str(tmp_path / "run")
        reg = transcript_registry()
        lin = Lineage(run_dir, reg.ruleset_hash)
        lin.commit("s1", rows_scanned=10, rules_evaluated=5, violations=0,
                   wall_time_s=0.1)
        assert set(lin.committed()) == {"s1"}
        lin2 = Lineage(run_dir, "different_hash_0000")
        assert lin2.committed() == {}


class TestParity:
    def test_text_byte_equality_through_sorted_output(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import (
            content_hash_of_dir,
            write_sorted_output,
        )
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF, clean=True)
        out = str(tmp_path / "sorted")
        write_sorted_output(d, out)
        assert content_hash_of_dir(out) == content_hash_of_dir(d)
        # and the sorted output really is in stable (conv_id, turn_idx) order
        t = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(out + "/*.parquet"))]
        )
        key = list(zip(t["conv_id"], t["turn_idx"]))
        assert key == sorted(key)

    def test_clean_data_accepted_no_violations(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF, clean=True)
        rep = validate_dir(d, run_dir=str(tmp_path / "r"), concurrency=2)
        assert rep["final_decision"] == "accepted"
        assert rep["stages"]["violations"]["total"] == 0
        assert rep["passed"]


class TestDrift:
    def test_drifted_partition_flagged(self, ray_session):
        import numpy as np

        from bio_data_validation_ray import drift
        from bio_data_validation_ray.sketches import TDigest

        rng = np.random.default_rng(3)
        base = TDigest().add_array(rng.normal(100, 10, 50_000))
        same = TDigest().add_array(rng.normal(100, 10, 50_000))
        shifted = TDigest().add_array(rng.normal(140, 10, 50_000))
        scored = drift.score_partitions(
            {"same": same, "shifted": shifted}, base,
            ks_threshold=0.2, psi_threshold=0.2,
        )
        assert not scored["same"]["drifted"]
        assert scored["shifted"]["drifted"]
        assert scored["shifted"]["ks"] > 0.5
        assert scored["shifted"]["psi"] > 1.0

    def test_exact_psi_from_histograms(self, ray_session):
        """Exact-histogram PSI (psi_from_counts + histogram_fixed): a
        shifted shard drifts, an identical one doesn't, and the exact score
        agrees directionally with the digest-based PSI."""
        import numpy as np
        import ray.data as rd

        from bio_data_validation_ray import drift
        from bio_data_validation_ray.functions.profile import histogram_fixed
        from bio_data_validation_ray.sketches import TDigest

        rng = np.random.default_rng(9)
        edges = list(np.linspace(40, 200, 17))
        base_vals = rng.normal(100, 10, 30_000)
        same_vals = rng.normal(100, 10, 30_000)
        shift_vals = rng.normal(140, 10, 30_000)
        df = pd.DataFrame({
            "shard": ["same"] * 30_000 + ["shifted"] * 30_000,
            "v": np.concatenate([same_vals, shift_vals]),
        })
        hist = histogram_fixed(rd.from_pandas(df), "v", edges, by=["shard"])
        nb = len(edges) + 1
        per_shard = {
            s: np.bincount(g["bin"], weights=g["n"], minlength=nb)
            for s, g in hist.groupby("shard")
        }
        base_hist = np.bincount(
            np.searchsorted(edges, base_vals, side="right"), minlength=nb)
        scored = drift.score_partitions_exact(per_shard, base_hist)
        assert not scored["same"]["drifted"]
        assert scored["shifted"]["drifted"]
        # directional agreement with the digest PSI
        dig = drift.psi(TDigest().add_array(shift_vals),
                        TDigest().add_array(base_vals))
        assert scored["shifted"]["psi"] > 1.0 and dig > 1.0

    def test_pipeline_drift_stage(self, ray_session, tmp_path):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from bio_data_validation_ray import drift
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sketches import TDigest
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts(SF, clean=True)
        base = TDigest()
        for f in sorted(glob.glob(clean + "/*.parquet")):
            t = pq.read_table(f, columns=["text"])
            base.add_array(
                pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(float)
            )
        baseline_json = drift.baseline_to_json({"text_len": base})
        rep = validate_dir(clean, run_dir=str(tmp_path / "r"),
                           baseline_json=baseline_json, concurrency=2)
        assert rep["drift"], "per-shard drift scores present"
        assert not any(v["drifted"] for v in rep["drift"].values())


class TestBaselineBuild:
    def test_build_baseline_roundtrip_and_use(self, ray_session, tmp_path):
        """build_baseline's distributed digests must agree with a direct
        single-pass digest and plug straight into validate_dir."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from bio_data_validation_ray import drift
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sketches import TDigest
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts(SF, clean=True)
        bj = drift.build_baseline(clean)
        base = drift.baseline_from_json(bj)["text_len"]
        direct = TDigest()
        for f in sorted(glob.glob(clean + "/*.parquet")):
            t = pq.read_table(f, columns=["text"])
            direct.add_array(pc.utf8_length(t["text"]).to_numpy(
                zero_copy_only=False).astype(float))
        for q in (0.1, 0.5, 0.9):
            assert abs(base.quantile(q) - direct.quantile(q)) <= \
                max(1.0, 0.05 * abs(direct.quantile(q)))
        # clean data scored against its own baseline: nothing drifts
        rep = validate_dir(clean, run_dir=str(tmp_path / "r"),
                           baseline_json=bj, concurrency=2)
        assert rep["drift"] and not any(
            v["drifted"] for v in rep["drift"].values())

    def test_cli_baseline_subcommand(self, tmp_path):
        import subprocess
        import sys

        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts(SF, clean=True)
        out = str(tmp_path / "baseline.json")
        r = subprocess.run(
            [sys.executable, "-m", "bio_data_validation_ray.cli", "baseline",
             clean, "-o", out, "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-500:]
        assert json.load(open(out))["text_len"]["means"]


class TestResumable:
    def test_chunked_passes_match_single_shot(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import (
            validate_dir,
            validate_resumable,
        )
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        single = validate_dir(d, run_dir=str(tmp_path / "single"),
                              resume=False, concurrency=2)
        chunked = validate_resumable(d, run_dir=str(tmp_path / "chunked"),
                                     files_per_pass=3, concurrency=2)
        assert chunked["complete"]
        assert chunked["final_decision"] == single["final_decision"]
        # row+group severity counts match exactly (aggregate rules are the
        # same dataset-level extras in both modes)
        assert chunked["severity_counts"] == single["severity_counts"]
        assert chunked["rows_scanned"] == single["rows_scanned"]

    def test_crash_after_one_pass_then_resume(self, ray_session, tmp_path):
        import glob as g
        import json as j
        import os as o

        from bio_data_validation_ray.pipelines.validate import validate_resumable
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        run = str(tmp_path / "r")
        # "crash": only one pass of 3 files commits
        partial = validate_resumable(d, run_dir=run, files_per_pass=3,
                                     max_passes=1, concurrency=2)
        assert partial["final_decision"] == "incomplete"
        assert partial["shards_committed"] == 3
        committed_at = {
            j.load(open(p))["partition_id"]: j.load(open(p))["committed_at"]
            for p in g.glob(o.path.join(run, "lineage", "*.json"))
        }
        # restart: finishes the rest, does NOT reprocess the first pass
        full = validate_resumable(d, run_dir=run, files_per_pass=3, concurrency=2)
        assert full["complete"] and full["shards_committed"] == full["shards_total"]
        for p in g.glob(o.path.join(run, "lineage", "*.json")):
            rec = j.load(open(p))
            if rec["partition_id"] in committed_at:
                assert rec["committed_at"] == committed_at[rec["partition_id"]]
        assert full["final_decision"] == "rejected"
        # sketches persisted for every shard -> global stats were exact
        from bio_data_validation_ray.state.checkpoint import load_stats_blobs

        blobs = load_stats_blobs(o.path.join(run, "lineage"))
        assert len(blobs) == full["shards_total"]


    def test_remerge_branch_switch_no_stale_conv_parts(self, ray_session,
                                                       tmp_path):
        """A re-merge that switches from the distributed conv-final branch
        (driver_cap=0) to the driver branch (default cap) must not leave the
        distributed run's conv-*.parquet parts beside the fresh part-0 —
        stale parts would double-count conversation violations for
        consumers like --clean-out."""
        import glob as g
        import os as o

        import pyarrow.dataset as pads

        from bio_data_validation_ray.pipelines.validate import validate_resumable
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        run = str(tmp_path / "r")
        dist = validate_resumable(d, run_dir=run, files_per_pass=3,
                                  concurrency=2, driver_cap=0)
        fdir = o.path.join(run, "violations", "conv-final")
        assert g.glob(o.path.join(fdir, "conv-*.parquet"))  # distributed ran
        n_dist = len(pads.dataset(fdir).to_table())
        # all shards committed → re-running only re-merges, now driver-side
        redo = validate_resumable(d, run_dir=run, files_per_pass=3,
                                  concurrency=2)
        assert redo["severity_counts"] == dist["severity_counts"]
        assert not g.glob(o.path.join(fdir, "conv-*.parquet"))
        assert len(pads.dataset(fdir).to_table()) == n_dist

    def test_crash_mid_commit_loop_is_exact(self, ray_session, tmp_path):
        """A crash DURING the per-shard commit loop leaves the pass's group
        artifacts on disk with some shards uncommitted; the resumed run must
        prune those stale rows (else DUP_001 double-subtracts and violations
        duplicate) and still match an uninterrupted run exactly."""
        import glob as g
        import os as o

        from bio_data_validation_ray.pipelines.validate import validate_resumable
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        ref = validate_resumable(d, run_dir=str(tmp_path / "ref"),
                                 files_per_pass=3, concurrency=2)
        run = str(tmp_path / "r")
        validate_resumable(d, run_dir=run, files_per_pass=3,
                           max_passes=1, concurrency=2)
        # crash mid-commit: one shard of the pass loses its lineage record
        # (and stats) while the pass's group violations/segments stay on disk
        recs = sorted(g.glob(o.path.join(run, "lineage", "*.json")))
        victim = json.load(open(recs[0]))["partition_id"]
        o.remove(recs[0])
        # (the victim's sketch blob may remain in the run's stats bundle —
        # harmless: uncommitted shards are excluded by the lineage filter
        # and the shard reprocesses into a new bundle)
        full = validate_resumable(d, run_dir=run, files_per_pass=3, concurrency=2)
        assert full["complete"]
        assert full["severity_counts"] == ref["severity_counts"]
        assert full["final_decision"] == ref["final_decision"]
        # no duplicated violation rows across group dirs
        import pyarrow.dataset as pads

        vfiles = g.glob(o.path.join(run, "violations", "group-*", "*.parquet"))
        vio = pads.dataset(vfiles).to_table().to_pandas()
        ref_vio = pads.dataset(
            g.glob(o.path.join(str(tmp_path / "ref"), "violations",
                               "group-*", "*.parquet"))
        ).to_table().to_pandas()
        key = ["shard", "conv_id", "turn_idx", "rule_id"]
        assert (
            vio.groupby(key, dropna=False).size().sort_index().to_dict()
            == ref_vio.groupby(key, dropna=False).size().sort_index().to_dict()
        )

    def test_resumable_drift_attributed_to_shard(self, ray_session, tmp_path):
        """Drift violations must land in the drifted shard's per-shard counts
        (and decision) in resumable mode, same as validate_dir."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from bio_data_validation_ray import drift
        from bio_data_validation_ray.pipelines.validate import (
            validate_dir,
            validate_resumable,
        )
        from bio_data_validation_ray.sketches import TDigest
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts(SF, clean=True)
        base = TDigest()
        shards = sorted(glob.glob(clean + "/*.parquet"))
        for f in shards:
            t = pq.read_table(f, columns=["text"])
            base.add_array(
                pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(float)
            )
        baseline_json = drift.baseline_to_json({"text_len": base})
        # copy clean shards; blow up text length in ONE shard -> drift there
        din = tmp_path / "drifted_in"
        din.mkdir()
        for f in shards:
            shutil.copy(f, din / os.path.basename(f))
        victim = os.path.basename(shards[0])
        t = pq.read_table(din / victim)
        big = pc.binary_repeat(t["text"], 20)
        pq.write_table(t.set_column(t.schema.get_field_index("text"),
                                    "text", big), din / victim)
        single = validate_dir(str(din), run_dir=str(tmp_path / "s"),
                              baseline_json=baseline_json, concurrency=2)
        chunked = validate_resumable(str(din), run_dir=str(tmp_path / "c"),
                                     files_per_pass=2,
                                     baseline_json=baseline_json, concurrency=2)
        assert single["drift"][victim]["drifted"]
        assert chunked["drift"][victim]["drifted"]
        for rep in (single, chunked):
            assert rep["per_shard"][victim]["severity_counts"]["warning"] >= 1
        assert (chunked["per_shard"][victim]["severity_counts"]
                == single["per_shard"][victim]["severity_counts"])
        assert (chunked["per_shard"][victim]["decision"]
                == single["per_shard"][victim]["decision"])
        assert chunked["severity_counts"] == single["severity_counts"]


class TestPolicyPresets:
    def test_preset_changes_pipeline_decision(self, ray_session, tmp_path):
        """Two seeded role errors: default policy -> conditional_accept,
        strict -> rejected, lenient -> conditional_accept (CLI --policy)."""
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        clean = ensure_transcripts(SF, clean=True)
        din = tmp_path / "two_errors"
        din.mkdir()
        shards = sorted(glob.glob(clean + "/*.parquet"))
        for f in shards:
            shutil.copy(f, din / os.path.basename(f))
        t = pq.read_table(din / os.path.basename(shards[0]))
        role = t["role"].to_pylist()
        role[0] = role[1] = "narrator"  # 2 x TXT_ROLE_VOCAB (ERROR)
        t = t.set_column(t.schema.get_field_index("role"), "role",
                         pa.array(role, type=pa.string()))
        pq.write_table(t, din / os.path.basename(shards[0]))
        decisions = {
            p: validate_dir(str(din), run_dir=str(tmp_path / f"r_{p}"),
                            policy=p, concurrency=2)["final_decision"]
            for p in ("default", "strict", "lenient")
        }
        assert decisions == {"default": "conditional_accept",
                             "strict": "rejected",
                             "lenient": "conditional_accept"}


class TestStrictMode:
    def test_strict_short_circuits_on_critical(self, ray_session, tmp_path):
        """strict=True: CRITICAL row violations reject before the
        conversation/aggregate stages run (orchestrator.py:376-381)."""
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.registry import transcript_registry
        from bio_data_validation_ray.rules import RuleSpec
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        reg = transcript_registry()
        # promote empty-text to CRITICAL so the seeded fixture trips it
        for i, r in enumerate(reg.rules):
            if r.rule_id == "TXT_TEXT_EMPTY":
                reg.rules[i] = RuleSpec(r.rule_id, r.kind, r.column,
                                        r.params, "CRITICAL", r.version,
                                        r.description)
        rep = validate_dir(d, run_dir=str(tmp_path / "r"), registry=reg,
                           strict=True, concurrency=2)
        assert rep["final_decision"] == "rejected"
        assert rep["rejection_reason"] == "critical_rule_violations"
        assert rep["critical_violations"] > 0
        assert "conversation" not in rep["stages"]

    def test_strict_clean_data_runs_fully(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF, clean=True)
        rep = validate_dir(d, run_dir=str(tmp_path / "r"), strict=True,
                           concurrency=2)
        assert rep["final_decision"] == "accepted"


class TestHotConversation:
    def test_one_million_turn_conversation(self, ray_session, tmp_path):
        """Heavy-tail stress: ONE conversation of 1M turns spanning 8 shard
        files. The pipeline must (a) finish quickly — the raw rows never
        shuffle; the conversation reaches the merge as per-batch segment
        partials, (b) flag exactly the shard-spanning violation, (c) decide
        contiguity/monotonicity correctly via the exact fallback."""
        import time as _time

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        n, shards = 1_000_000, 8
        din = tmp_path / "hot"
        din.mkdir()
        per = n // shards
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        for s in range(shards):
            lo = s * per
            turns = np.arange(lo, lo + per, dtype=np.int32)
            tbl = pa.table({
                "conv_id": pa.array(["hot"] * per),
                "turn_idx": pa.array(turns),
                "role": pa.array(
                    np.where(turns % 2 == 0, "user", "assistant")),
                "text": pa.array(["ok."] * per),
                "tool": pa.array([None] * per, type=pa.string()),
                "ts": pa.array(t0 + turns.astype("timedelta64[us]")),
            })
            pq.write_table(tbl, din / f"shard-{s:02d}.parquet")

        from bio_data_validation_ray.pipelines.validate import validate_dir

        t_start = _time.time()
        rep = validate_dir(str(din), run_dir=str(tmp_path / "r"),
                           resume=False)
        wall = _time.time() - t_start
        assert wall < 60, f"hot conversation took {wall:.1f}s"
        assert rep["rows_scanned"] == n
        # exactly one violation: the CRITICAL shard-spanning rule
        vio = pd.read_parquet(os.path.join(str(tmp_path / "r"),
                                           "violations"))
        assert set(vio["rule_id"]) == {"TXT_CONV_SINGLE_SHARD"}
        assert len(vio) == 1
        assert rep["final_decision"] == "rejected"  # critical -> rejected
        # ranges tile without overlap, so the 1M-turn conversation is
        # decided ENTIRELY from compact segment partials — no exact re-read
        assert rep["stages"]["conversation"]["exact_fallback_convs"] == 0


    def test_duplicated_hot_conversation_exact_path(self, ray_session,
                                                    tmp_path):
        """Adversarial twin: the SAME 400k-turn range written to two shards
        — segments overlap, so the conversation takes the exact-fallback
        re-read at volume. It must count every duplicate key and whole-row
        duplicate, within bounded time (the re-read scales with flagged
        data, which here is the whole conversation by construction)."""
        import time as _time

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = 400_000
        din = tmp_path / "dup"
        din.mkdir()
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        turns = np.arange(n, dtype=np.int32)
        tbl = pa.table({
            "conv_id": pa.array(["dup"] * n),
            "turn_idx": pa.array(turns),
            "role": pa.array(np.where(turns % 2 == 0, "user", "assistant")),
            "text": pa.array(["ok."] * n),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(t0 + turns.astype("timedelta64[us]")),
        })
        pq.write_table(tbl, din / "shard-00.parquet")
        pq.write_table(tbl, din / "shard-01.parquet")  # byte-identical copy

        from bio_data_validation_ray.pipelines.validate import validate_dir

        t_start = _time.time()
        rep = validate_dir(str(din), run_dir=str(tmp_path / "r"),
                           resume=False)
        wall = _time.time() - t_start
        assert wall < 90, f"exact path took {wall:.1f}s"
        assert rep["stages"]["conversation"]["exact_fallback_convs"] == 1
        vio = pd.read_parquet(os.path.join(str(tmp_path / "r"),
                                           "violations"))
        by_rule = vio.groupby("rule_id").size().to_dict()
        assert by_rule["TXT_CONV_SINGLE_SHARD"] == 1
        assert by_rule["DUP_002_TURN_KEY"] == 1   # conv-level: n dup keys
        assert by_rule["DUP_001_ROW"] == n        # one extra copy per turn
        assert rep["final_decision"] == "rejected"


class TestDistributedPath:
    """The distributed conversation branch (sort + MergeSegments + boundary
    stitch) is the 100 TB path; force it with driver_cap=0 and require
    byte-identical results to the driver branch."""

    def test_distributed_equals_driver_path(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        a = validate_dir(d, run_dir=str(tmp_path / "driver"), resume=False,
                         concurrency=2)
        b = validate_dir(d, run_dir=str(tmp_path / "dist"), resume=False,
                         concurrency=2, driver_cap=0)
        assert b["severity_counts"] == a["severity_counts"]
        assert b["final_decision"] == a["final_decision"]
        va = pd.read_parquet(os.path.join(str(tmp_path / "driver"), "violations"))
        vb = pd.read_parquet(os.path.join(str(tmp_path / "dist"), "violations"))
        key = ["shard", "conv_id", "turn_idx", "rule_id", "offending_value"]
        sa = va[key].fillna("~").sort_values(key).reset_index(drop=True)
        sb = vb[key].fillna("~").sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(sa, sb)

    def test_resumable_distributed_crash_resume(self, ray_session, tmp_path):
        """Crash after one pass with the distributed branch forced
        (driver_cap=0): group artifacts are write_parquet DIRECTORIES; the
        resume pruner must handle them and the finished run must match an
        uninterrupted driver-path run exactly."""
        from bio_data_validation_ray.pipelines.validate import validate_resumable
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        ref = validate_resumable(d, run_dir=str(tmp_path / "ref"),
                                 files_per_pass=3, concurrency=2)
        run = str(tmp_path / "r")
        partial = validate_resumable(d, run_dir=run, files_per_pass=3,
                                     max_passes=1, concurrency=2,
                                     driver_cap=0)
        assert partial["final_decision"] == "incomplete"
        full = validate_resumable(d, run_dir=run, files_per_pass=3,
                                  concurrency=2, driver_cap=0)
        assert full["complete"]
        assert full["severity_counts"] == ref["severity_counts"]
        assert full["final_decision"] == ref["final_decision"]
        assert full["per_shard"] == ref["per_shard"]

    def test_resumable_distributed_final_merge(self, ray_session, tmp_path):
        """validate_resumable's final conversation merge routes through the
        same distributed branch when the persisted segments exceed
        driver_cap; multi-pass results must match the driver merge exactly
        (per-shard counts, decisions, and the conv-final violation rows)."""
        from bio_data_validation_ray.pipelines.validate import validate_resumable
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        ref = validate_resumable(d, run_dir=str(tmp_path / "drv"),
                                 files_per_pass=3, concurrency=2)
        dist = validate_resumable(d, run_dir=str(tmp_path / "dist"),
                                  files_per_pass=3, concurrency=2,
                                  driver_cap=0)
        assert dist["complete"]
        assert dist["severity_counts"] == ref["severity_counts"]
        assert dist["final_decision"] == ref["final_decision"]
        assert dist["per_shard"] == ref["per_shard"]
        va = pd.read_parquet(
            os.path.join(str(tmp_path / "drv"), "violations", "conv-final"))
        vb = pd.read_parquet(
            os.path.join(str(tmp_path / "dist"), "violations", "conv-final"))
        key = ["shard", "conv_id", "turn_idx", "rule_id", "offending_value"]
        sa = va[key].fillna("~").sort_values(key).reset_index(drop=True)
        sb = vb[key].fillna("~").sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(sa, sb)

    def test_violations_sink_idempotent_under_rewrite(self, ray_session,
                                                      tmp_path):
        """Deterministic part names (SURVEY §4.2): re-executing a write into
        the same sink directory (what a retried/re-run write task does)
        overwrites the same files instead of appending UUID-named
        duplicates — file set and row count stay fixed."""
        import ray.data as rd

        from bio_data_validation_ray.sources.writers import (
            write_parquet_idempotent,
        )

        df = pd.DataFrame({"a": range(1000), "b": ["x"] * 1000})
        ds = rd.from_pandas([df.iloc[i:i + 100] for i in range(0, 1000, 100)])
        sink = str(tmp_path / "sink")
        write_parquet_idempotent(ds, sink, prefix="vio")
        files1 = sorted(os.listdir(sink))
        write_parquet_idempotent(ds, sink, prefix="vio")  # "retry"
        files2 = sorted(os.listdir(sink))
        assert files1 == files2
        assert all(f.startswith("vio-") for f in files2)
        assert len(pd.read_parquet(sink)) == 1000
        # whole-directory rewrite with fewer blocks: overwrite drops stale
        write_parquet_idempotent(ds.repartition(2), sink, prefix="vio")
        assert len(pd.read_parquet(sink)) == 1000

    def test_distributed_rerun_same_run_dir_no_duplicates(self, ray_session,
                                                          tmp_path):
        """The distributed violations sink must not accumulate rows when the
        same run_dir is validated twice (crash-and-rerun without lineage)."""
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF)
        r1 = validate_dir(d, run_dir=str(tmp_path / "r"), resume=False,
                          concurrency=2, driver_cap=0)
        n1 = len(pd.read_parquet(os.path.join(str(tmp_path / "r"),
                                              "violations")))
        r2 = validate_dir(d, run_dir=str(tmp_path / "r"), resume=False,
                          concurrency=2, driver_cap=0)
        n2 = len(pd.read_parquet(os.path.join(str(tmp_path / "r"),
                                              "violations")))
        assert n1 == n2 == r1["stages"]["violations"]["total"] \
            == r2["stages"]["violations"]["total"]

    def test_distributed_clean_accepts(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import ensure_transcripts

        d = ensure_transcripts(SF, clean=True)
        rep = validate_dir(d, run_dir=str(tmp_path / "r"), resume=False,
                          concurrency=2, driver_cap=0)
        assert rep["final_decision"] == "accepted"
        assert rep["stages"]["violations"]["total"] == 0


class TestDecisionIntegrity:
    """Round-4 review regressions: the decision gate must never silently
    soften (strict rejections in resumable mode, resumes over rejected
    runs, zero-row shards, malformed later shards, near_dup in resumable
    mode)."""

    def _mini_table(self, texts, start=0):
        import datetime as dt

        import pyarrow as pa

        n = len(texts)
        return pa.table({
            "conv_id": pa.array([f"c{start + i}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array([dt.datetime(2025, 1, 1)] * n,
                           type=pa.timestamp("us")),
        })

    def test_resumable_propagates_strict_critical_rejection(
            self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import (
            validate_resumable,
        )
        from bio_data_validation_ray.registry import transcript_registry
        from bio_data_validation_ray.rules import RuleSpec

        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(self._mini_table(["ok text", ""]),
                       din / "s0.parquet")
        reg = transcript_registry()
        reg.rules.append(RuleSpec("CRIT_EMPTY", "no_empty", "text", {},
                                  "CRITICAL", "1", "critical empty text"))
        rep = validate_resumable(str(din), run_dir=str(tmp_path / "r"),
                                 registry=reg, strict=True)
        assert rep["final_decision"] == "rejected"
        assert rep["rejection_reason"] == "critical_rule_violations"

    def test_zero_row_shard_commits_and_completes(self, ray_session,
                                                  tmp_path):
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import (
            validate_resumable,
        )

        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(self._mini_table(["some valid text here"]),
                       din / "s0.parquet")
        empty = self._mini_table(["x"]).schema.empty_table()
        pq.write_table(empty, din / "s1-empty.parquet")
        rep = validate_resumable(str(din), run_dir=str(tmp_path / "r"))
        assert rep["complete"] is True
        assert rep["shards_committed"] == 2
        assert "s1-empty.parquet" in rep["per_shard"]

    def test_schema_failure_in_later_shard_short_circuits(
            self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import validate_dir

        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(self._mini_table(["fine"]), din / "a.parquet")
        bad = self._mini_table(["missing ts col"]).drop_columns(["ts"])
        pq.write_table(bad, din / "z.parquet")
        rep = validate_dir(str(din))
        assert rep["final_decision"] == "rejected"
        assert rep["rejection_reason"] == "schema_validation_failed"
        assert rep["stages"]["schema"]["failed_file"] == "z.parquet"

    def test_near_dup_fires_in_resumable_mode(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import (
            validate_resumable,
        )
        from bio_data_validation_ray.registry import transcript_registry
        from bio_data_validation_ray.rules import RuleSpec

        rng = np.random.default_rng(13)
        words = [f"tok{i}" for i in range(300)]
        texts = [" ".join(rng.choice(words, 40)) for _ in range(20)]
        texts.append(texts[0].replace("tok", "xok", 1))
        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(self._mini_table(texts[:10]), din / "s0.parquet")
        pq.write_table(self._mini_table(texts[10:], start=10),
                       din / "s1.parquet")
        reg = transcript_registry()
        reg.rules.append(RuleSpec("DUP_004_NEAR", "near_dup", "text",
                                  {"threshold": 0.6}, "WARNING", "1",
                                  "near-duplicate pair count"))
        rep = validate_resumable(str(din), run_dir=str(tmp_path / "r"),
                                 registry=reg, files_per_pass=1)
        rules = [v["rule_id"] for v in rep["aggregate_violations"]]
        assert "DUP_004_NEAR" in rules

    def test_unknown_severity_fails_at_load(self):
        import pytest

        from bio_data_validation_ray.rules import RuleSpec

        with pytest.raises(ValueError, match="severity"):
            RuleSpec("X", "text_empty", "text", {}, "FATAL", "1", "")
        # lowercase normalizes instead of KeyError-ing at the verdict stage
        assert RuleSpec("Y", "text_empty", "text", {}, "error", "1",
                        "").severity == "ERROR"


class TestMalformedRows:
    """Null grouping keys must become violations, not crashes; anagram
    texts must not mint false exact-duplicate violations."""

    def _tbl(self, conv, turn, ts, text):
        import pyarrow as pa

        n = len(conv)
        return pa.table({
            "conv_id": pa.array(conv, type=pa.string()),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        })

    def test_null_keys_become_violations(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import validate_dir

        t0 = dt.datetime(2025, 1, 1)
        tbl = self._tbl(
            ["c1", None, "c1", "c2"],
            [0, 1, None, 0],
            [t0, t0, t0, None],
            ["a", "b", "c", "d"],
        )
        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(tbl, din / "s0.parquet")
        rep = validate_dir(str(din), run_dir=str(tmp_path / "r"))
        import pandas as pd

        vio = pd.read_parquet(tmp_path / "r" / "violations")
        nk = vio[vio["rule_id"] == "STRUCT_NULL_KEY"]
        assert len(nk) == 3          # one per null-keyed row
        assert (nk["severity"] == "CRITICAL").all()
        assert rep["final_decision"] == "rejected"

    def test_anagram_texts_are_not_duplicates(self, ray_session, tmp_path):
        import datetime as dt

        import pandas as pd
        import pyarrow.parquet as pq

        from bio_data_validation_ray.pipelines.validate import validate_dir

        t0 = dt.datetime(2025, 1, 1)
        # same (conv, turn, ts) so they enter the duplicate-candidate run,
        # but the texts are transpositions the old fingerprint collided on
        tbl = self._tbl(["c1", "c1"], [0, 0], [t0, t0], ["acb", "bac"])
        din = tmp_path / "in"
        din.mkdir()
        pq.write_table(tbl, din / "s0.parquet")
        validate_dir(str(din), run_dir=str(tmp_path / "r"))
        vio = pd.read_parquet(tmp_path / "r" / "violations")
        assert (vio["rule_id"] != "DUP_001_ROW").all()
        # and a REAL exact duplicate still fires
        tbl2 = self._tbl(["c1", "c1"], [0, 0], [t0, t0], ["same", "same"])
        din2 = tmp_path / "in2"
        din2.mkdir()
        pq.write_table(tbl2, din2 / "s0.parquet")
        validate_dir(str(din2), run_dir=str(tmp_path / "r2"))
        vio2 = pd.read_parquet(tmp_path / "r2" / "violations")
        assert (vio2["rule_id"] == "DUP_001_ROW").sum() == 1

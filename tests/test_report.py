"""Markdown run-report renderer tests (report_generator.py analog)."""

from pathlib import Path

from bio_data_validation_ray.report import render_markdown


def rep(decision="rejected", **over):
    base = {
        "validation_id": "abc123",
        "input_dir": "/data/in",
        "final_decision": decision,
        "ruleset_metadata": {"rules_version": "1.2.0",
                             "rules_hash": "deadbeef", "n_rules": 18},
        "rows_scanned": 12345,
        "shards_total": 8,
        "execution_time_s": 1.23,
        "severity_counts": {"critical": 1, "error": 6, "warning": 2,
                            "info": 0},
        "rationale": "Dataset rejected due to: 1 critical issue(s)",
        "per_shard": {
            "s0.parquet": {"decision": "rejected", "rows_scanned": 100,
                           "severity_counts": {"critical": 1, "error": 6,
                                               "warning": 2, "info": 0}},
        },
        "top_issues": [
            {"rule_id": "TXT_TEXT_EMPTY", "severity": "ERROR",
             "conv_id": "c1", "turn_idx": 3, "offending_value": ""},
        ],
        "requires_review": True,
        "exact_fallback_convs": 2,
        "drift": {"s0.parquet": {"drifted": True, "ks": 0.5, "psi": 1.0}},
    }
    base.update(over)
    return base


def test_rejected_report_sections():
    md = render_markdown(rep())
    assert md.startswith("# ❌ Validation Failed")
    assert "| critical | 1 |" in md
    assert "| s0.parquet | rejected | 1 | 6 | 2 | 100 |" in md
    assert "| TXT_TEXT_EMPTY | ERROR | c1:3 |" in md
    assert "address critical and error-level issues" in md
    assert "Fix 1 critical issue(s)" in md
    assert "human-review thresholds" in md
    assert "Distribution drift detected" in md
    assert "exact cross-shard re-check" in md


def test_accepted_and_conditional_recommendations():
    md = render_markdown(rep(
        decision="accepted",
        severity_counts={"critical": 0, "error": 0, "warning": 0, "info": 0},
        requires_review=False, drift={}, exact_fallback_convs=0,
        top_issues=[],
    ))
    assert md.startswith("# ✅ Validation Passed")
    assert "ready for analysis" in md
    md2 = render_markdown(rep(
        decision="conditional_accept",
        severity_counts={"critical": 0, "error": 0, "warning": 7, "info": 0},
        requires_review=False, drift={}, exact_fallback_convs=0,
    ))
    assert "Review 7 warning(s)" in md2


def test_html_rendering():
    from bio_data_validation_ray.report import render_html

    html = render_html(rep())
    assert html.startswith("<!doctype html>")
    assert "<h1>❌ Validation Failed</h1>" in html
    assert "<th>severity</th>" in html and "<td>critical</td>" in html
    assert "<td>s0.parquet</td>" in html
    assert "<strong>" in html  # bold recommendation survived
    assert "<script" not in html
    # escaping: hostile offending values must not inject markup
    evil = rep()
    evil["top_issues"][0]["offending_value"] = "<script>alert(1)</script>"
    assert "<script>alert" not in render_html(evil)


def test_cli_markdown_format(tmp_path):
    # subprocess: cli.main owns (and shuts down) its own Ray session
    import os
    import subprocess
    import sys

    from bio_data_validation_ray.sources.transcripts import ensure_transcripts

    d = ensure_transcripts("sf0.001")
    run_dir = str(tmp_path / "r")
    r = subprocess.run(
        [sys.executable, "-m", "bio_data_validation_ray.cli", "validate", d,
         "--run-dir", run_dir, "--format", "markdown", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 1, r.stderr[-500:]  # seeded fixture rejects
    assert os.path.exists(os.path.join(run_dir, "report.md"))
    md = open(os.path.join(run_dir, "report.md")).read()
    assert md.startswith("# ❌ Validation Failed")
    assert "Per-shard verdicts" in md


class TestMlflowExport:
    REPORT = {
        "validation_id": "abc123",
        "input_dir": "/tmp/x",
        "policy": "strict",
        "final_decision": "rejected",
        "execution_time_s": 2.5,
        "turns_per_sec": 1000.0,
        "severity_counts": {"critical": 1, "error": 3, "warning": 0,
                            "info": 0},
        "ruleset_metadata": {"rules_version": "1.2.0",
                             "rules_hash": "deadbeef", "n_rules": 20},
        "stages": {"scan": {"time_s": 1.5},
                   "stats": {"time_s": 0.1, "summary": {"rows": 2500}}},
    }

    def test_file_store_layout(self, tmp_path):
        from bio_data_validation_ray.state.mlflow_export import export_run

        run_dir = export_run(dict(self.REPORT), str(tmp_path / "mlruns"))
        p = Path(run_dir)
        assert (p / "meta.yaml").exists()
        assert (p.parent / "meta.yaml").exists()  # experiment meta
        # metric files: "<ts_ms> <value> <step>" single line
        m = (p / "metrics" / "violations_critical").read_text().split()
        assert len(m) == 3 and float(m[1]) == 1.0 and m[2] == "0"
        assert float((p / "metrics" / "rows_scanned").read_text()
                     .split()[1]) == 2500.0
        assert float((p / "metrics" / "stage_scan_time_s").read_text()
                     .split()[1]) == 1.5
        assert float((p / "metrics" / "turns_per_sec").read_text()
                     .split()[1]) == 1000.0
        assert (p / "params" / "rules_hash").read_text() == "deadbeef"
        assert (p / "tags" / "decision").read_text() == "rejected"
        # run meta references the run id and FINISHED status
        meta = (p / "meta.yaml").read_text()
        assert "run_id: abc123" in meta and "status: FINISHED" in meta

    def test_idempotent_rewrite(self, tmp_path):
        from bio_data_validation_ray.state.mlflow_export import export_run

        a = export_run(dict(self.REPORT), str(tmp_path / "mlruns"))
        b = export_run(dict(self.REPORT), str(tmp_path / "mlruns"))
        assert a == b  # keyed by validation_id -> same run dir, overwritten


def test_mlflow_experiments_get_distinct_ids(tmp_path):
    """Two experiment names must land in two file-store experiment dirs
    (the hardcoded-'0' regression merged them and rewrote the name)."""
    from bio_data_validation_ray.state.mlflow_export import export_run

    rep = {"severity_counts": {"error": 1}, "stages": {},
           "final_decision": "rejected", "validation_id": "run_a"}
    d1 = export_run(rep, str(tmp_path), experiment="exp_a")
    rep2 = dict(rep, validation_id="run_b")
    d2 = export_run(rep2, str(tmp_path), experiment="exp_b")
    rep3 = dict(rep, validation_id="run_c")
    d3 = export_run(rep3, str(tmp_path), experiment="exp_a")
    import os

    e1 = os.path.relpath(d1, tmp_path).split(os.sep)[0]
    e2 = os.path.relpath(d2, tmp_path).split(os.sep)[0]
    e3 = os.path.relpath(d3, tmp_path).split(os.sep)[0]
    assert e1 != e2          # distinct names -> distinct experiment ids
    assert e1 == e3          # same name -> reused id
    with open(os.path.join(tmp_path, e1, "meta.yaml")) as fh:
        assert "name: exp_a" in fh.read()
    with open(os.path.join(tmp_path, e2, "meta.yaml")) as fh:
        assert "name: exp_b" in fh.read()

"""Review-feedback ingestion (state/feedback.py + policy.select_top_issues):
the learning half of the human-review loop — dismissed/confirmed patterns
rank below novel ones (reference: human_review_coordinator.py:364-434)."""
import pandas as pd

from bio_data_validation_ray.policy import select_top_issues
from bio_data_validation_ray.state.feedback import FeedbackStore, signature


def _sample():
    return pd.DataFrame({
        "rule_id": ["R_DISMISSED", "R_NOVEL", "R_CONFIRMED"],
        "severity": ["WARNING", "WARNING", "WARNING"],
        "column": ["c1", "c2", "c3"],
        "conv_id": ["a", "b", "c"],
    })


def _store(n: int, decision: str, rule="R_DISMISSED",
           col="c1", sev="WARNING") -> FeedbackStore:
    fb = FeedbackStore()
    for _ in range(n):
        fb.record(rule, decision, column=col, severity=sev)
    return fb


class TestUncertaintySteps:
    def test_reference_step_function(self):
        fb = FeedbackStore()
        assert fb.uncertainty("R") == 1.0                 # never reviewed
        fb.record("R", "dismissed", column="c", severity="W")
        assert fb.uncertainty("R", "c", "W") == 0.8        # <=2 feedbacks
        fb.record("R", "dismissed", column="c", severity="W")
        fb.record("R", "dismissed", column="c", severity="W")
        assert fb.uncertainty("R", "c", "W") == 0.5        # >2
        for _ in range(3):
            fb.record("R", "dismissed", column="c", severity="W")
        assert fb.uncertainty("R", "c", "W") == 0.2        # >5 consistent

    def test_inconsistent_feedback_stays_uncertain(self):
        fb = FeedbackStore()
        for d in ["dismissed", "confirmed"] * 4:
            fb.record("R", d, column="c", severity="W")
        # 8 feedbacks but consistency 0.5 -> never reaches 0.2
        assert fb.uncertainty("R", "c", "W") == 0.5

    def test_rule_only_fallback_signature(self):
        fb = FeedbackStore()
        for _ in range(7):
            fb.record("R", "dismissed")  # no column/severity recorded
        # exact signature absent -> falls back to rule-only pattern
        assert fb.uncertainty("R", "some_col", "ERROR") == 0.2

    def test_roundtrip_and_metrics(self, tmp_path):
        fb = _store(3, "dismissed")
        p = str(tmp_path / "fb.json")
        fb.save(p)
        fb2 = FeedbackStore.load(p)
        assert fb2.metrics() == {"total_feedback": 3, "learned_patterns": 1}
        assert fb2.uncertainty("R_DISMISSED", "c1", "WARNING") == 0.5
        assert FeedbackStore.load(str(tmp_path / "absent.json")) \
            .metrics()["total_feedback"] == 0

    def test_signature_format(self):
        assert signature("R", "c", "W") == "R:c:W"
        assert signature("R") == "R::"


class TestTopIssuesWithFeedback:
    def test_dismissed_rule_ranks_below_novel(self):
        """The VERDICT's acceptance: with equal severity and equal rule
        frequency, the consistently-dismissed rule's issues must rank
        BELOW never-reviewed ones."""
        sample = _sample()
        totals = {r: 5 for r in sample["rule_id"]}
        fb = _store(8, "dismissed")  # R_DISMISSED well-understood
        top = select_top_issues(sample, totals, cap=3, feedback=fb)
        order = [t["rule_id"] for t in top]
        assert order.index("R_NOVEL") < order.index("R_DISMISSED")
        # confirmed-with-consistency is equally well-understood: also
        # below novel (the reviewer already knows about it)
        fb2 = _store(8, "confirmed", rule="R_CONFIRMED", col="c3")
        for _ in range(8):
            fb2.record("R_DISMISSED", "dismissed", column="c1",
                       severity="WARNING")
        top2 = select_top_issues(sample, totals, cap=3, feedback=fb2)
        order2 = [t["rule_id"] for t in top2]
        assert order2[0] == "R_NOVEL"

    def test_no_store_keeps_flat_uncertainty_order(self):
        sample = _sample()
        totals = {"R_DISMISSED": 5, "R_NOVEL": 5, "R_CONFIRMED": 5}
        top = select_top_issues(sample, totals, cap=3)
        # without feedback the tiebreak is rule_id (stable, documented)
        assert [t["rule_id"] for t in top] == sorted(sample["rule_id"])

    def test_severity_still_dominates_feedback(self):
        """Feedback reorders WITHIN a severity band only — a dismissed
        CRITICAL still outranks a novel WARNING (flags-never-decides)."""
        sample = pd.DataFrame({
            "rule_id": ["R_CRIT", "R_WARN"],
            "severity": ["CRITICAL", "WARNING"],
            "column": ["c", "c"],
        })
        fb = _store(8, "dismissed", rule="R_CRIT", col="c", sev="CRITICAL")
        top = select_top_issues(sample, {"R_CRIT": 1, "R_WARN": 1},
                                feedback=fb)
        assert top[0]["rule_id"] == "R_CRIT"

    def test_validate_resumable_reports_top_issues(self, ray_session,
                                                   tmp_path):
        from bio_data_validation_ray.pipelines.validate import (
            validate_resumable)
        from bio_data_validation_ray.sources.transcripts import (
            ensure_transcripts)

        d = ensure_transcripts("sf0.001")
        fbp = str(tmp_path / "fb.json")
        fb = FeedbackStore()
        for _ in range(8):
            fb.record("DUP_001_ROW", "dismissed")
        fb.save(fbp)
        rep = validate_resumable(d, run_dir=str(tmp_path / "run"),
                                 files_per_pass=4, feedback_path=fbp)
        assert rep["top_issues"], "resumable report must carry top_issues"
        assert rep["review_feedback"]["total_feedback"] == 8
        # severity-first ordering holds (flags-never-decides selection)
        ranks = [t["severity"] for t in rep["top_issues"]]
        order = {"CRITICAL": 3, "ERROR": 2, "WARNING": 1, "INFO": 0}
        assert all(order[a] >= order[b]
                   for a, b in zip(ranks, ranks[1:]))

    def test_validate_dir_accepts_feedback_path(self, ray_session, tmp_path):
        from bio_data_validation_ray.pipelines.validate import validate_dir
        from bio_data_validation_ray.sources.transcripts import (
            ensure_transcripts)

        d = ensure_transcripts("sf0.001")
        fbp = str(tmp_path / "fb.json")
        fb = FeedbackStore()
        for _ in range(8):
            fb.record("DUP_001_ROW", "dismissed")
        fb.save(fbp)
        rep = validate_dir(d, run_dir=str(tmp_path / "run"),
                           feedback_path=fbp)
        assert rep["review_feedback"]["total_feedback"] == 8
        assert rep["top_issues"]  # selection still produced

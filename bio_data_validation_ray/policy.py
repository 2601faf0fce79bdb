"""Severity-count -> decision policy.

Exact re-expression of the reference's decision matrix
(src/agents/policy_engine.py:145-182; thresholds config/policy_config.yml:10-15):

    critical >= 1                     -> rejected
    errors   >= 5                     -> rejected
    errors   in 1..4                  -> conditional_accept
    warnings >= 5 and errors == 0     -> conditional_accept
    else                              -> accepted

``passed`` on a stage result means "no ERROR/CRITICAL"
(rule_validator.py:150-160). Review triggers mirror
policy_engine.py:184-208.
"""

from __future__ import annotations

from dataclasses import dataclass

ACCEPTED = "accepted"
CONDITIONAL = "conditional_accept"
REJECTED = "rejected"

DEFAULT_THRESHOLDS = {
    "reject_critical": 1,
    "reject_errors": 5,
    "conditional_errors": 1,
    "conditional_warnings": 5,
    "review_errors": 3,
    "review_warnings": 15,
}

# DecisionTable presets (decision_tables.py:258-298): strict rejects on any
# error, lenient tolerates up to 9, production mirrors the default reject
# matrix with the reference's review triggers.
PRESETS: dict[str, dict] = {
    "default": DEFAULT_THRESHOLDS,
    "strict": {**DEFAULT_THRESHOLDS, "reject_errors": 1,
               "conditional_warnings": 5},
    "lenient": {**DEFAULT_THRESHOLDS, "reject_errors": 10,
                "conditional_warnings": 20},
    "production": {**DEFAULT_THRESHOLDS, "reject_errors": 5,
                   "conditional_warnings": 10, "review_errors": 3,
                   "review_warnings": 15},
}


def thresholds_of(policy: str | dict | None) -> dict:
    """Resolve a preset name (or explicit threshold dict) to thresholds."""
    if policy is None:
        return dict(DEFAULT_THRESHOLDS)  # copies: callers must not be able
    if isinstance(policy, dict):         # to mutate the process-wide presets
        return {**DEFAULT_THRESHOLDS, **policy}
    try:
        return dict(PRESETS[policy])
    except KeyError:
        raise KeyError(
            f"unknown policy preset {policy!r}; choose from {sorted(PRESETS)}"
        ) from None


@dataclass(frozen=True)
class SeverityCounts:
    critical: int = 0
    error: int = 0
    warning: int = 0
    info: int = 0

    def __add__(self, o: "SeverityCounts") -> "SeverityCounts":
        return SeverityCounts(
            self.critical + o.critical,
            self.error + o.error,
            self.warning + o.warning,
            self.info + o.info,
        )


def decide(counts: SeverityCounts, thresholds: dict | None = None) -> str:
    t = thresholds or DEFAULT_THRESHOLDS
    if counts.critical >= t["reject_critical"]:
        return REJECTED
    if counts.error >= t["reject_errors"]:
        return REJECTED
    if counts.error >= t["conditional_errors"]:
        return CONDITIONAL
    if counts.warning >= t["conditional_warnings"]:
        return CONDITIONAL
    return ACCEPTED


def passed(counts: SeverityCounts) -> bool:
    return counts.critical == 0 and counts.error == 0


def needs_review(counts: SeverityCounts, thresholds: dict | None = None) -> bool:
    t = thresholds or DEFAULT_THRESHOLDS
    return (
        counts.critical >= 1
        or counts.error >= t["review_errors"]
        or counts.warning >= t["review_warnings"]
    )


SEVERITY_RANK = {"CRITICAL": 3, "ERROR": 2, "WARNING": 1, "INFO": 0}

# active-learning-free default: the reference returns 0.8 uncertainty for
# patterns with <=2 recorded feedbacks (human_review_coordinator.py:396-416)
# and the batch engine keeps no feedback store, so every issue sits there
DEFAULT_UNCERTAINTY = 0.8


def novelty_score(rule_count: int) -> float:
    """Novelty from within-run rule_id frequency — the batch analog of the
    reference's seen_count step function
    (human_review_coordinator.py:417-434): rules that fired rarely are more
    informative to a reviewer than the one that fired 100k times."""
    if rule_count > 100:
        return 0.1
    if rule_count > 50:
        return 0.3
    if rule_count > 10:
        return 0.5
    return 0.7


def select_top_issues(sample, rule_totals: dict[str, int],
                      cap: int = 20, feedback=None) -> list[dict]:
    """Severity- AND novelty-prioritized review selection
    (human_review_coordinator.py:364-395): CRITICAL always leads; within a
    severity band, issues from RARER rules rank first by
    informativeness = 0.6 * uncertainty + 0.4 * novelty. ``sample`` is a
    violations DataFrame; ``rule_totals`` the run-wide per-rule counts.
    ``feedback`` (a ``state.feedback.FeedbackStore``) closes the learning
    loop: patterns a reviewer has consistently confirmed/dismissed get the
    reference's low uncertainty (human_review_coordinator.py:396-416) and
    rank below never-reviewed ones; without a store every issue keeps the
    flat DEFAULT_UNCERTAINTY. Returns at most ``cap`` issue dicts with
    the scores attached."""
    import pandas as pd

    if not len(sample):
        return []
    nov = sample["rule_id"].map(
        lambda r: novelty_score(int(rule_totals.get(r, 0))))
    if feedback is not None:
        col = (sample["column"] if "column" in sample.columns
               else pd.Series([None] * len(sample), index=sample.index))
        unc = pd.Series(
            [feedback.uncertainty(r, c, s) for r, c, s in
             zip(sample["rule_id"], col, sample["severity"])],
            index=sample.index)
    else:
        unc = DEFAULT_UNCERTAINTY
    info = 0.6 * unc + 0.4 * nov
    ranked = sample.assign(
        _r=sample["severity"].map(SEVERITY_RANK),
        _info=info,
    ).sort_values(["_r", "_info", "rule_id"],
                  ascending=[False, False, True], kind="stable").head(cap)
    out = []
    for row in ranked.to_dict("records"):
        d = {k: (None if pd.isna(v) else v) for k, v in row.items()
             if k not in ("_r", "_info")}
        d["novelty"] = round(novelty_score(
            int(rule_totals.get(row["rule_id"], 0))), 3)
        d["informativeness"] = round(float(row["_info"]), 3)
        out.append(d)
    return out


def counts_from_pairs(pairs: list[tuple[str, int]]) -> SeverityCounts:
    """Build SeverityCounts from (severity, n) pairs (groupby output)."""
    m = {"CRITICAL": 0, "ERROR": 0, "WARNING": 0, "INFO": 0}
    for sev, n in pairs:
        m[sev] = m.get(sev, 0) + int(n)
    return SeverityCounts(m["CRITICAL"], m["ERROR"], m["WARNING"], m["INFO"])

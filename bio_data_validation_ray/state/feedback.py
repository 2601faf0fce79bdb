"""Human-review feedback store: the learning half of the review loop.

The reference's HumanReviewCoordinator records reviewer feedback per issue
SIGNATURE (``rule_id:field:severity`` — human_review_coordinator.py:443-454),
keeps per-pattern ``feedback_count`` / ``decisions`` / ``consistency``
(:123-141), and folds them into an uncertainty step function used by the
active-learning issue selection (:396-416: unknown pattern -> 1.0, >5
consistent feedbacks -> 0.2, >2 -> 0.5, else 0.8). This module is that
store for the batch engine: a plain JSON file a reviewer (or CI bot)
appends decisions to, loaded at report time so ``select_top_issues`` ranks
well-understood (consistently dismissed/confirmed) patterns BELOW novel
ones. It flags, never decides — the policy engine stays authoritative.

File format (one JSON object)::

    {"entries": [
        {"rule_id": "BIO_007", "column": "tool", "severity": "ERROR",
         "decision": "dismissed", "reviewer": "alice", "ts": "..."},
        ...
    ]}
"""

from __future__ import annotations

import json
import os
from collections import Counter

SIG_SEP = ":"


def signature(rule_id: str, column: str | None = None,
              severity: str | None = None) -> str:
    """``rule_id:column:severity`` — the reference's issue signature
    (human_review_coordinator.py:443-454), empty strings for absent
    parts."""
    return SIG_SEP.join([str(rule_id or ""), str(column or ""),
                         str(severity or "")])


class FeedbackStore:
    """Reviewer-feedback history + derived per-pattern uncertainty."""

    def __init__(self, entries: list[dict] | None = None):
        self.entries: list[dict] = list(entries or [])
        self._patterns: dict[str, dict] | None = None

    # ---- persistence (atomic, the repo's tmp+replace convention) ----
    @classmethod
    def load(cls, path: str) -> "FeedbackStore":
        if not os.path.exists(path):
            return cls()
        with open(path) as fh:
            raw = json.load(fh)
        return cls(raw.get("entries", []))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"entries": self.entries}, fh, indent=1)
        os.replace(tmp, path)

    def record(self, rule_id: str, decision: str, *,
               column: str | None = None, severity: str | None = None,
               reviewer: str | None = None, ts: str | None = None) -> None:
        """Append one reviewer decision ('confirmed' / 'dismissed' / any
        label — consistency is computed over whatever labels appear, as
        the reference's decisions list does)."""
        self.entries.append({
            "rule_id": rule_id, "column": column, "severity": severity,
            "decision": decision, "reviewer": reviewer, "ts": ts,
        })
        self._patterns = None

    # ---- derived patterns ----
    def patterns(self) -> dict[str, dict]:
        """signature -> {feedback_count, consistency, top_decision}
        (human_review_coordinator.py:123-141: consistency = share of the
        most common decision)."""
        if self._patterns is None:
            per_sig: dict[str, list[str]] = {}
            for e in self.entries:
                sig = signature(e.get("rule_id"), e.get("column"),
                                e.get("severity"))
                per_sig.setdefault(sig, []).append(str(e.get("decision")))
            self._patterns = {}
            for sig, decisions in per_sig.items():
                top, n_top = Counter(decisions).most_common(1)[0]
                self._patterns[sig] = {
                    "feedback_count": len(decisions),
                    "consistency": n_top / len(decisions),
                    "top_decision": top,
                }
        return self._patterns

    def uncertainty(self, rule_id: str, column: str | None = None,
                    severity: str | None = None) -> float:
        """The reference's step function (human_review_coordinator.py:
        396-416). Signatures fall back from exact to rule-only so sparse
        feedback still generalizes across columns/severities."""
        pats = self.patterns()
        for sig in (signature(rule_id, column, severity),
                    signature(rule_id)):
            p = pats.get(sig)
            if p is not None:
                if p["feedback_count"] > 5 and p["consistency"] > 0.8:
                    return 0.2
                if p["feedback_count"] > 2:
                    return 0.5
                return 0.8
        return 1.0  # never-reviewed pattern: maximum uncertainty

    def metrics(self) -> dict:
        """get_review_metrics analog (human_review_coordinator.py:154-160)."""
        return {"total_feedback": len(self.entries),
                "learned_patterns": len(self.patterns())}

"""Versioned RuleRegistry with sha256-hashed ruleset metadata.

Reference ancestors:
- YAML ruleset with version/changelog header: config/validation_rules.yml:5-23
- ruleset metadata {version, last_updated, sha256[:16], latest_changes}
  stamped into every report: src/agents/orchestrator.py:130-177
- rule routing by format: orchestrator.py:228-285 (here: rule suites by kind)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from .rules import AGG_KINDS, GROUP_KINDS, ROW_LOCAL_KINDS, RuleSpec
from .schema import ROLE_VOCAB, TOOL_NAME_PATTERN

# Sanity window for transcript timestamps (analog of the reference's
# chromosome-position plausibility bound, variant_validator.py:198-210).
TS_MIN = "2000-01-01T00:00:00"
TS_MAX = "2035-01-01T00:00:00"


@dataclass
class RuleRegistry:
    version: str
    rules: list[RuleSpec]
    changelog: list[str] = field(default_factory=list)

    @property
    def ruleset_hash(self) -> str:
        """sha256[:16] over the canonical JSON of all rule specs + version
        (orchestrator.py:155-158 hashes the rules config the same way)."""
        canon = json.dumps(
            {"version": self.version, "rules": [r.spec_dict() for r in self.rules]},
            sort_keys=True,
            separators=(",", ":"),
        )
        return hashlib.sha256(canon.encode()).hexdigest()[:16]

    def metadata(self) -> dict:
        return {
            "rules_version": self.version,
            "rules_hash": self.ruleset_hash,
            "n_rules": len(self.rules),
            "latest_changes": self.changelog[-3:],
        }

    def row_rules(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind in ROW_LOCAL_KINDS]

    def group_rules(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind in GROUP_KINDS]

    def agg_rules(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind in AGG_KINDS]

    def by_id(self, rule_id: str) -> RuleSpec:
        for r in self.rules:
            if r.rule_id == rule_id:
                return r
        raise KeyError(rule_id)


def transcript_registry() -> RuleRegistry:
    """The default transcript rule suite.

    rule_id naming mirrors the reference families (CONS_*, DUP_*, BIAS_* from
    rule_validator.py; the TXT_* rules are the transcript analogs of the
    BIO_* vocabulary/regex/length rules in bio_rules.py).
    """
    rules = [
        # --- row-local value rules (rowstage) ---
        RuleSpec("TXT_ROLE_VOCAB", "in_set", "role",
                 {"values": list(ROLE_VOCAB)}, "ERROR", "1",
                 "role must be in the closed vocabulary (BIO_002/variant chromosome-vocab analog)"),
        RuleSpec("TXT_TOOL_PATTERN", "regex", "tool",
                 {"pattern": TOOL_NAME_PATTERN}, "ERROR", "1",
                 "tool name must match ^[a-z][a-z0-9_]{0,63}$ (BIO_007 analog)"),
        RuleSpec("TXT_TOOL_ROLE", "null_unless", "tool",
                 {"other": "role", "value": "tool"}, "ERROR", "1",
                 "tool must be null unless role == 'tool' (CONS_005 cross-column analog)"),
        RuleSpec("TXT_TOOL_REQUIRED", "required_when", "tool",
                 {"other": "role", "value": "tool"}, "ERROR", "1",
                 "tool must be non-null when role == 'tool'"),
        RuleSpec("TXT_TEXT_EMPTY", "no_empty", "text", {}, "ERROR", "1",
                 "text must be non-empty (BIO_006 analog)"),
        RuleSpec("TXT_TEXT_NULL", "not_null", "text", {}, "ERROR", "1",
                 "text must be non-null"),
        RuleSpec("CONS_003_TURN_MIN", "range", "turn_idx",
                 {"min": 0}, "ERROR", "1",
                 "turn_idx must be >= 0 (CONS_003 numeric-range analog)"),
        RuleSpec("TXT_TS_WINDOW", "ts_window", "ts",
                 {"min": TS_MIN, "max": TS_MAX}, "ERROR", "1",
                 "ts must fall in the sanity window (position-plausibility analog)"),
        RuleSpec("TXT_TEXT_MAXLEN", "length_range", "text",
                 {"max": 1_000_000}, "WARNING", "1",
                 "text longer than 1MB chars is suspicious (BIO_001 length-band analog)"),
        # --- group rules (convstage) ---
        RuleSpec("DUP_002_TURN_KEY", "unique_key", "turn_idx",
                 {"group": "conv_id"}, "ERROR", "1",
                 "(conv_id, turn_idx) must be unique (DUP_002 key-uniqueness analog)"),
        RuleSpec("TXT_TURN_CONTIG", "contiguous_in_group", "turn_idx",
                 {"group": "conv_id"}, "ERROR", "1",
                 "turn_idx must be 0..n-1 contiguous within a conversation"),
        RuleSpec("TXT_TS_MONOTONIC", "monotonic_ts_in_group", "ts",
                 {"group": "conv_id", "order_by": "turn_idx"}, "WARNING", "1",
                 "ts must be non-decreasing in turn order within a conversation"),
        RuleSpec("TXT_CONV_SINGLE_SHARD", "single_shard_group", "conv_id",
                 {"group": "conv_id"}, "CRITICAL", "1",
                 "a conv_id must not span shards (ref-genome consistency analog, "
                 "variant_validator.py:394-429)"),
        RuleSpec("DUP_001_ROW", "row_dup", None, {}, "WARNING", "1",
                 "whole-row exact duplicates (DUP_001 analog)"),
        # --- aggregate/statistical rules (statstage) ---
        RuleSpec("BIAS_002_TEXT_MISSING", "missing_rate", "text",
                 {"threshold": 0.1}, "WARNING", "1",
                 "fraction of null text above threshold (BIAS_002 analog)"),
        RuleSpec("BIAS_001_ROLE_BALANCE", "class_balance", "role",
                 {"threshold": 0.02}, "WARNING", "1",
                 "minimum role proportion below threshold (BIAS_001 analog)"),
        RuleSpec("BIAS_001B_LEN_QUARTILES", "quantile_balance", "text_len",
                 {"threshold": 0.05, "q": 4}, "WARNING", "1",
                 "minimum text-length quartile proportion below threshold "
                 "(BIAS_001B continuous-imbalance analog, "
                 "rule_validator.py:355-371; bins from t-digest quantiles)"),
        RuleSpec("STAT_GLOBAL_OUTLIER", "global_outlier", "text_len",
                 {"sigma": 5.0, "pct_max": 5.0}, "WARNING", "1",
                 "more than pct_max% of text lengths beyond sigma std devs "
                 "of the global mean (matrix_validator.py:536-563 analog; "
                 "moments + t-digest tail mass, single pass)"),
        RuleSpec("BIAS_004_TOOL_MISSING_BY_SHARD", "missing_rate_by_group",
                 "tool", {"threshold": 0.2}, "ERROR", "1",
                 "per-shard tool-null-fraction dispersion above threshold "
                 "(missing-rate-by-batch std analog, "
                 "sample_metadata_validator.py:544-585)"),
        RuleSpec("DRIFT_TEXT_LEN", "drift", "text_len",
                 {"psi_threshold": 0.2, "ks_threshold": 0.2}, "WARNING", "1",
                 "text-length distribution drift vs baseline (KS + PSI; north_star)"),
    ]
    return RuleRegistry(
        version="1.2.0",
        rules=rules,
        changelog=[
            "1.0.0: initial transcript rule suite (row, conversation, aggregate, drift)",
            "1.1.0: BIAS_001B quantile imbalance + global outlier aggregate rules",
            "1.2.0: per-shard missing-rate dispersion rule (BIAS_004)",
        ],
    )


def to_yaml(registry: RuleRegistry) -> str:
    """Serialize a registry to the reference's YAML shape: version/changelog
    header + rule list (config/validation_rules.yml:5-23)."""
    import yaml

    doc = {
        "version": registry.version,
        "changelog": list(registry.changelog),
        "rules": [r.spec_dict() | {"description": r.description}
                  for r in registry.rules],
    }
    return yaml.safe_dump(doc, sort_keys=False)


def from_yaml(text: str) -> RuleRegistry:
    """Load a versioned ruleset from YAML (callable params are not
    expressible in YAML; use the 'pandas_expr' kind for custom predicates,
    the analog of the reference's CUSTOM_* query-string rules,
    rule_validator.py:409-436)."""
    import yaml

    doc = yaml.safe_load(text)
    rules = [
        RuleSpec(
            rule_id=r["rule_id"],
            kind=r["kind"],
            column=r.get("column"),
            params=r.get("params", {}),
            severity=r.get("severity", "ERROR"),
            version=str(r.get("version", "1")),
            description=r.get("description", ""),
        )
        for r in doc["rules"]
    ]
    return RuleRegistry(
        version=str(doc.get("version", "0")),
        rules=rules,
        changelog=list(doc.get("changelog", [])),
    )

"""Unit tests for the pure (no-Ray) core: schema checks, rule compiler,
policy matrix, registry hashing."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from bio_data_validation_ray import policy, registry, rules, schema


def make_table(**over):
    base = {
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": ["system", "user", "tool"],
        "text": ["hello", "hi there", "result"],
        "tool": [None, None, "search_web"],
        "ts": pa.array(
            [dt.datetime(2025, 1, 1, 0, 0, i) for i in range(3)],
            type=pa.timestamp("us"),
        ),
    }
    base.update(over)
    return pa.table(base)


class TestSchema:
    def test_clean_schema_passes(self):
        res = schema.check_schema(make_table().schema)
        assert res.passed and not res.issues

    def test_missing_column_cons_001(self):
        t = make_table().drop_columns(["tool"])
        res = schema.check_schema(t.schema)
        assert not res.passed
        assert any(i.rule_id == "CONS_001" and i.column == "tool" for i in res.issues)

    def test_type_family_mismatch_cons_002(self):
        t = make_table(turn_idx=pa.array(["0", "1", "0"]))
        res = schema.check_schema(t.schema)
        assert any(i.rule_id == "CONS_002" and i.column == "turn_idx" for i in res.issues)

    def test_int64_ok_loose_bad_strict(self):
        t = make_table(turn_idx=pa.array([0, 1, 0], type=pa.int64()))
        assert schema.check_schema(t.schema).passed
        assert not schema.check_schema(t.schema, strict_types=True).passed


class TestStructure:
    def test_empty_is_critical(self):
        res = schema.check_structure(0, 6)
        assert not res.passed
        assert res.issues[0].rule_id == "STRUCT_001"
        assert res.issues[0].severity == "CRITICAL"

    def test_min_rows_error(self):
        res = schema.check_structure(1, 6, min_rows=2)
        assert not res.passed and res.issues[0].rule_id == "STRUCT_002"

    def test_min_cols_error(self):
        res = schema.check_structure(10, 0)
        assert not res.passed and res.issues[0].rule_id == "STRUCT_003"

    def test_ok(self):
        assert schema.check_structure(10, 6).passed


class TestRowRules:
    def reg(self):
        return registry.transcript_registry()

    def run_rule(self, rule_id, table):
        spec = self.reg().by_id(rule_id)
        return rules.compile_rule(spec)(table).to_pylist()

    def test_role_vocab(self):
        t = make_table(role=["system", "narrator", "tool"])
        assert self.run_rule("TXT_ROLE_VOCAB", t) == [False, True, False]

    def test_tool_pattern(self):
        t = make_table(tool=["Bad Tool!", None, "ok_tool_2"])
        assert self.run_rule("TXT_TOOL_PATTERN", t) == [True, False, False]

    def test_tool_null_unless_role_tool(self):
        t = make_table(tool=["sneaky", None, "search_web"])
        # row0 role=system with tool set -> violation
        assert self.run_rule("TXT_TOOL_ROLE", t) == [True, False, False]

    def test_tool_required_when_role_tool(self):
        t = make_table(tool=[None, None, None])
        assert self.run_rule("TXT_TOOL_REQUIRED", t) == [False, False, True]

    def test_text_empty_and_null(self):
        t = make_table(text=["", None, "x"])
        assert self.run_rule("TXT_TEXT_EMPTY", t) == [True, False, False]
        assert self.run_rule("TXT_TEXT_NULL", t) == [False, True, False]

    def test_turn_range(self):
        t = make_table(turn_idx=pa.array([-3, 0, 5], type=pa.int32()))
        assert self.run_rule("CONS_003_TURN_MIN", t) == [True, False, False]

    def test_ts_window(self):
        t = make_table(
            ts=pa.array(
                [
                    dt.datetime(1970, 1, 2),
                    dt.datetime(2025, 6, 1),
                    dt.datetime(2200, 1, 1),
                ],
                type=pa.timestamp("us"),
            )
        )
        assert self.run_rule("TXT_TS_WINDOW", t) == [True, False, True]

    def test_compare_rule(self):
        spec = rules.RuleSpec("X", "compare", "a", {"other": "b", "op": "<"})
        t = pa.table({"a": [1, 5, None], "b": [2, 2, 2]})
        assert rules.compile_rule(spec)(t).to_pylist() == [False, True, False]

    def test_custom_rule(self):
        spec = rules.RuleSpec(
            "X", "custom", "a", {"fn": lambda t: pa.compute.greater(t["a"], 1)}
        )
        t = pa.table({"a": [0, 2]})
        assert rules.compile_rule(spec)(t).to_pylist() == [False, True]


class TestPolicy:
    # straight from the reference matrix (policy_config.yml:166-189)
    @pytest.mark.parametrize(
        "crit,err,warn,expected",
        [
            (0, 0, 0, policy.ACCEPTED),
            (0, 0, 4, policy.ACCEPTED),
            (0, 0, 5, policy.CONDITIONAL),
            (0, 1, 0, policy.CONDITIONAL),
            (0, 4, 99, policy.CONDITIONAL),
            (0, 5, 0, policy.REJECTED),
            (1, 0, 0, policy.REJECTED),
            (2, 9, 9, policy.REJECTED),
        ],
    )
    def test_matrix(self, crit, err, warn, expected):
        c = policy.SeverityCounts(critical=crit, error=err, warning=warn)
        assert policy.decide(c) == expected

    def test_passed(self):
        assert policy.passed(policy.SeverityCounts(warning=100, info=5))
        assert not policy.passed(policy.SeverityCounts(error=1))

    # DecisionTable presets (decision_tables.py:262-298): strict rejects on
    # any error, lenient tolerates up to 9 errors / 19 warnings, production
    # mirrors the default reject matrix with a 10-warning conditional bar
    @pytest.mark.parametrize(
        "preset,crit,err,warn,expected",
        [
            ("strict", 0, 1, 0, policy.REJECTED),
            ("strict", 0, 0, 5, policy.CONDITIONAL),
            ("strict", 0, 0, 4, policy.ACCEPTED),
            ("strict", 1, 0, 0, policy.REJECTED),
            ("lenient", 0, 9, 0, policy.CONDITIONAL),
            ("lenient", 0, 10, 0, policy.REJECTED),
            ("lenient", 0, 0, 19, policy.ACCEPTED),
            ("lenient", 0, 0, 20, policy.CONDITIONAL),
            ("lenient", 1, 0, 0, policy.REJECTED),
            ("production", 0, 4, 0, policy.CONDITIONAL),
            ("production", 0, 5, 0, policy.REJECTED),
            ("production", 0, 0, 9, policy.ACCEPTED),
            ("production", 0, 0, 10, policy.CONDITIONAL),
        ],
    )
    def test_presets(self, preset, crit, err, warn, expected):
        c = policy.SeverityCounts(critical=crit, error=err, warning=warn)
        assert policy.decide(c, policy.thresholds_of(preset)) == expected

    def test_thresholds_of_accepts_dict_and_rejects_unknown(self):
        t = policy.thresholds_of({"reject_errors": 2})
        assert t["reject_errors"] == 2 and t["reject_critical"] == 1
        with pytest.raises(KeyError):
            policy.thresholds_of("nope")


class TestRegistry:
    def test_hash_stable_and_sensitive(self):
        r1 = registry.transcript_registry()
        r2 = registry.transcript_registry()
        assert r1.ruleset_hash == r2.ruleset_hash
        assert len(r1.ruleset_hash) == 16
        r2.rules = r2.rules[:-1]
        assert r1.ruleset_hash != r2.ruleset_hash

    def test_partition_of_kinds(self):
        r = registry.transcript_registry()
        ids = {s.rule_id for s in r.rules}
        assert len(ids) == len(r.rules)
        covered = r.row_rules() + r.group_rules() + r.agg_rules()
        assert len(covered) == len(r.rules)

"""Declarative rule specs compiled to vectorized pyarrow.compute predicates.

Each row-local rule compiles to ``fn(pa.Table) -> pa.BooleanArray`` where True
marks a VIOLATING row. Nulls never violate value-shape rules (null-ness is its
own ``not_null`` rule), mirroring the reference's mask construction
(bio_rules.py:124-260 builds masks on non-null values).

Reference ancestors per kind (file:line in /root/reference):
- not_null        schema_validator.py:323-333
- no_empty        bio_rules.py:124-132 (BIO_006)
- in_set          variant_validator.py:145-164; bio_rules.py:264-310
- regex           bio_rules.py:136-144 (BIO_007), sample_metadata_validator.py:309-364
- contains        bio_rules.py:148-156 (BIO_008), :230-239 (BIO_004)
- range           rule_validator.py:203-229 (CONS_003/004); length band bio_rules.py:163-195
- length_range    bio_rules.py:163-195 (BIO_001A/B/C)
- ts_window       variant_validator.py:186-212 (position plausibility)
- compare         rule_validator.py:232-250 (CONS_005)
- null_unless     bio_rules.py:198-213 (BIO_002 conditional-by-group pattern)
- required_when   schema_validator.py:309-320
- custom          rule_validator.py:409-436 (CUSTOM_* pandas-query escape hatch)

Group-level kinds (unique_key, contiguous_in_group, monotonic_ts_in_group,
single_shard_group, row_dup) are evaluated by stages/convstage.py; aggregate
kinds (missing_rate, class_balance) by stages/statstage.py. Their specs still
live in the registry so the ruleset hash covers the full suite.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

ROW_LOCAL_KINDS = {
    "not_null",
    "no_empty",
    "in_set",
    "regex",
    "not_contains",
    "range",
    "length_range",
    "ts_window",
    "compare",
    "null_unless",
    "required_when",
    "finite",
    "pandas_expr",
    "custom",
}
GROUP_KINDS = {
    "unique_key",
    "contiguous_in_group",
    "monotonic_ts_in_group",
    "single_shard_group",
    "row_dup",
}
AGG_KINDS = {"missing_rate", "class_balance", "drift", "skewness",
             "quantile_balance", "global_outlier", "missing_rate_by_group",
             "near_dup"}


@dataclass(frozen=True)
class RuleSpec:
    rule_id: str
    kind: str
    column: str | None
    params: dict[str, Any] = field(default_factory=dict)
    severity: str = "ERROR"
    version: str = "1"
    description: str = ""

    def __post_init__(self):
        # fail at LOAD time, not at the verdict stage after a full scan:
        # an unknown severity (e.g. YAML 'FATAL' or lowercase 'error')
        # would otherwise KeyError in the severity lattice at the end
        sev = str(self.severity).upper()
        if sev not in ("CRITICAL", "ERROR", "WARNING", "INFO"):
            raise ValueError(
                f"rule {self.rule_id}: unknown severity {self.severity!r} "
                f"(expected CRITICAL/ERROR/WARNING/INFO)")
        object.__setattr__(self, "severity", sev)

    def spec_dict(self) -> dict[str, Any]:
        # canonical, hash-stable representation (callables excluded)
        p = {k: v for k, v in self.params.items() if not callable(v)}
        return {
            "rule_id": self.rule_id,
            "kind": self.kind,
            "column": self.column,
            "params": p,
            "severity": self.severity,
            "version": self.version,
        }


def _no_nulls(mask: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Null mask entries -> False (nulls never violate value rules)."""
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return pc.fill_null(mask, False)


def compile_rule(spec: RuleSpec) -> Callable[[pa.Table], pa.Array]:
    """Compile a row-local RuleSpec to a vectorized violation-mask function."""
    kind, col, p = spec.kind, spec.column, spec.params

    if kind == "not_null":
        return lambda t: pc.is_null(t[col]).combine_chunks()

    if kind == "no_empty":

        def f(t: pa.Table) -> pa.Array:
            return _no_nulls(pc.equal(pc.utf8_length(t[col]), 0))

        return f

    if kind == "in_set":
        vocab = pa.array(list(p["values"]), type=pa.string())

        def f(t: pa.Table) -> pa.Array:
            c = t[col]
            return _no_nulls(
                pc.and_(pc.is_valid(c), pc.invert(pc.is_in(c, value_set=vocab)))
            )

        return f

    if kind == "regex":
        pattern = p["pattern"]

        def f(t: pa.Table) -> pa.Array:
            c = t[col]
            ok = pc.match_substring_regex(c, pattern)
            return _no_nulls(pc.and_(pc.is_valid(c), pc.invert(ok)))

        return f

    if kind == "not_contains":
        needle = p["substring"]

        def f(t: pa.Table) -> pa.Array:
            return _no_nulls(pc.match_substring(t[col], needle))

        return f

    if kind == "range":
        lo, hi = p.get("min"), p.get("max")

        def f(t: pa.Table) -> pa.Array:
            c = t[col]
            mask = None
            if lo is not None:
                mask = pc.less(c, lo)
            if hi is not None:
                m2 = pc.greater(c, hi)
                mask = m2 if mask is None else pc.or_(mask, m2)
            return _no_nulls(mask)

        return f

    if kind == "length_range":
        lo, hi = p.get("min"), p.get("max")

        def f(t: pa.Table) -> pa.Array:
            n = pc.utf8_length(t[col])
            mask = None
            if lo is not None:
                mask = pc.less(n, lo)
            if hi is not None:
                m2 = pc.greater(n, hi)
                mask = m2 if mask is None else pc.or_(mask, m2)
            return _no_nulls(mask)

        return f

    if kind == "ts_window":
        import datetime as _dt

        def _to_ts(v):
            if isinstance(v, str):
                v = _dt.datetime.fromisoformat(v)
            return pa.scalar(v, type=pa.timestamp("us"))

        lo = _to_ts(p["min"])
        hi = _to_ts(p["max"])

        def f(t: pa.Table) -> pa.Array:
            c = t[col]
            if not pa.types.is_timestamp(c.type):
                c = pc.cast(c, pa.timestamp("us"))
            return _no_nulls(pc.or_(pc.less(c, lo), pc.greater(c, hi)))

        return f

    if kind == "compare":
        other, op = p["other"], p["op"]
        ops = {
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
            "==": pc.equal,
            "!=": pc.not_equal,
        }
        cmp = ops[op]

        def f(t: pa.Table) -> pa.Array:
            # violation = NOT (col op other), null-skipping
            return _no_nulls(pc.invert(cmp(t[col], t[other])))

        return f

    if kind == "null_unless":
        other, value = p["other"], p["value"]

        def f(t: pa.Table) -> pa.Array:
            # column must be null unless other == value
            return _no_nulls(
                pc.and_(pc.is_valid(t[col]), pc.not_equal(t[other], value))
            )

        return f

    if kind == "required_when":
        other, value = p["other"], p["value"]

        def f(t: pa.Table) -> pa.Array:
            return _no_nulls(pc.and_(pc.is_null(t[col]), pc.equal(t[other], value)))

        return f

    if kind == "finite":
        # infinite/NaN values in a float column (matrix_validator.py:393-408)
        def f(t: pa.Table) -> pa.Array:
            c = t[col]
            bad = pc.or_(pc.is_inf(c), pc.is_nan(c))
            return _no_nulls(bad)

        return f

    if kind == "pandas_expr":
        # declarative expression escape hatch, YAML-safe — the analog of the
        # reference's CUSTOM_* pandas-query rules (rule_validator.py:409-436,
        # config/validation_rules.yml:112-126). Violation = NOT expr.
        expr = p["expr"]

        def f(t: pa.Table) -> pa.Array:
            df = t.to_pandas()
            ok = df.eval(expr)
            mask = ~ok.fillna(True).astype(bool)
            return pa.array(mask.to_numpy(), type=pa.bool_())

        return f

    if kind == "custom":
        fn = p["fn"]  # fn(pa.Table) -> BooleanArray; user escape hatch

        def f(t: pa.Table) -> pa.Array:
            return _no_nulls(fn(t))

        return f

    raise ValueError(f"rule kind {kind!r} is not row-local (or unknown)")


@dataclass
class CompiledRule:
    spec: RuleSpec
    mask_fn: Callable[[pa.Table], pa.Array]


def compile_row_rules(specs: list[RuleSpec]) -> list[CompiledRule]:
    return [
        CompiledRule(s, compile_rule(s)) for s in specs if s.kind in ROW_LOCAL_KINDS
    ]

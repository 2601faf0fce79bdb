"""Declared logical schemas + driver-side (DRV) schema checks.

Reference ancestors:
- required-columns rule CONS_001: rule_validator.py:179-187
- column-type rule CONS_002: rule_validator.py:190-200 (type map :438-450)
- tabular structural checks: schema_validator.py:410-442

These are metadata-only checks against ``Dataset.schema()`` / a Parquet
footer — no scan is needed, mirroring the reference's pre-scan short-circuit
(orchestrator.py:366-371).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

SEVERITIES = ("INFO", "WARNING", "ERROR", "CRITICAL")
SEVERITY_RANK = {s: i for i, s in enumerate(SEVERITIES)}

# The one logical input table of the engine (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("tool", pa.string(), nullable=True),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)

ROLE_VOCAB = ("system", "user", "assistant", "tool")
TOOL_NAME_PATTERN = r"^[a-z][a-z0-9_]{0,63}$"

# Violation-row schema — the scale-out generalization of the reference's
# ValidationIssue (base_schemas.py:266-273): full rows, not counts+examples.
VIOLATION_FIELDS = [
    ("rule_id", pa.string()),
    ("rule_version", pa.string()),
    ("severity", pa.string()),
    ("column", pa.string()),
    ("offending_value", pa.string()),
]


@dataclass
class SchemaIssue:
    rule_id: str
    column: str
    message: str
    severity: str = "ERROR"


@dataclass
class SchemaCheckResult:
    passed: bool
    issues: list[SchemaIssue] = field(default_factory=list)


# Loose family buckets so int32 vs int64 drift is reported distinctly from
# e.g. string-vs-int (the reference maps YAML names to pandas dtype families,
# rule_validator.py:438-450; Arrow gives exact types so we check both levels).
def _family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def check_schema(
    actual: pa.Schema,
    declared: pa.Schema = TRANSCRIPT_SCHEMA,
    *,
    strict_types: bool = False,
    allow_extra: bool = True,
) -> SchemaCheckResult:
    """Validate an observed Arrow schema against the declared logical schema.

    CONS_001: every declared column must be present (ERROR, short-circuits the
    run in the pipeline, like orchestrator.py:366-371).
    CONS_002: types must match — same family always; exact Arrow type only
    when ``strict_types`` (the reference only checks pandas dtype families).
    Duplicate column names are an ERROR (schema_validator.py:418-424).
    """
    issues: list[SchemaIssue] = []
    names = list(actual.names)
    seen: set[str] = set()
    for n in names:
        if n in seen:
            issues.append(
                SchemaIssue("CONS_000_DUP_COL", n, f"duplicate column name {n!r}")
            )
        seen.add(n)
    for f in declared:
        if f.name not in seen:
            issues.append(
                SchemaIssue("CONS_001", f.name, f"required column {f.name!r} missing")
            )
            continue
        at = actual.field(f.name).type
        if strict_types:
            if at != f.type:
                issues.append(
                    SchemaIssue(
                        "CONS_002", f.name, f"type {at} != declared {f.type}"
                    )
                )
        elif _family(at) != _family(f.type):
            issues.append(
                SchemaIssue(
                    "CONS_002",
                    f.name,
                    f"type family {_family(at)} != declared {_family(f.type)}",
                )
            )
    if not allow_extra:
        declared_names = set(declared.names)
        for n in names:
            if n not in declared_names:
                issues.append(
                    SchemaIssue("CONS_000_EXTRA", n, f"undeclared column {n!r}", "WARNING")
                )
    passed = not any(SEVERITY_RANK[i.severity] >= SEVERITY_RANK["ERROR"] for i in issues)
    return SchemaCheckResult(passed=passed, issues=issues)


def check_structure(n_rows: int, n_cols: int, *, min_rows: int = 2,
                    min_cols: int = 1) -> SchemaCheckResult:
    """Structural DRV check (matrix_validator.py:225-253 /
    schema_validator.py:132-208): empty input is CRITICAL; fewer than
    ``min_rows`` rows or ``min_cols`` columns is an ERROR. Driver-side
    metadata only — ``n_rows`` comes from ``ds.count()`` or Parquet footer
    row counts, never a scan."""
    issues: list[SchemaIssue] = []
    if n_rows == 0:
        issues.append(SchemaIssue(
            "STRUCT_001", None, "input has no rows", "CRITICAL"))
    elif n_rows < min_rows:
        issues.append(SchemaIssue(
            "STRUCT_002", None,
            f"only {n_rows} rows (< required {min_rows})"))
    if n_cols < min_cols:
        issues.append(SchemaIssue(
            "STRUCT_003", None,
            f"only {n_cols} columns (< required {min_cols})"))
    passed = not any(
        SEVERITY_RANK[i.severity] >= SEVERITY_RANK["ERROR"] for i in issues
    )
    return SchemaCheckResult(passed=passed, issues=issues)


def violation_schema(key_fields: list[tuple[str, pa.DataType]]) -> pa.Schema:
    """Violation-row schema for a table keyed by ``key_fields``."""
    return pa.schema(
        [pa.field(n, t) for n, t in key_fields]
        + [pa.field(n, t) for n, t in VIOLATION_FIELDS]
    )


TRANSCRIPT_KEY_FIELDS: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
]

TRANSCRIPT_VIOLATION_SCHEMA = violation_schema(TRANSCRIPT_KEY_FIELDS)

"""Regression: DUP_001 run grouping must break on (conv_id, turn_idx, ts)
key changes, not only on position gaps — identical content in adjacent
conversations is NOT a duplicate row (reference semantics: duplicates are
whole-row, i.e. key + content; rule_validator.py:261-271)."""

import datetime as dt

import pyarrow as pa

from bio_data_validation_ray.stages.rowstage import ValidateBatch


def _dup_rows(t: pa.Table):
    df = ValidateBatch()(t).to_pandas()
    return df[(df["kind"] == "violation") & (df["rule_id"] == "DUP_001_ROW")]


def test_adjacent_convs_identical_content_not_merged():
    ts = dt.datetime(2025, 1, 1)
    t = pa.table({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": pa.array([0, 0, 0, 0], type=pa.int32()),
        "role": ["user"] * 4,
        "text": ["same content"] * 4,
        "tool": pa.array([None] * 4, type=pa.string()),
        "ts": pa.array([ts] * 4, type=pa.timestamp("us")),
    })
    dup = _dup_rows(t)
    # one extra copy per conversation — NOT 3 (which the merged-run bug gave)
    assert len(dup) == 2
    assert sorted(dup["conv_id"]) == ["c1", "c2"]


def test_same_conv_distinct_turns_identical_content_not_dup():
    ts = dt.datetime(2025, 1, 1)
    t = pa.table({
        "conv_id": ["c1", "c1"],
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "role": ["user", "user"],
        "text": ["same", "same"],
        "tool": pa.array([None, None], type=pa.string()),
        "ts": pa.array([ts, ts], type=pa.timestamp("us")),
    })
    assert len(_dup_rows(t)) == 0


def test_triple_copy_counts_two_extras():
    ts = dt.datetime(2025, 1, 1)
    t = pa.table({
        "conv_id": ["c1"] * 3,
        "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
        "role": ["user"] * 3,
        "text": ["x"] * 3,
        "tool": pa.array([None] * 3, type=pa.string()),
        "ts": pa.array([ts] * 3, type=pa.timestamp("us")),
    })
    assert len(_dup_rows(t)) == 2

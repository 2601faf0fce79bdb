"""End-to-end training-data curation over a documents table — the composed
flagship of the LLM-pipeline operators: C4-style quality filtering, then
duplicate canonicalization (exact text AND shingle-set-identical near
duplicates collapse to the smallest quality-kept doc_id). The whole
decision is deterministic and SQL-statable, so the full pipeline carries a
hash oracle (queries.doc_curate).

Per-document verdict:
  - quality-failed docs drop with their first failing rule as the reason;
  - among quality-kept docs, the canonical copy of each 5-gram shingle-set
    group (min doc_id) is kept;
  - non-canonical copies drop as 'exact_dup' when a smaller-id quality-kept
    doc has IDENTICAL TEXT, else 'near_dup' (identical shingle set, text
    differs — Jaccard exactly 1.0).

Scale shape: one scan derives (doc_id, reason, text_hash, set_hash); group
minima come from the keyed reduce; minima attach back via Ray hash joins
(both sides compact key/id columns — text never joins). Reference ancestor:
DUP_001/003/004 (rule_validator.py:261-322) + derived-scalar quality rules
(bio_rules.py:216-227), composed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import char_shingles_batch
from ..functions.textstats import add_quality_filter
from ..sketches import _hash64

CURATE_COLS = ["doc_id", "keep", "stage"]


def _derive(t: pa.Table, col: str, quality_kwargs: dict) -> pa.Table:
    """One pass: quality reason + text hash + shingle-set hash per doc."""
    q = add_quality_filter(t, col, **quality_kwargs)
    texts = t[col].to_pylist()
    cat, lens = char_shingles_batch(texts)
    off = np.concatenate([[0], np.cumsum(lens)])
    set_keys = np.array([cat[off[i]:off[i + 1]].tobytes()
                         for i in range(len(lens))], dtype=object)
    set_hash = _hash64(set_keys).astype(np.int64)
    text_hash = _hash64(np.asarray(texts, dtype=object)).astype(np.int64)
    return pa.table({
        "doc_id": t["doc_id"].cast(pa.int64()),
        "reason": q["reason"],
        "text_hash": pa.array(text_hash, type=pa.int64()),
        "set_hash": pa.array(set_hash, type=pa.int64()),
    })


def _verdict_frame(docs: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, reason, set_canon, text_canon) -> (doc_id, keep, stage)."""
    quality_fail = docs["reason"] != ""
    canonical = (~quality_fail) & (docs["doc_id"] == docs["set_canon"])
    exact_dup = (~quality_fail) & (~canonical) & (
        docs["text_canon"] < docs["doc_id"]
    )
    stage = np.where(
        quality_fail, docs["reason"],
        np.where(canonical, "",
                 np.where(exact_dup, "exact_dup", "near_dup")),
    )
    return pd.DataFrame({
        "doc_id": docs["doc_id"].astype(np.int64),
        "keep": canonical.to_numpy(),
        "stage": stage,
    })


def curate_documents(ds, *, col: str = "text", out_dir: str | None = None,
                     nparts: int = 8, driver_cap: int = 5_000_000,
                     **quality_kwargs) -> pd.DataFrame:
    """Curate a documents Dataset.

    ``out_dir=None`` (query/test scale): returns the full per-document
    verdict DataFrame[(doc_id, keep, stage)] sorted by doc_id.

    ``out_dir`` set (the 100 TB path): verdicts never collect — the group
    minima attach via Ray hash joins (compact key/id columns; text never
    joins), the verdict Dataset writes to ``out_dir`` with deterministic
    idempotent part names, and only per-stage COUNTS return."""
    from ..stages.keyed_reduce import keyed_reduce, keyed_reduce_pandas

    derived = ds.map_batches(
        lambda t: _derive(t, col, quality_kwargs), batch_format="pyarrow"
    ).materialize()

    # pyarrow-format filters: empty pandas blocks lose their schema, which
    # breaks the downstream hash joins (same Ray 2.49 issue as
    # dedup._join_payloads); arrow filter keeps the schema on empty blocks.
    # Materialized: three consumers (two minima reduces + the join) would
    # otherwise re-run the filter scan three times.
    kept = derived.map_batches(
        lambda t: t.filter(pc.equal(t["reason"], "")),
        batch_format="pyarrow",
    ).materialize()

    if out_dir is None:
        set_min = keyed_reduce_pandas(
            kept, ["set_hash"], {"set_canon": ("doc_id", "min")},
            driver_cap=driver_cap, batch_format="pyarrow",
        )
        text_min = keyed_reduce_pandas(
            kept, ["text_hash"], {"text_canon": ("doc_id", "min")},
            driver_cap=driver_cap, batch_format="pyarrow",
        )
        # an all-quality-failed input leaves the minima without columns
        if "set_hash" not in set_min.columns:
            set_min = pd.DataFrame({"set_hash": pd.Series(dtype=np.int64),
                                    "set_canon": pd.Series(dtype=np.int64)})
        if "text_hash" not in text_min.columns:
            text_min = pd.DataFrame(
                {"text_hash": pd.Series(dtype=np.int64),
                 "text_canon": pd.Series(dtype=np.int64)})
        # attach group minima back with a vectorized merge (compact frames)
        docs = derived.to_pandas()
        if "set_hash" not in docs.columns:  # empty input dataset
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "keep": pd.Series(dtype=bool),
                                 "stage": pd.Series(dtype=object)})
        docs = docs.merge(set_min, on="set_hash", how="left")
        docs = docs.merge(text_min, on="text_hash", how="left")
        return _verdict_frame(docs).sort_values("doc_id") \
            .reset_index(drop=True)

    import ray.data as rd

    from ..sources.writers import write_parquet_idempotent
    from ..stages.keyed_reduce import combine_low_card

    # .repartition before joins: Ray 2.49's hash join breaks on empty
    # blocks (functions/dedup._join_payloads has the same note)
    quality_vio = derived.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["reason"], ""))),
        batch_format="pyarrow",
    ).map_batches(
        lambda df: _verdict_frame(df.assign(set_canon=-1, text_canon=-1)),
        batch_format="pandas",
    )
    if kept.count() == 0:
        # all docs quality-failed: nothing to canonicalize, and Ray's hash
        # join would crash on the schemaless empty side
        verdicts = quality_vio.materialize()
    else:
        # the at-scale path keeps the group minima DISTRIBUTED (interior
        # Dataset + compact boundary stitch): collecting one row per
        # distinct hash to the driver is O(#documents) for mostly-unique
        # corpora — exactly what this branch exists to avoid
        si, sb = keyed_reduce(kept, ["set_hash"],
                              {"set_canon": ("doc_id", "min")},
                              batch_format="pyarrow")
        set_min_ds = (si.union(rd.from_pandas(sb)) if len(sb) else si)
        ti_, tb = keyed_reduce(kept, ["text_hash"],
                               {"text_canon": ("doc_id", "min")},
                               batch_format="pyarrow")
        text_min_ds = (ti_.union(rd.from_pandas(tb)) if len(tb) else ti_)
        kept_joined = (
            kept.repartition(nparts)
            .join(set_min_ds.repartition(nparts), "inner", nparts,
                  on=("set_hash",))
            .repartition(nparts)
            .join(text_min_ds.repartition(nparts), "inner", nparts,
                  on=("text_hash",))
        )
        kept_verdicts = kept_joined.map_batches(
            _verdict_frame, batch_format="pandas"
        )
        verdicts = quality_vio.union(kept_verdicts).materialize()
    write_parquet_idempotent(verdicts, out_dir, prefix="curate")
    counts = combine_low_card(verdicts, ["stage"],
                              {"n": ("doc_id", "count")})
    counts["n"] = counts["n"].astype(np.int64)
    return counts.sort_values("stage").reset_index(drop=True)

"""Hash-bucketed table layout — the co-location pattern for repeated joins
at 100 TB scale (SURVEY.md §4.2 "pick ONE partitioning key and reuse it"):
write a table once partitioned by ``hash(key) % n_buckets``; any later
equi-join or groupby on that key reads bucket-aligned files and never pays
an all-to-all shuffle (each bucket pair joins independently).

Uses the same deterministic 64-bit key hash as exact dedup (sketches._hash64)
so two tables bucketed with the same ``n_buckets`` are co-partitioned, and
the idempotent writer so re-writes cannot leave duplicate parts.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

from ..sketches import _hash64


def add_bucket(batch: pd.DataFrame, key: str, n_buckets: int,
               out: str = "bucket") -> pd.DataFrame:
    """Vectorized bucket id = hash64(key) % n_buckets (strings hash by
    value; integer keys hash by their decimal string so bucketing is
    dtype-stable across readers)."""
    vals = batch[key].astype(str).to_numpy(dtype=object)
    batch[out] = (_hash64(vals) % np.uint64(n_buckets)).astype(np.int64)
    return batch


def write_bucketed(ds, out_dir: str, *, key: str, n_buckets: int = 32) -> str:
    """Write ``ds`` as hive-partitioned Parquet ``out_dir/bucket=<b>/`` —
    one directory per key-hash bucket (resumable layout: a failed rewrite
    re-runs per partition; deterministic filenames overwrite-on-retry)."""
    from .writers import write_parquet_idempotent

    bucketed = ds.map_batches(
        lambda df: add_bucket(df, key, n_buckets), batch_format="pandas"
    )
    write_parquet_idempotent(bucketed, out_dir, partition_cols=["bucket"])
    return out_dir


def read_bucket(out_dir: str, bucket: int):
    """Read one bucket partition (partition-pruned: only that directory's
    files are touched)."""
    import ray.data as rd

    path = os.path.join(out_dir, f"bucket={bucket}")
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    return rd.read_parquet(files) if files else None


def bucketed_join_pandas(dir_a: str, dir_b: str, *, on: str, n_buckets: int,
                         how: str = "inner") -> pd.DataFrame:
    """Co-partitioned join: because both tables were bucketed with the same
    key hash and ``n_buckets``, each bucket pair joins independently — no
    shuffle, embarrassingly parallel across buckets (driver-side pandas per
    bucket here; at cluster scale each bucket is its own task)."""
    frames = []
    for b in range(n_buckets):
        da, db = read_bucket(dir_a, b), read_bucket(dir_b, b)
        if da is None or db is None:
            continue
        fa = da.to_pandas().drop(columns=["bucket"], errors="ignore")
        fb = db.to_pandas().drop(columns=["bucket"], errors="ignore")
        j = fa.merge(fb, on=on, how=how)
        if len(j):
            frames.append(j)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)

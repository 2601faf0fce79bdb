"""Generic table sources: parquet / csv / json / in-memory, all returning
``ray.data.Dataset``.

The reference reads CSV (cli/commands/validate.py:124), FASTA
(schema_validator.py:211-266), and inline JSON/dicts
(orchestrator.py:650-671). Parquet is the engine's primary format
(input_hint); the others are thin adapters so a reference user can point the
same pipelines at their existing files. The FASTA-style pattern (custom
record format -> rows) is shown by ``read_records_with``.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable, Iterable


def read_table(path: str, *, columns: list[str] | None = None, **kw):
    """Format-sniffing reader: directory of parquet shards, a parquet file,
    .csv, .json/.jsonl — returns a Dataset."""
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if files:
            return rd.read_parquet(files, columns=columns, **kw)
        raise FileNotFoundError(f"no parquet shards in {path}")
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        return rd.read_parquet(path, columns=columns, **kw)
    if ext == ".csv":
        ds = rd.read_csv(path, **kw)
        return ds.select_columns(columns) if columns else ds
    if ext in (".json", ".jsonl"):
        ds = rd.read_json(path, **kw)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported input format: {path}")


def from_records(records: Iterable[dict]):
    """Inline list-of-dicts ingestion (orchestrator.py:650-671 analog)."""
    import ray.data as rd

    return rd.from_items(list(records))


def read_records_with(paths: list[str], parse: Callable[[bytes], list[dict]],
                      **kw):
    """Custom record-format source: raw file bytes -> rows via ``parse``
    (the FASTA-reader pattern, schema_validator.py:211-266, generalized).
    ``parse`` runs distributed, once per file."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kw)

    def explode(batch):
        import pandas as pd

        rows: list[dict] = []
        for payload, p in zip(batch["bytes"], batch["path"]):
            for r in parse(payload):
                rows.append({**r, "source_file": os.path.basename(p)})
        return pd.DataFrame(rows)

    return ds.map_batches(explode, batch_format="pandas")

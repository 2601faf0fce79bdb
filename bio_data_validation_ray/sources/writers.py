"""Deterministic, idempotent Parquet sinks.

Ray Data retries failed write tasks; with the default UUID-based file
naming a retried task appends a SECOND part file next to the partial one,
silently duplicating rows in the sink. SURVEY.md §4.2 therefore requires
deterministic per-partition names with overwrite-on-retry: naming each part
file purely by (prefix, task_index, block_index) makes a retry rewrite the
SAME path, so the sink converges to exactly-once contents no matter how
many times a task runs. (Reference ancestor: the reference's only durable
sink is a timestamp-named JSON report, api/routes.py:72-99 — single-process,
so it never faced retry duplication.)
"""

from __future__ import annotations

from ray.data.datasource import FilenameProvider


class DeterministicFilenames(FilenameProvider):
    """Name part files ``{prefix}-{task_index:05d}-{block_index:05d}.parquet``
    — stable across write-task retries (the write_uuid is deliberately
    ignored), so a retried task overwrites its own partial file instead of
    appending a duplicate. Ray only permits uuid-free names under
    ``mode="overwrite"``, which ``write_parquet_idempotent`` always sets —
    every such sink is a whole-directory product of one logical write, so
    overwrite-then-write is exactly the wanted semantics (a re-run with a
    different block structure cannot leave stale higher-index files)."""

    def __init__(self, prefix: str = "part"):
        self.prefix = prefix

    def get_filename_for_block(self, block, write_uuid: str, task_index: int,
                               block_index: int) -> str:
        return f"{self.prefix}-{task_index:05d}-{block_index:05d}.parquet"


def write_parquet_idempotent(ds, path: str, *, prefix: str = "part",
                             **kwargs) -> None:
    """``ds.write_parquet`` with deterministic part names and
    whole-directory overwrite (see ``DeterministicFilenames``). The sink
    converges to exactly-once contents under both write-task retries and
    full re-executions."""
    ds.write_parquet(path, filename_provider=DeterministicFilenames(prefix),
                     mode="overwrite", **kwargs)

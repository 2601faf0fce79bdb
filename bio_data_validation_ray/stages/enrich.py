"""Stateful external-enrichment stage: the Ray-native re-expression of the
reference's cache -> NCBI -> Ensembl -> degraded lookup waterfall
(bio_lookups.py:614-800) and its process-singleton cache
(cache_manager.py:26-449).

The reference resolves each distinct (gene, organism) key against a local
cache first, then batched remote APIs, then marks the rest degraded. In a
no-network engine the "cache" generalizes to a REFERENCE TABLE loaded once
per worker; the waterfall becomes: primary reference lookup -> optional
fallback callable -> miss marker. SURVEY.md §2.3 maps this to an actor-pool
``map_batches`` class: state (the reference index) is built in ``__init__``
(once per actor, NOT per batch), per-batch work is a vectorized hash merge
on the deduplicated key set (bio_lookups.py:645 dedupes keys the same way).

Usage::

    stage = EnrichStage  # pass the CLASS to map_batches
    out = ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs=dict(ref_path=..., key_col="o_custkey",
                                   ref_key="c_custkey",
                                   add_cols=["c_mktsegment"]),
        batch_format="pandas", concurrency=(1, 4),
    )

Output rows carry the requested ``add_cols`` plus ``enrich_status`` in
{'hit', 'fallback', 'miss'} — the analog of the reference's per-gene
verified/unverified/degraded verdicts (bio_lookups.py:742-789).
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pandas as pd

STATUS_COL = "enrich_status"
HIT, FALLBACK, MISS = "hit", "fallback", "miss"


def enrich_dataset(ds, *, concurrency=(1, 4), batch_size: int | None = None,
                   num_cpus: float | None = None, **stage_kwargs):
    """Size-the-pool-at-the-callsite wrapper: maps ``EnrichStage`` over
    ``ds`` with the actor-pool knobs (``concurrency``, ``batch_size``,
    ``num_cpus``) exposed as first-class parameters instead of living in
    the caller's ``map_batches`` boilerplate. ``stage_kwargs`` go to the
    ``EnrichStage`` constructor."""
    opts = dict(fn_constructor_kwargs=stage_kwargs, batch_format="pandas",
                concurrency=concurrency)
    if batch_size is not None:
        opts["batch_size"] = batch_size
    if num_cpus is not None:
        opts["num_cpus"] = num_cpus
    return ds.map_batches(EnrichStage, **opts)


class EnrichStage:
    """Actor-pool enrichment: reference table loaded once per actor."""

    def __init__(
        self,
        *,
        key_col: str,
        ref_key: str,
        add_cols: list[str],
        ref_path: str | None = None,
        ref_data=None,
        ref_columns: list[str] | None = None,
        fallback: Callable[[pd.Series], pd.DataFrame] | None = None,
        ref_ttl_s: float | None = None,
    ):
        """``ref_path``: parquet file/dir read ONCE in this constructor (the
        at-scale pattern for a big shared reference on common storage);
        ``ref_data``: a ``ray.ObjectRef`` from ``ray.put`` (broadcast once,
        fetched zero-copy from the local object store) or a plain DataFrame
        for tests. ``fallback(keys) -> DataFrame[ref_key, *add_cols]`` is
        consulted for keys the reference missed (the Ensembl-fallback
        analog); remaining keys are marked ``miss``.

        ``ref_ttl_s``: cache time-to-live (cache_manager.py:173-180
        semantics): when the ``ref_path`` index is older than this many
        seconds at the start of a batch, it is reloaded from storage — so a
        long-lived actor picks up reference updates instead of serving
        stale entries forever. Only meaningful with ``ref_path``
        (a broadcast ``ref_data`` object is immutable by construction)."""
        if (ref_path is None) == (ref_data is None):
            raise ValueError("exactly one of ref_path / ref_data required")
        if ref_ttl_s is not None and ref_path is None:
            raise ValueError("ref_ttl_s requires ref_path (a broadcast "
                             "ref_data object cannot go stale)")
        self.key_col, self.ref_key, self.add_cols = key_col, ref_key, add_cols
        self.fallback = fallback
        self.ref_path, self.ref_columns = ref_path, ref_columns
        self.ref_ttl_s = ref_ttl_s
        if ref_path is not None:
            self._load_index()
        else:
            try:
                import ray

                if isinstance(ref_data, ray.ObjectRef):
                    ref_data = ray.get(ref_data)
            except ImportError:
                pass
            self._set_index(ref_data)
        self.hits = 0
        self.misses = 0
        self.fallback_hits = 0
        self.ref_reloads = 0

    def _set_index(self, ref: pd.DataFrame) -> None:
        # one indexed frame per actor; duplicate reference keys keep the
        # first occurrence (deterministic)
        self._index = (
            ref[[self.ref_key] + self.add_cols]
            .drop_duplicates(self.ref_key, keep="first")
            .set_index(self.ref_key)
        )

    def _load_index(self) -> None:
        self._set_index(pd.read_parquet(self.ref_path,
                                        columns=self.ref_columns))
        self._loaded_at = time.monotonic()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if (self.ref_ttl_s is not None
                and time.monotonic() - self._loaded_at > self.ref_ttl_s):
            self._load_index()
            self.ref_reloads += 1
        if len(batch) == 0:
            out = batch.copy()
            for c in self.add_cols:
                out[c] = pd.Series(dtype=object)
            out[STATUS_COL] = pd.Series(dtype=object)
            return out
        # dedupe keys before the lookup (bio_lookups.py:645) — repeated keys
        # in a batch cost one probe
        keys = pd.Index(batch[self.key_col].unique())
        found = self._index.reindex(keys)
        # membership = key present in the reference INDEX, not "first
        # add_col non-null": a reference row whose first attribute is
        # legitimately null is a HIT (and must not be overwritten by the
        # fallback), and an empty add_cols list must not IndexError
        hit_mask = pd.Series(keys.isin(self._index.index), index=keys)
        status = pd.Series(MISS, index=keys, dtype=object)
        status[hit_mask] = HIT
        missing = keys[~hit_mask]
        if self.fallback is not None and len(missing):
            fb = self.fallback(pd.Series(missing))
            if len(fb):
                fb = (
                    fb[[self.ref_key] + self.add_cols]
                    .drop_duplicates(self.ref_key, keep="first")
                    .set_index(self.ref_key)
                )
                fb_keys = fb.index.intersection(missing)
                found.loc[fb_keys, self.add_cols] = fb.loc[fb_keys, self.add_cols]
                status[fb_keys] = FALLBACK
                self.fallback_hits += len(fb_keys)
        self.hits += int(hit_mask.sum())
        self.misses += int((status == MISS).sum())
        # pre-drop output columns the batch already carries: default merge
        # suffixes would silently rename to _x/_y and break the documented
        # schema when re-enriching an already-enriched dataset
        clash = [c for c in self.add_cols + [STATUS_COL]
                 if c in batch.columns]
        out = (batch.drop(columns=clash) if clash else batch).merge(
            found.assign(**{STATUS_COL: status}),
            left_on=self.key_col, right_index=True, how="left",
        )
        return out

    def stats(self) -> dict:
        """Hit/miss counters (cache_manager.py stats analog)."""
        return {"hits": self.hits, "misses": self.misses,
                "fallback_hits": self.fallback_hits,
                "ref_reloads": self.ref_reloads}

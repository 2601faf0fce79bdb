"""Per-partition lineage + checkpoint store for idempotent resume.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics (rows scanned, rules evaluated, violations,
wall-time)". The reference has no run-level resume; its only persistent state
is the SQLite gene cache (src/utils/cache_manager.py:26-449) — this store is
the distributed analog: append-only, keyed by partition, safe to re-commit.

Layout: ``<run_dir>/lineage/<partition_id>.json`` — one atomically-written
file per committed partition (write tmp + rename), so a killed run leaves
either a fully committed partition or nothing. ``committed()`` is the resume
filter: the pipeline skips input files whose partition_id is present.

``LineageActor`` wraps the store as a Ray actor so commits serialize through
one writer when many driver-side tasks commit concurrently (actor-pool
checkpoint stage per the north rule); the plain class is used directly in
tests and single-driver runs.
"""

from __future__ import annotations

import json
import os
import time


class Lineage:
    def __init__(self, run_dir: str, ruleset_hash: str):
        self.dir = os.path.join(run_dir, "lineage")
        os.makedirs(self.dir, exist_ok=True)
        self.ruleset_hash = ruleset_hash

    def committed(self) -> dict[str, dict]:
        out = {}
        for f in os.listdir(self.dir):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(self.dir, f)) as fh:
                rec = json.load(fh)
            # a ruleset change invalidates prior commits (hash is stamped,
            # mirroring orchestrator.py:342-349's report stamping)
            if rec.get("ruleset_hash") == self.ruleset_hash:
                out[rec["partition_id"]] = rec
        return out

    def commit(
        self,
        partition_id: str,
        *,
        rows_scanned: int,
        rules_evaluated: int,
        violations: int,
        wall_time_s: float,
        status: str = "committed",
        extra: dict | None = None,
    ) -> dict:
        rec = {
            "partition_id": partition_id,
            "ruleset_hash": self.ruleset_hash,
            "rows_scanned": int(rows_scanned),
            "rules_evaluated": int(rules_evaluated),
            "violations": int(violations),
            "wall_time_s": round(float(wall_time_s), 4),
            "status": status,
            "committed_at": time.time(),
        }
        if extra:
            rec.update(extra)
        path = os.path.join(self.dir, _lineage_filename(partition_id))
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, path)  # atomic, idempotent on re-commit
        return rec


def _lineage_filename(partition_id: str) -> str:
    """Collision-proof lineage filename: sanitizing '/' alone could map two
    DISTINCT partition ids (a/b.parquet vs a_b.parquet) to one file, where
    the commits would silently clobber each other and the losing partition
    re-runs forever; an id-hash suffix keeps every partition distinct."""
    import hashlib

    safe = partition_id.replace("/", "_")
    tag = hashlib.sha1(partition_id.encode()).hexdigest()[:8]
    return f"{safe}.{tag}.json"


def write_stats_bundle(lineage_dir: str, stats_map: dict[str, bytes]) -> str:
    """Persist per-shard sketch blobs as ONE atomic bundle file (written
    BEFORE lineage commits, so every committed shard's sketches are durable).
    One write instead of one file per shard: at 1000+ shards the per-file
    pickle+write loop was a measurable serial tail."""
    import pickle
    import uuid

    path = os.path.join(lineage_dir, f"stats-{uuid.uuid4().hex[:12]}.pkl")
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        pickle.dump(stats_map, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_stats_blobs(lineage_dir: str) -> dict[str, bytes]:
    """Union of all stats bundles (later bundles win) plus any legacy
    per-shard ``<shard>.stats.pkl`` files."""
    import glob as _glob
    import pickle

    import logging

    out: dict[str, bytes] = {}
    unreadable = 0
    # 'later bundles win' must mean later IN TIME: the filenames carry a
    # random uuid, so a lexicographic sort would pick an arbitrary winner
    # when a crashed-then-resumed pass wrote a shard into two bundles
    bundles = sorted(
        _glob.glob(os.path.join(lineage_dir, "stats-*.pkl")),
        key=lambda p: (os.path.getmtime(p), p),
    )
    for f in bundles:
        try:
            with open(f, "rb") as fh:
                out.update(pickle.load(fh))
        except Exception as e:
            # partial bundle from a crash mid-write: tmp never replaced, so
            # this is only reachable for corrupt disks — but a resumed run
            # that silently skipped sketches would still report a complete,
            # decided run, so the skip must be VISIBLE
            unreadable += 1
            logging.getLogger(__name__).warning(
                "unreadable stats bundle %s (%s): aggregate/drift rules "
                "will miss its shards on this resume", f, e,
            )
    if unreadable:
        out["__unreadable_bundles__"] = str(unreadable).encode()
    for f in _glob.glob(os.path.join(lineage_dir, "*.stats.pkl")):
        shard = os.path.basename(f)[: -len(".stats.pkl")]
        with open(f, "rb") as fh:
            out.setdefault(shard, fh.read())
    return out


def lineage_actor_cls():
    """Ray-actor wrapper, constructed lazily so importing this module never
    touches Ray (the driver owns the session)."""
    import ray

    @ray.remote(num_cpus=0)
    class LineageActor:
        def __init__(self, run_dir: str, ruleset_hash: str):
            self._store = Lineage(run_dir, ruleset_hash)

        def committed(self):
            return self._store.committed()

        def commit(self, partition_id, **kw):
            return self._store.commit(partition_id, **kw)

    return LineageActor

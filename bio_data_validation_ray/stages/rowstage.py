"""Single-pass per-batch validation stage.

One ``map_batches(ValidateBatch, batch_format="pyarrow")`` pass over the raw
transcript dataset emits THREE compact derived streams in a single union-typed
Arrow table (discriminated by ``kind``):

- ``violation`` rows: {conv_id, turn_idx, rule_id, rule_version, severity,
  column, offending_value, shard} — the full-row generalization of the
  reference's ValidationIssue (base_schemas.py:266-273; count+examples at
  matrix_validator.py:264-269).
- ``segment`` rows: per-(shard, conv-within-batch) summaries {turn_lo,
  turn_hi, n, n_dup, min_ts, max_ts, mono_ok} — mergeable partials for the
  conversation-level rules (uniqueness DUP_002, contiguity, ts monotonicity,
  shard-referential integrity). The merge happens in convstage.py over a
  shuffle keyed by conv_id; only these summaries shuffle, never raw turns
  (SURVEY.md §7.5: keep ``text`` out of shuffles).
- ``sketch`` rows: one serialized mergeable sketch per (shard, batch) —
  Welford moments + t-digest of text length, HLL of conv_id, role counts,
  null counts, and a content-hash-sum for the text byte-equality invariant.

Design rationale (100 TB): raw data is scanned exactly once; everything that
leaves this stage is orders of magnitude smaller than the input, so the
downstream groupby/merge shuffles are cheap. The stage is a callable class so
rule compilation happens once per actor (``__init__``), not per batch.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..registry import RuleRegistry
from ..rules import compile_row_rules
from ..sketches import HLL, Moments, TDigest, _hash64, dumps, hash_string_array

OUT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("shard", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("rule_id", pa.string()),
        ("rule_version", pa.string()),
        ("severity", pa.string()),
        ("column", pa.string()),
        ("offending_value", pa.string()),
        ("seg_turn_lo", pa.int32()),
        ("seg_turn_hi", pa.int32()),
        ("seg_n", pa.int64()),
        ("seg_dup", pa.int64()),
        ("seg_min_ts", pa.int64()),
        ("seg_max_ts", pa.int64()),
        ("seg_mono_ok", pa.bool_()),
        ("sketch_name", pa.string()),
        ("payload", pa.binary()),
    ]
)

_EMPTY_COLS = {f.name: [] for f in OUT_SCHEMA}

_ARROW_CLAMPED = False


def _clamp_arrow_threads() -> None:
    """Clamp Arrow's process-wide thread pools to this worker's CPU share
    (runs once per worker process, at the first batch). Without this every
    Ray worker decodes parquet on pa.cpu_count() threads and an
    intentionally small cluster silently uses every core on the machine —
    which would fake any cluster-size scaling measurement."""
    global _ARROW_CLAMPED
    if _ARROW_CLAMPED:
        return
    try:
        if pa.cpu_count() > 2:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass
    _ARROW_CLAMPED = True


def _rows(kind: str, n: int, **cols) -> dict:
    out = {name: [None] * n for name in _EMPTY_COLS}
    out["kind"] = [kind] * n
    for k, v in cols.items():
        out[k] = list(v)
    return out


class ValidateBatch:
    """Actor-pool batch validator. ``registry`` is constructed once per actor."""

    def __init__(self, registry: RuleRegistry | None = None, key_group: str = "conv_id",
                 key_order: str = "turn_idx", ts_col: str = "ts", text_col: str = "text"):
        if registry is None:
            from ..registry import transcript_registry

            registry = transcript_registry()
        self.registry = registry
        self.compiled = compile_row_rules(registry.row_rules())
        self.key_group, self.key_order = key_group, key_order
        self.ts_col, self.text_col = ts_col, text_col
        self.rowdup_spec = next(
            (s for s in registry.group_rules() if s.kind == "row_dup"), None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        _clamp_arrow_threads()
        parts: list[dict] = []
        if "path" in batch.column_names:
            # dictionary-encode instead of materializing a Python string per
            # row — paths repeat per file, the dictionary is tiny. Files are
            # concatenated in order inside a block, so each shard is a
            # contiguous run -> zero-copy slices, never a take() copy.
            enc = batch["path"].combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            shards = [os.path.basename(p) for p in enc.dictionary.to_pylist()]
            batch = batch.drop_columns(["path"])
            if len(shards) == 1:
                self._one_shard(batch, shards[0], parts)
            else:
                run_starts = np.concatenate(
                    [[0], np.flatnonzero(np.diff(codes)) + 1, [codes.size]]
                )
                for a, b in zip(run_starts[:-1], run_starts[1:]):
                    self._one_shard(
                        batch.slice(int(a), int(b - a)), shards[codes[a]], parts
                    )
        else:
            self._one_shard(batch, "all", parts)

        if not parts:
            return pa.Table.from_pydict(_EMPTY_COLS, schema=OUT_SCHEMA)
        merged = {
            name: sum((p[name] for p in parts), []) for name in _EMPTY_COLS
        }
        return pa.Table.from_pydict(merged, schema=OUT_SCHEMA)

    # ------------------------------------------------------------------

    def _one_shard(self, t: pa.Table, shard: str, parts: list[dict]) -> None:
        n = t.num_rows
        if n == 0:
            return
        conv = t[self.key_group]
        turn = t[self.key_order]

        # --- row-local rules -> violation rows ---
        for cr in self.compiled:
            mask = cr.mask_fn(t)
            idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if idx.size == 0:
                continue
            ia = pa.array(idx)
            col = cr.spec.column
            if col in t.column_names:
                vals = pc.cast(t[col].take(ia), pa.string()).to_pylist()
                vals = ["null" if v is None else v for v in vals]
            else:
                vals = ["null"] * idx.size
            parts.append(
                _rows(
                    "violation",
                    idx.size,
                    shard=[shard] * idx.size,
                    conv_id=conv.take(ia).to_pylist(),
                    turn_idx=turn.take(ia).to_pylist(),
                    rule_id=[cr.spec.rule_id] * idx.size,
                    rule_version=[cr.spec.version] * idx.size,
                    severity=[cr.spec.severity] * idx.size,
                    column=[col] * idx.size,
                    offending_value=vals,
                )
            )

        # --- structural guard: rows whose GROUPING KEYS are null cannot
        # join a conversation segment (a null conv_id dictionary code
        # indexes out of bounds; a null turn_idx/ts silently corrupts to
        # INT64_MIN/NaN). Emit one violation per such row and exclude them
        # from segment construction — the validator must flag malformed
        # keys, not crash on them. ---
        null_key = np.zeros(n, dtype=bool)
        for c in (self.key_group, self.key_order, self.ts_col):
            if c in t.column_names:
                null_key |= pc.is_null(t[c]).to_numpy(zero_copy_only=False)
        if null_key.any():
            nidx = np.flatnonzero(null_key)
            ia = pa.array(nidx)
            parts.append(
                _rows(
                    "violation",
                    nidx.size,
                    shard=[shard] * nidx.size,
                    conv_id=conv.take(ia).to_pylist(),
                    turn_idx=turn.take(ia).to_pylist(),
                    rule_id=["STRUCT_NULL_KEY"] * nidx.size,
                    rule_version=["1"] * nidx.size,
                    severity=["CRITICAL"] * nidx.size,
                    column=[None] * nidx.size,
                    offending_value=["null grouping key"] * nidx.size,
                )
            )
            t = t.filter(pa.array(~null_key))
            n = t.num_rows
            if n == 0:
                return
            conv = t[self.key_group]
            turn = t[self.key_order]

        # --- conversation segments (mergeable partials for group rules) ---
        # dictionary-encode the conversation key: per-row work stays on int
        # codes; only the (small) dictionary ever becomes Python strings
        conv_enc = conv.combine_chunks().dictionary_encode()
        codes = conv_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_vals = np.asarray(conv_enc.dictionary.to_pylist(), dtype=object)
        turn_np = turn.to_numpy(zero_copy_only=False).astype(np.int64)
        ts_np = t[self.ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts_np, turn_np, codes))
        cs, ti, tsv = codes[order], turn_np[order], ts_np[order]

        # whole-row exact duplicates (DUP_001 analog, rule_validator.py:261-271):
        # identical rows share (conv_id, turn_idx, ts) so they sort adjacent
        # here; the content hash is computed LAZILY, only for rows inside
        # equal-key runs (rare), keeping hashing off the per-row hot path.
        # Cross-batch copies surface as overlapping segments -> exact fallback.
        if self.rowdup_spec is not None:
            same_key = (
                (cs[1:] == cs[:-1])
                & (ti[1:] == ti[:-1])
                & (tsv[1:] == tsv[:-1])
            )
            cand = np.flatnonzero(same_key)
            didx = np.zeros(0, dtype=np.int64)
            if cand.size:
                rows_in_runs = np.unique(np.concatenate([cand, cand + 1]))
                sub = t.take(pa.array(order[rows_in_runs]))
                sub_hash = self._row_hash(sub, tsv[rows_in_runs])
                # runs = maximal consecutive positions sharing (conv,turn,ts);
                # a row is a duplicate copy if its hash already appeared in
                # its run (exact for any run length / interleaving). Runs must
                # break on KEY change too, not just position gaps — adjacent
                # equal-content rows of different (conv,turn,ts) keys are
                # distinct runs (else cross-conversation identical content
                # yields false DUP_001 hits).
                rr = rows_in_runs
                run_break = (
                    (np.diff(rr) != 1)
                    | (cs[rr][1:] != cs[rr][:-1])
                    | (ti[rr][1:] != ti[rr][:-1])
                    | (tsv[rr][1:] != tsv[rr][:-1])
                )
                run_ids = np.concatenate([[0], np.cumsum(run_break)])
                rdf = pd.DataFrame(
                    {"run": run_ids, "h": sub_hash, "pos": rows_in_runs}
                )
                dup_rows = rdf[rdf.duplicated(["run", "h"], keep="first")]
                didx = dup_rows["pos"].to_numpy()
            if didx.size:
                spec = self.rowdup_spec
                parts.append(
                    _rows(
                        "violation",
                        didx.size,
                        shard=[shard] * didx.size,
                        conv_id=uniq_vals[codes[order[didx]]].tolist(),
                        turn_idx=turn_np[order[didx]].tolist(),
                        rule_id=[spec.rule_id] * didx.size,
                        rule_version=[spec.version] * didx.size,
                        severity=[spec.severity] * didx.size,
                        column=[None] * didx.size,
                        offending_value=["exact_duplicate_row"] * didx.size,
                    )
                )

        change = np.flatnonzero(np.diff(cs)) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        counts = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        uniq = np.asarray(uniq_vals, dtype=object)[cs[starts]]
        g = np.repeat(np.arange(starts.size), counts)
        # within-segment duplicate (conv, turn) pairs: adjacent equal after sort
        adj_dup = (cs[1:] == cs[:-1]) & (ti[1:] == ti[:-1])
        seg_dup = np.bincount(g[1:][adj_dup], minlength=uniq.size)
        seg_lo = ti[starts]
        ends = starts + counts - 1
        seg_hi = ti[ends]
        seg_min_ts = np.minimum.reduceat(tsv, starts)
        seg_max_ts = np.maximum.reduceat(tsv, starts)
        seg_mono = self._mono_ok(g, ti, tsv, uniq.size)

        parts.append(
            _rows(
                "segment",
                uniq.size,
                shard=[shard] * uniq.size,
                conv_id=uniq.tolist(),
                seg_turn_lo=seg_lo.astype(np.int32).tolist(),
                seg_turn_hi=seg_hi.astype(np.int32).tolist(),
                seg_n=counts.astype(np.int64).tolist(),
                seg_dup=seg_dup.astype(np.int64).tolist(),
                seg_min_ts=seg_min_ts.tolist(),
                seg_max_ts=seg_max_ts.tolist(),
                seg_mono_ok=seg_mono.tolist(),
            )
        )

        # --- sketch partials ---
        text = t[self.text_col]
        text_len = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(float)
        # hash only the (small) conv dictionary; rows map through int codes
        uniq_hash = _hash64(uniq_vals)
        if "role" in t.column_names:
            renc = t["role"].combine_chunks().dictionary_encode()
            rcounts = np.bincount(
                renc.indices.to_numpy(zero_copy_only=False),
                minlength=len(renc.dictionary),
            )
            role_counts = {
                k: int(v) for k, v in zip(renc.dictionary.to_pylist(), rcounts)
            }
        else:
            role_counts = {}
        sketches = {
            "text_len_moments": Moments().add_array(text_len),
            "text_len_tdigest": TDigest().add_array(text_len),
            "hll_conv": HLL().add_hashes(uniq_hash),
            "role_counts": role_counts,
            "null_counts": {
                c: (int(t[c].null_count), n) for c in t.column_names
            },
            "content_hash": self._content_hash(uniq_hash[codes], turn_np, t),
        }
        names = list(sketches)
        parts.append(
            _rows(
                "sketch",
                len(names),
                shard=[shard] * len(names),
                sketch_name=names,
                payload=[dumps(sketches[k]) if not isinstance(sketches[k], (dict, tuple))
                         else pickle.dumps(sketches[k]) for k in names],
            )
        )

    def _row_hash(self, t: pa.Table, ts_np: np.ndarray) -> np.ndarray:
        """64-bit hash over the non-key columns (role, text, tool) + ts, for
        whole-row duplicate detection. Uses the full siphash (_hash64), NOT
        the buffer-level length/byte-sum fingerprint: that fingerprint
        collides on transpositions ('acb' vs 'bac'), which here would mint
        FALSE exact-duplicate violations. This path only ever sees rows
        inside equal-(conv,turn,ts) runs — a tiny fraction — so the
        per-row object cost is off the hot path by construction."""
        h = ts_np.astype(np.uint64).copy()
        for c in ("role", self.text_col, "tool"):
            if c in t.column_names:
                col = pc.fill_null(t[c], "\x00NULL\x00").to_numpy(
                    zero_copy_only=False)
                h = h * np.uint64(0x100000001B3) + _hash64(col)
        return h

    def _content_hash(self, conv_hash: np.ndarray, turn_np, t) -> tuple:
        """(sum of 64-bit row hashes mod 2^64, count): multiset fingerprint of
        (conv_id, turn_idx, text) proving the text byte-equality invariant.
        ``conv_hash`` is the per-row conv hash (dictionary hash gathered
        through codes); text hashes come straight from the Arrow buffers."""
        hturn = pd.util.hash_array(np.asarray(turn_np, dtype=np.int64),
                                   categorize=False).astype(np.uint64)
        txt = pc.fill_null(t[self.text_col], "\x00NULL\x00").to_numpy(
            zero_copy_only=False
        )
        h = conv_hash + hturn * np.uint64(0x9E3779B97F4A7C15) + _hash64(txt)
        return (int(h.sum(dtype=np.uint64)), int(h.size))

    @staticmethod
    def _mono_ok(g: np.ndarray, ti: np.ndarray, tsv: np.ndarray, n_groups: int) -> np.ndarray:
        """Per group (sorted by (g, turn, ts)): True unless there exist rows
        a, b with turn_a < turn_b and ts_a > ts_b (the EXISTS-pair definition;
        well-defined even with duplicate turn_idx)."""
        if g.size == 0:
            return np.zeros(0, dtype=bool)
        df = pd.DataFrame({"g": g, "t": ti, "ts": tsv})
        new_run = (df["g"].diff().ne(0) | df["t"].diff().ne(0)).to_numpy()
        run = np.cumsum(new_run) - 1
        df["run"] = run
        per_run = df.groupby("run", sort=False).agg(
            g=("g", "first"), mx=("ts", "max"), mn=("ts", "min")
        )
        per_run["cm"] = per_run.groupby("g")["mx"].cummax()
        per_run["prev"] = per_run.groupby("g")["cm"].shift(1)
        viol = per_run["mn"] < per_run["prev"]
        bad_groups = per_run.loc[viol.fillna(False), "g"].unique()
        out = np.ones(n_groups, dtype=bool)
        out[bad_groups] = False
        return out


class RowRulesOnly:
    """Generic row-local rule evaluation for ANY keyed table (not just
    transcripts): emits one violation row per (row, failed rule) with the
    caller's key columns. This is the engine's generic-table surface — the
    analog of RuleValidator.validate over an arbitrary DataFrame
    (rule_validator.py:101-148), minus transcript-specific group checks.

    Use as ``ds.map_batches(RowRulesOnly, fn_constructor_kwargs=...,
    batch_format="pyarrow", concurrency=N)``.
    """

    def __init__(self, registry: RuleRegistry | None = None,
                 key_cols: list[str] | None = None,
                 registry_factory=None):
        """Prefer ``registry_factory`` (a zero-arg callable) when running as
        an actor pool: a module-level factory pickles by reference, keeping
        constructor args inline instead of in the object store (Ray warns
        that object-store ctor args break actor restarts, ray#53727)."""
        if registry is None:
            registry = registry_factory() if registry_factory else None
        if registry is None:
            raise ValueError("registry or registry_factory required")
        self.compiled = compile_row_rules(registry.row_rules())
        self.key_cols = list(key_cols or [])

    def __call__(self, t: pa.Table) -> pa.Table:
        keys: dict[str, list] = {k: [] for k in self.key_cols}
        meta: dict[str, list] = {
            "rule_id": [], "rule_version": [], "severity": [],
            "column": [], "offending_value": [],
        }
        for cr in self.compiled:
            mask = cr.mask_fn(t)
            idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if idx.size == 0:
                continue
            ia = pa.array(idx)
            for k in self.key_cols:
                keys[k].extend(t[k].take(ia).to_pylist())
            col = cr.spec.column
            if col in t.column_names:  # same guard as ValidateBatch:
                # column-less/custom rules report 'null', never KeyError
                vals = pc.cast(t[col].take(ia), pa.string()).to_pylist()
            else:
                vals = ["null"] * idx.size
            meta["rule_id"] += [cr.spec.rule_id] * idx.size
            meta["rule_version"] += [cr.spec.version] * idx.size
            meta["severity"] += [cr.spec.severity] * idx.size
            meta["column"] += [col] * idx.size
            meta["offending_value"] += [
                "null" if v is None else v for v in vals
            ]
        fields = [
            pa.field(k, t.schema.field(k).type) for k in self.key_cols
        ] + [pa.field(n, pa.string()) for n in meta]
        return pa.Table.from_pydict({**keys, **meta}, schema=pa.schema(fields))

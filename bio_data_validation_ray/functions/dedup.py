"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (these run against the `documents` table in tests but are shaped
for 100 TB):
- exact dedup shuffles a 64-bit CONTENT HASH, never the text (SURVEY.md §7.5);
  groupby is over the hash with min-key + count aggregation only.
- MinHash/LSH: signatures are computed per batch (vectorized over each doc's
  shingle set), then exploded to (band, band_hash, doc_id) rows — the only
  shuffle is the tiny banded-bucket groupby; candidate verification re-reads
  only candidate docs.
- the reference's own near-dup operator is O(n²) Levenshtein capped at 5000
  uniques (rule_validator.py:307-322, cap :477); LSH banding is the scale
  re-expression, and the cap becomes unnecessary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches import _hash64

# deterministic 64-bit odd multipliers for minhash permutations
_RNG = np.random.default_rng(0xB0DA7A)
_PERM_MULT = (_RNG.integers(1, 1 << 62, size=128, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_PERM_ADD = _RNG.integers(1, 1 << 62, size=128, dtype=np.int64).astype(np.uint64)


def content_hash_batch(batch: pd.DataFrame, col: str = "text",
                       out: str = "content_hash") -> pd.DataFrame:
    h = _hash64(batch[col].to_numpy(dtype=object))
    batch[out] = h.astype(np.int64)  # int64 for Arrow friendliness
    return batch


def exact_dedup_groups(ds, id_col: str = "doc_id", col: str = "text") -> pd.DataFrame:
    """-> DataFrame[(doc_id=min id per identical text, n_copies)] — the
    hash-partitioned re-expression of DUP_001/DUP_003
    (rule_validator.py:261-305). Shuffles only (hash, id) via the sort-based
    vectorized keyed reduce (stages/keyed_reduce.py), never the text."""
    from ..stages.keyed_reduce import keyed_reduce_pandas

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, col=col)[[id_col, "content_hash"]],
        batch_format="pandas",
    )
    out = keyed_reduce_pandas(
        hashed, ["content_hash"],
        {id_col: (id_col, "min"), "n_copies": (id_col, "count")},
    )
    return out.drop(columns=["content_hash"]).reset_index(drop=True)


def char_shingles(s: str, k: int = 5) -> np.ndarray:
    b = s.encode("utf-8", errors="ignore")
    if len(b) < k:
        return _hash64(np.array([s], dtype=object))
    view = np.frombuffer(b, dtype=np.uint8)
    idx = np.arange(len(b) - k + 1)[:, None] + np.arange(k)[None, :]
    win = view[idx]
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(k):
        h = h * np.uint64(0x100000001B3) + win[:, j].astype(np.uint64)
    return np.unique(h)


_FNV_PRIME = np.uint64(0x100000001B3)


def char_shingle_windows_batch(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Batched char-shingle MULTISET over a whole column: ONE rolling-hash
    pass over the concatenated UTF-8 buffer of all texts (Arrow encodes the
    column at C speed), then gather the windows that don't cross a doc
    boundary — no per-doc Python/numpy calls, no sort. Returns
    ``(hashes, lens)``: ``hashes`` concatenates each doc's window hashes in
    stream order, ``lens[i]`` its count.

    Per doc this is ``char_shingles(s, k)`` WITHOUT the ``np.unique`` —
    ``np.unique(segment_i)`` equals ``char_shingles(texts[i], k)`` exactly.
    MinHash consumes it directly: min over the multiset == min over the
    set, so skipping the per-doc sort is free exactness. Texts shorter than
    ``k`` bytes contribute the ``_hash64([s])`` singleton, matching the
    per-doc function."""
    texts = np.asarray(texts, dtype=object)
    n = len(texts)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    try:
        arr = pa.array(texts, type=pa.large_string())
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # non-encodable input (lone surrogates): per-doc fallback keeps the
        # errors="ignore" semantics AND the stream-order MULTISET contract
        # (char_shingles returns sorted-unique hashes, which would misalign
        # _WindowVerify's hit-index -> byte-position mapping)
        outs, lens_l = [], []
        for s in texts:
            b = str(s).encode("utf-8", "ignore")
            if len(b) < k:
                outs.append(_hash64([s]))
                lens_l.append(1)
                continue
            a = np.frombuffer(b, dtype=np.uint8)
            m = len(b) - k + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                h = h * _FNV_PRIME + a[j:j + m]
            outs.append(h)
            lens_l.append(m)
        lens = np.array(lens_l, dtype=np.int64)
        cat = np.concatenate(outs) if lens.sum() else np.zeros(0, np.uint64)
        return cat, lens
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    buf_off = buf_off[arr.offset: arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.zeros(0, np.uint8)
    doc_len = np.diff(buf_off)
    short = doc_len < k
    if short.any():
        # rare path: splice per-doc singletons between window runs — fall
        # back to segment assembly only for the affected docs
        singles = _hash64(texts[np.flatnonzero(short)])
    m = data.size - k + 1
    if m > 0:
        h_all = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            h_all = h_all * _FNV_PRIME + data[j:j + m]
    else:
        h_all = np.zeros(0, np.uint64)
    n_win = np.where(short, 1, doc_len - k + 1)
    total = int(n_win.sum())
    run_start = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(run_start, n_win)
    src = np.repeat(buf_off[:-1], n_win) + pos
    if short.any():
        hashes = np.empty(total, dtype=np.uint64)
        is_short_slot = np.repeat(short, n_win)
        hashes[~is_short_slot] = h_all[src[~is_short_slot]]
        hashes[is_short_slot] = singles
    else:
        hashes = h_all[src]
    return hashes, n_win.astype(np.int64)


def char_shingles_batch(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Batched ``char_shingles``: the whole column's windows come from the
    one-pass kernel above, then each doc's segment gets a single
    ``np.unique`` — one numpy call per doc instead of encode + window
    indexing + k-round hashing per doc. Returns ``(hashes, lens)`` with
    ``hashes`` the concatenation of each doc's sorted unique shingle
    hashes; bit-identical to ``[char_shingles(s, k) for s in texts]``."""
    cat, lens = char_shingle_windows_batch(texts, k)
    off = np.concatenate([[0], np.cumsum(lens)])
    sets = [np.unique(cat[off[i]:off[i + 1]]) for i in range(len(lens))]
    out_lens = np.array([s.size for s in sets], dtype=np.int64)
    out = (np.concatenate(sets) if out_lens.sum()
           else np.zeros(0, np.uint64))
    return out, out_lens


def word_shingles(s: str, n: int = 3) -> np.ndarray:
    """Hashed word n-gram set (n-gram Jaccard's feature space): whitespace
    tokens -> n-grams of consecutive words -> 64-bit hashes, unique. Texts
    with fewer than n words contribute their whole normalized token string
    (so short docs still compare; '' for all-whitespace). SQL twin: the
    sorted distinct list of space-joined word n-grams (queries
    _WORD_NGRAM_PAIRS_SQL)."""
    words = s.split()
    if len(words) < n:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    return np.unique(_hash64(np.array(grams, dtype=object)))


def minhash_signature(shingle_hashes: np.ndarray, n_perm: int = 128) -> np.ndarray:
    """n_perm-wide minhash via universal hashing of the shingle set."""
    if shingle_hashes.size == 0:
        return np.full(n_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    prod = shingle_hashes[None, :] * _PERM_MULT[:n_perm, None] + _PERM_ADD[:n_perm, None]
    return prod.min(axis=1)


class MinHashBands:
    """map_batches stage: doc -> one row per LSH band (band, band_hash, id).
    ``groupby(["band","band_hash"])`` downstream yields candidate buckets."""

    def __init__(self, col: str = "text", id_col: str = "doc_id",
                 k: int = 5, n_perm: int = 128, bands: int = 16,
                 shingle_fn=None):
        import functools

        assert n_perm % bands == 0
        self.col, self.id_col = col, id_col
        self.k, self.n_perm, self.bands = k, n_perm, bands
        self.rows_per_band = n_perm // bands
        # the default char path shingles the whole batch in one kernel;
        # a custom shingle_fn (e.g. word_shingles) runs per doc
        self.shingle_fn = shingle_fn
        if shingle_fn is None:
            self.shingle_fn = functools.partial(char_shingles, k=k)
            self.shingle_batch_fn = functools.partial(char_shingles_batch,
                                                      k=k)
        else:
            self.shingle_batch_fn = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({self.id_col: [], "band": [], "band_hash": []})
        # batch-vectorized minhash: concatenate every doc's shingle set and
        # min-reduce per (permutation, doc) with reduceat — no per-doc loop
        if self.shingle_batch_fn is not None:
            allsh, lens = self.shingle_batch_fn(batch[self.col])
        else:
            shingle_sets = [self.shingle_fn(s) for s in batch[self.col]]
            lens = np.array([s.size for s in shingle_sets], dtype=np.int64)
            allsh = (np.concatenate(shingle_sets) if lens.sum()
                     else np.zeros(0, np.uint64))
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((n, self.n_perm), dtype=np.uint64)
        if allsh.size:
            # reduceat rejects an offset == allsh.size (trailing doc whose
            # custom shingle_fn returned an empty set); clip — the
            # sigs[empty] overwrite below discards whatever that slot reads
            offsets = np.minimum(offsets, allsh.size - 1)
            for p0 in range(0, self.n_perm, 16):  # chunk perms to bound memory
                p1 = min(p0 + 16, self.n_perm)
                prod = (
                    allsh[None, :] * _PERM_MULT[p0:p1, None]
                    + _PERM_ADD[p0:p1, None]
                )
                sigs[:, p0:p1] = np.minimum.reduceat(prod, offsets, axis=1).T
        empty = lens == 0
        sigs[empty, :] = np.uint64(0xFFFFFFFFFFFFFFFF)
        # band hashes: fnv over each band's rows, vectorized
        r = self.rows_per_band
        bh = np.full((n, self.bands), np.uint64(0xCBF29CE484222325))
        banded = sigs.reshape(n, self.bands, r)
        for j in range(r):
            bh = bh * np.uint64(0x100000001B3) + banded[:, :, j]
        ids = np.repeat(batch[self.id_col].to_numpy(), self.bands)
        bands = np.tile(np.arange(self.bands, dtype=np.int64), n)
        return pd.DataFrame(
            {self.id_col: ids, "band": bands,
             "band_hash": bh.reshape(-1).astype(np.int64)}
        )


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


class _BucketPairEmitter:
    """map_batches stage over the bucket-SORTED (id, bucket) stream.

    Emits, per batch:
      kind=0 rows — candidate pairs (id_a < id_b) for every interior bucket
        run, membership capped at ``bucket_cap`` (smallest ids kept);
      kind=1 rows — passthrough members of the batch's FIRST and LAST runs
        (a bucket can straddle two sorted blocks; those runs are stitched on
        the driver), capped at ``bucket_cap`` per run;
      kind=2 rows — (bucket, size) stats for runs that exceeded the cap, so
        the driver can log the truncation instead of silently sampling.

    All run detection is vectorized; per-run Python touches only multi-member
    runs (rare — buckets are hashes of minhash bands)."""

    def __init__(self, id_col: str, bucket_cap: int):
        self.id_col, self.cap = id_col, bucket_cap

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cols = {"id_a": np.int64, "id_b": np.int64,
                "bucket": np.int64, "kind": np.int8}
        empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
        n = len(df)
        if n == 0:
            return empty
        b = df["bucket"].to_numpy()
        ids = df[self.id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, b))  # ascending ids within each run
        b, ids = _dedup_sorted_members(b[order], ids[order])
        starts = np.concatenate([[0], np.flatnonzero(np.diff(b)) + 1])
        ends = np.concatenate([starts[1:], [b.size]])
        nruns = starts.size
        out = [empty]
        # boundary runs (first & last, possibly the same) pass through
        for r in sorted({0, nruns - 1}):
            s, e = int(starts[r]), int(ends[r])
            u = np.unique(ids[s:e])
            if u.size > self.cap:
                out.append(pd.DataFrame(
                    {"id_a": [0], "id_b": [int(u.size)],
                     "bucket": [b[s]], "kind": np.int8(2)}))
                u = u[: self.cap]
            out.append(pd.DataFrame(
                {"id_a": u, "id_b": 0, "bucket": b[s], "kind": np.int8(1)}))
        # interior runs: one vectorized equal-size-grouped pair emission
        if nruns > 2:
            id_a, id_b, n_over, max_over = _emit_run_pairs(
                ids, starts[1:-1], (ends - starts)[1:-1], self.cap
            )
            keep = id_a < id_b  # drop self-pairs from duplicate input ids
            id_a, id_b = id_a[keep], id_b[keep]
            if n_over:
                out.append(pd.DataFrame(
                    {"id_a": np.zeros(n_over, np.int64),
                     "id_b": np.full(n_over, max_over, np.int64),
                     "bucket": np.zeros(n_over, np.int64),
                     "kind": np.full(n_over, 2, np.int8)}))
            if id_a.size:
                out.append(pd.DataFrame(
                    {"id_a": id_a, "id_b": id_b, "bucket": 0,
                     "kind": np.int8(0)}))
        res = pd.concat(out, ignore_index=True)
        return res.astype(cols)


def _shingle_frame(t: pa.Table, id_col: str, col: str, k: int,
                   out_id: str, out_sh: str, ids_ref,
                   shingle_fn=None) -> pa.Table:
    """Filtered projection: keep candidate docs, replace text with the
    (sorted, unique) shingle-hash set. Shingles travel as BINARY (raw uint64
    bytes): Arrow's hash join rejects list payload columns, and bytes
    round-trip zero-copy. Schema is explicit so empty batches don't decay to
    null-typed columns (which break the downstream join)."""
    import pyarrow.compute as pc
    import ray

    import functools

    shingle_fn = shingle_fn or functools.partial(char_shingles, k=k)
    need = ray.get(ids_ref)
    mask = pc.is_in(t[id_col], value_set=pa.array(need, type=t[id_col].type))
    sub = t.filter(mask)
    texts = sub[col].to_pylist()
    return pa.table({
        out_id: sub[id_col].cast(pa.int64()),
        out_sh: pa.array([shingle_fn(s).tobytes() for s in texts],
                         type=pa.binary()),
    })


def _verify_pairs(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact shingle-Jaccard for every candidate pair, fully vectorized:
    all pairs' shingle sets concatenate into one (pair_idx, value) array;
    one lexsort brings equal values within a pair adjacent, so each pair's
    intersection size is |sa| + |sb| - |unique(sa ∪ sb)| counted with a
    single bincount over adjacent duplicates — no per-pair Python loop."""
    empty = pd.DataFrame({
        "id_a": pd.Series(dtype=np.int64),
        "id_b": pd.Series(dtype=np.int64),
        "jaccard": pd.Series(dtype=np.float64),
    })
    n = len(df)
    if n == 0:
        return empty
    sa_list = [np.frombuffer(x, dtype=np.uint64) for x in df["sh_a"]]
    sb_list = [np.frombuffer(x, dtype=np.uint64) for x in df["sh_b"]]
    la = np.fromiter((x.size for x in sa_list), dtype=np.int64, count=n)
    lb = np.fromiter((x.size for x in sb_list), dtype=np.int64, count=n)
    vals = np.concatenate(sa_list + sb_list) if (la.sum() + lb.sum()) else \
        np.zeros(0, np.uint64)
    pid = np.concatenate([np.repeat(np.arange(n), la),
                          np.repeat(np.arange(n), lb)])
    order = np.lexsort((vals, pid))
    v, p = vals[order], pid[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[1:][dup], minlength=n)
    union = la + lb - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    keep = jac >= threshold  # threshold on the unrounded value, round after
    return pd.DataFrame({
        "id_a": df["id_a"].to_numpy()[keep].astype(np.int64),
        "id_b": df["id_b"].to_numpy()[keep].astype(np.int64),
        "jaccard": np.round(jac[keep], 6).astype(np.float64),
    })


def _log_overflow(log_tag: str, n_over: int, max_size: int,
                  bucket_cap: int) -> None:
    import logging

    if n_over:
        logging.getLogger(__name__).warning(
            "%s: %d bucket runs exceeded bucket_cap=%d (max size %d); "
            "membership truncated to the smallest ids",
            log_tag, n_over, bucket_cap, max_size,
        )


def _emit_run_pairs(ids_sorted: np.ndarray, starts: np.ndarray,
                    sizes: np.ndarray, bucket_cap: int
                    ) -> tuple[np.ndarray, np.ndarray, int, int]:
    """All within-run pairs (id_a < id_b), fully vectorized: runs of EQUAL
    size are stacked into one (k, m) matrix and pair-indexed with a single
    triu gather — no per-run Python. ``ids_sorted`` must be ascending within
    each run (global lexsort by (bucket, id)). Oversized runs are truncated
    to the smallest ``bucket_cap`` ids. Returns (id_a, id_b, n_over,
    max_over)."""
    a_parts, b_parts = [], []
    n_over, max_over = 0, 0
    multi = sizes > 1
    if multi.any():
        m_sizes = np.minimum(sizes[multi], bucket_cap)
        m_starts = starts[multi]
        over = sizes[multi] > bucket_cap
        n_over = int(over.sum())
        max_over = int(sizes[multi].max()) if n_over else 0
        for m in np.unique(m_sizes):
            rs = m_starts[m_sizes == m]
            mat = ids_sorted[rs[:, None] + np.arange(int(m))[None, :]]
            iu, jv = np.triu_indices(int(m), 1)
            a_parts.append(mat[:, iu].ravel())
            b_parts.append(mat[:, jv].ravel())
    if not a_parts:
        return (np.empty(0, np.int64), np.empty(0, np.int64), n_over,
                max_over)
    return (np.concatenate(a_parts), np.concatenate(b_parts), n_over,
            max_over)


def _dedup_sorted_members(b: np.ndarray, ids: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Drop duplicate (bucket, id) rows from a (bucket, id)-lexsorted
    stream — the cap must apply to DISTINCT members, so dedup precedes
    truncation."""
    if b.size == 0:
        return b, ids
    keep = np.concatenate(
        [[True], (b[1:] != b[:-1]) | (ids[1:] != ids[:-1])]
    )
    return b[keep], ids[keep]


def _pairs_from_member_frame(bdf: pd.DataFrame, id_col: str, bucket_cap: int,
                             log_tag: str) -> pd.DataFrame | None:
    """Vectorized pair emission over a collected (id, bucket) frame."""
    b = bdf["bucket"].to_numpy()
    ids = bdf[id_col].to_numpy().astype(np.int64)
    order = np.lexsort((ids, b))  # ascending ids within each bucket run
    b, ids = _dedup_sorted_members(b[order], ids[order])
    starts = np.concatenate([[0], np.flatnonzero(np.diff(b)) + 1])
    sizes = np.diff(np.concatenate([starts, [b.size]]))
    id_a, id_b, n_over, max_over = _emit_run_pairs(ids, starts, sizes,
                                                   bucket_cap)
    _log_overflow(log_tag, n_over, max_over, bucket_cap)
    keep = id_a < id_b  # drop self-pairs from duplicate input ids
    id_a, id_b = id_a[keep], id_b[keep]
    if id_a.size == 0:
        return None
    return pd.DataFrame({"id_a": id_a, "id_b": id_b}).drop_duplicates()


def _candidate_pairs(banded, id_col: str, bucket_cap: int, log_tag: str,
                     driver_cap: int = 5_000_000):
    """(id, bucket) Dataset -> deduped candidate-pair Dataset[(id_a, id_b)],
    or None when no bucket has two members.

    Two paths with identical semantics (the validate_dir driver_cap
    pattern): when the DERIVED member stream is small (compact int pairs,
    never text/vector data), it collects once and pair-emits vectorized on
    the driver — avoiding two Ray sort exchanges whose fixed cost dominates
    at small candidate volume. Above the cap: distributed sort-by-bucket +
    per-run pair emission, block-boundary runs stitched from <= 2 runs per
    block, and a sort-based distributed pair dedup. Per-bucket membership
    is capped at ``bucket_cap`` either way, with truncation logged (no
    silent sampling).

    Returns ``(pairs_ds, pairs_df)``: the pair Dataset, plus the SAME pairs
    as a driver frame when the driver path ran (so downstream small-path
    consumers skip the from_pandas -> map_batches -> to_pandas round trip —
    each saved execution is ~0.2 s of launch latency). (None, None) when no
    bucket has two members."""
    import ray.data as rd

    banded = banded.materialize()
    if banded.count() <= driver_cap:
        out = _pairs_from_member_frame(
            banded.to_pandas(), id_col, bucket_cap, log_tag
        )
        if out is None:
            return None, None
        return rd.from_pandas(out), out

    emitted = banded.sort("bucket").map_batches(
        _BucketPairEmitter(id_col, bucket_cap), batch_format="pandas"
    ).materialize()

    meta = emitted.map_batches(
        lambda df: df[df["kind"] != 0], batch_format="pandas"
    ).to_pandas()
    over = meta[meta["kind"] == 2] if len(meta) else meta
    if len(over):
        _log_overflow(log_tag, len(over), int(over["id_b"].max()), bucket_cap)
    extra_frames = []
    if len(meta):
        bnd = meta[meta["kind"] == 1]
        for _, grp in bnd.groupby("bucket"):
            u = np.unique(grp["id_a"].to_numpy())[:bucket_cap]
            if u.size > 1:
                iu, jv = np.triu_indices(u.size, 1)
                extra_frames.append(pd.DataFrame(
                    {"id_a": u[iu].astype(np.int64),
                     "id_b": u[jv].astype(np.int64)}))

    pairs = emitted.map_batches(
        lambda df: df[df["kind"] == 0][["id_a", "id_b"]], batch_format="pandas"
    )
    if extra_frames:
        pairs = pairs.union(rd.from_pandas(pd.concat(extra_frames,
                                                     ignore_index=True)))
    # dedup pairs (bucket collisions): sort brings copies adjacent; in-batch
    # dedup removes all but block-boundary stragglers, which merely get
    # verified twice and drop out in the final output dedup
    pairs = pairs.sort(["id_a", "id_b"]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    ).materialize()
    return (pairs, None) if pairs.count() else (None, None)


def _pair_ids_of(pairs, pairs_df) -> np.ndarray:
    """Unique candidate ids — straight from the driver frame when the pair
    emission ran there, else one map over the pair Dataset."""
    if pairs_df is not None:
        return np.unique(np.concatenate([
            pairs_df["id_a"].to_numpy(), pairs_df["id_b"].to_numpy()
        ]))
    return _pair_ids(pairs)


def _pair_ids(pairs) -> np.ndarray:
    """Unique candidate ids of a pair Dataset (compact int64s)."""
    idp = pairs.map_batches(
        lambda df: pd.DataFrame(
            {"id": np.unique(np.concatenate([df["id_a"].to_numpy(),
                                             df["id_b"].to_numpy()]))}
        ),
        batch_format="pandas",
    ).to_pandas()
    return np.unique(idp["id"].to_numpy())


def _join_payloads(pairs, payload_a, payload_b, nparts: int):
    """Hash-join per-id payload datasets onto both sides of the pairs.
    .repartition() before every join input: Ray 2.49's hash join aggregator
    mangles the schema of EMPTY blocks ("No match or multiple matches for
    key field reference" in Acero), and filtered map_batches outputs (and
    join outputs themselves) routinely contain empty blocks. All inputs are
    candidate-scale, so the extra exchange is cheap."""
    return (
        pairs.repartition(nparts)
        .join(payload_a.repartition(nparts), "inner", nparts, on=("id_a",))
        .repartition(nparts)
        .join(payload_b.repartition(nparts), "inner", nparts, on=("id_b",))
    )


def minhash_near_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.8, k: int = 5,
                      n_perm: int = 128, bands: int = 16,
                      concurrency: int = 4,
                      bucket_cap: int = 512,
                      driver_cap: int = 5_000_000,
                      shingle_fn=None) -> pd.DataFrame:
    """Full MinHash+LSH near-dup pipeline -> DataFrame[(id_a, id_b, jaccard)]
    with id_a < id_b and exact shingle-Jaccard >= threshold. The scale
    re-expression of DUP_004 (rule_validator.py:307-322, all-pairs capped at
    5000 uniques) — LSH banding replaces the cap; a per-bucket membership cap
    (``bucket_cap``, smallest ids kept, truncation logged) bounds degenerate
    buckets instead of degenerate inputs.

    Every stage is distributed; the driver only ever touches compact
    metadata (block-boundary bucket runs, truncation stats, unique candidate
    ids) — never member lists, texts, or the pair loop:
      1. doc -> minhash bands -> (id, bucket) rows            [map_batches]
      2. sort by bucket -> vectorized per-run pair emission   [sort + map]
         with a 2-runs-per-block boundary stitch (same pattern as
         convstage.MergeSegments / keyed_reduce._InteriorReduce)
      3. pair dedup (a pair can collide in several bands)     [sort + map]
      4. candidate docs -> shingle sets, filtered re-read     [map_batches]
      5. hash-join shingles onto pairs (both sides candidate-
         scale, never the corpus) and verify exact Jaccard    [join + map]
    """
    empty = pd.DataFrame(columns=["id_a", "id_b", "jaccard"])

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (
            (df["band"].to_numpy().astype(np.int64) * np.int64(0x9E3779B9))
            ^ df["band_hash"].to_numpy()
        )
        return df[[id_col, "bucket"]]

    banded = ds.map_batches(
        MinHashBands(col=col, id_col=id_col, k=k, n_perm=n_perm, bands=bands,
                     shingle_fn=shingle_fn),
        batch_format="pandas",
    ).map_batches(fuse, batch_format="pandas")

    pairs, pairs_df = _candidate_pairs(banded, id_col, bucket_cap,
                                       "minhash_near_dups",
                                       driver_cap=driver_cap)
    if pairs is None:
        return empty
    out = _jaccard_verify_tail(ds, pairs, pairs_df, col=col, id_col=id_col,
                               k=k, threshold=threshold,
                               concurrency=concurrency,
                               driver_cap=driver_cap, shingle_fn=shingle_fn)
    if "id_a" not in out.columns or len(out) == 0:
        return empty
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _jaccard_verify_tail(ds, pairs, pairs_df=None, *, col: str, id_col: str,
                         k: int, threshold: float, concurrency: int,
                         driver_cap: int, shingle_fn=None) -> pd.DataFrame:
    """Exact-Jaccard verification of a candidate-pair Dataset, shared by the
    MinHash and SimHash-exact pipelines. Dual path (the driver_cap pattern):
    small candidate volume -> one filtered shingle pass + a pandas merge
    (beats ~6 Ray exchange launches); otherwise the shingle payloads are
    hash-joined onto the pairs distributed — both sides candidate-scale,
    never the corpus."""
    import ray

    # unique candidate ids (compact int64s) -> broadcast filter for the
    # shingle re-read; both join sides below are candidate-scale
    ids_ref = ray.put(_pair_ids_of(pairs, pairs_df))
    nparts = max(2, int(concurrency))
    n_pairs = len(pairs_df) if pairs_df is not None else pairs.count()
    if n_pairs <= max(0, driver_cap // 50):
        sh = ds.map_batches(
            lambda t: _shingle_frame(t, id_col, col, k, "id", "sh", ids_ref,
                                     shingle_fn),
            batch_format="pyarrow",
        ).to_pandas()
        j = (
            (pairs_df if pairs_df is not None else pairs.to_pandas())
            .merge(sh.rename(columns={"id": "id_a", "sh": "sh_a"}), on="id_a")
            .merge(sh.rename(columns={"id": "id_b", "sh": "sh_b"}), on="id_b")
        )
        return _verify_pairs(j, threshold)
    # shingle the candidate docs ONCE (materialized); the b-side is a
    # zero-copy column rename of the same blocks
    sh_a = ds.map_batches(
        lambda t: _shingle_frame(t, id_col, col, k, "id_a", "sh_a",
                                 ids_ref, shingle_fn),
        batch_format="pyarrow",
    ).materialize()
    sh_b = sh_a.map_batches(
        lambda t: t.rename_columns(["id_b", "sh_b"]),
        batch_format="pyarrow",
    )
    joined = _join_payloads(pairs, sh_a, sh_b, nparts)
    return joined.map_batches(
        lambda df: _verify_pairs(df, threshold), batch_format="pandas"
    ).to_pandas()


def simhash_exact_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                       k: int = 5, concurrency: int = 4,
                       bucket_cap: int = 512,
                       driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Exact-duplicate pairs (shingle-set equality, i.e. Jaccard == 1.0)
    with SimHash as the candidate generator -> DataFrame[(id_a, id_b,
    jaccard)]. Equal shingle sets imply equal 64-bit simhashes, so ONE
    full-width equality bucket (the max_hamming=0 pigeonhole) has perfect
    recall for set-equal pairs, and the exact-Jaccard verify keeps precision
    exact. The semantics are SQL-statable (group texts by their 5-gram
    shingle set), which gives the simhash banding + stitch + join skeleton a
    hash-checked oracle twin (queries.doc_simhash_planted). Reference
    ancestor: DUP_004 rule_validator.py:307-322."""

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        batch = add_simhash(batch, col=col, k=k)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy().astype(np.int64),
            "bucket": batch["simhash"].to_numpy().astype(np.int64),
        })

    empty = pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    banded = ds.map_batches(band_rows, batch_format="pandas")
    pairs, pairs_df = _candidate_pairs(banded, id_col, bucket_cap,
                                       "simhash_exact_dups",
                                       driver_cap=driver_cap)
    if pairs is None:
        return empty
    out = _jaccard_verify_tail(ds, pairs, pairs_df, col=col, id_col=id_col,
                               k=k, threshold=1.0, concurrency=concurrency,
                               driver_cap=driver_cap)
    if "id_a" not in out.columns or len(out) == 0:
        return empty
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_jaccard_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                       n: int = 3, threshold: float = 0.8,
                       n_perm: int = 128, bands: int = 16,
                       concurrency: int = 4, bucket_cap: int = 512,
                       driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Word n-gram Jaccard near-duplicate pairs -> DataFrame[(id_a, id_b,
    jaccard)]: the MinHash+LSH skeleton over hashed word n-gram sets
    instead of character shingles (the classic document-level n-gram
    Jaccard dedup; reference ancestor DUP_004 rule_validator.py:307-322).
    Candidate generation, boundary stitch, payload join, and the exact
    set-Jaccard verify are all shared with ``minhash_near_dups`` via the
    pluggable shingler."""
    import functools

    return minhash_near_dups(
        ds, col=col, id_col=id_col, threshold=threshold, n_perm=n_perm,
        bands=bands, concurrency=concurrency, bucket_cap=bucket_cap,
        driver_cap=driver_cap, shingle_fn=functools.partial(word_shingles, n=n),
    )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard between two texts (scalar reference for
    ``ngram_jaccard_dups``'s verify)."""
    sa, sb = word_shingles(a, n), word_shingles(b, n)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def simhash64(s: str, k: int = 5) -> np.uint64:
    """64-bit SimHash over character shingles (public scheme: sign-sum of
    feature-hash bits)."""
    h = char_shingles(s, k)
    if h.size == 0:
        return np.uint64(0)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.sum(axis=0).astype(np.int64) * 2 - np.int64(h.size)
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def add_simhash(batch: pd.DataFrame, col: str = "text", k: int = 5) -> pd.DataFrame:
    """Batch-vectorized SimHash: concatenate every doc's shingle set and
    vote per (doc, bit) with np.add.reduceat — no per-row Python beyond the
    shingling itself (same trick as MinHashBands). Bit-exact with
    ``simhash64``."""
    n = len(batch)
    if n == 0:
        batch["simhash"] = pd.Series(dtype=np.int64)
        return batch
    shingle_sets = [char_shingles(s, k) for s in batch[col]]
    lens = np.array([s.size for s in shingle_sets], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    allsh = np.concatenate(shingle_sets)
    votes = np.empty((n, 64), dtype=np.int64)
    for b0 in range(0, 64, 16):  # chunk bit planes to bound temporaries
        bits = (
            (allsh[:, None] >> np.arange(b0, b0 + 16, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        votes[:, b0:b0 + 16] = np.add.reduceat(bits, offsets, axis=0)
    sign = (votes * 2) > lens[:, None]
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = (sign.astype(np.uint64) * weights[None, :]).sum(axis=1)
    batch["simhash"] = out.astype(np.int64)
    return batch


def simhash_near_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, k: int = 5,
                      concurrency: int = 4, bucket_cap: int = 512,
                      driver_cap: int = 5_000_000) -> pd.DataFrame:
    """SimHash near-duplicate pairs -> DataFrame[(id_a, id_b, hamming)] with
    id_a < id_b and hamming distance <= ``max_hamming`` between 64-bit
    simhashes. Candidate generation uses the pigeonhole trick (public
    simhash-dedup scheme): split the 64 bits into ``max_hamming + 1`` bands —
    any pair within distance d must agree EXACTLY on at least one band — so
    candidates come from per-band equality buckets through the same
    distributed sort/pair-emit/stitch skeleton as MinHash, and the verify is
    one vectorized XOR-popcount over the joined hash payloads.

    The expensive shingling + bit-vote pass runs ONCE: the compact
    (id, simhash) dataset (16 bytes/doc — safe to materialize at any corpus
    size) is computed up front, band rows derive from it, and the verify
    joins against the same materialized hashes instead of re-reading and
    re-hashing candidate text."""
    import ray

    n_bands = max_hamming + 1
    width = 64 // n_bands

    hashes = ds.map_batches(
        lambda df: add_simhash(df, col=col, k=k)[[id_col, "simhash"]],
        batch_format="pandas",
    ).materialize()

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy().astype(np.int64)
        parts = []
        for bix in range(n_bands):
            sub = (h >> np.uint64(bix * width)) & np.uint64((1 << width) - 1)
            bucket = (sub.astype(np.int64) * np.int64(0x9E3779B9)) ^ np.int64(bix)
            parts.append(pd.DataFrame({id_col: ids, "bucket": bucket}))
        return pd.concat(parts, ignore_index=True)

    empty = pd.DataFrame(columns=["id_a", "id_b", "hamming"])
    banded = hashes.map_batches(band_rows, batch_format="pandas")
    pairs, pairs_df = _candidate_pairs(banded, id_col, bucket_cap,
                                       "simhash_near_dups",
                                       driver_cap=driver_cap)
    if pairs is None:
        return empty

    ids_ref = ray.put(_pair_ids_of(pairs, pairs_df))

    def hash_frame(t: pa.Table, out_id: str, out_h: str) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _r

        need = _r.get(ids_ref)
        sub = t.filter(pc.is_in(t[id_col],
                                value_set=pa.array(need, type=t[id_col].type)))
        return pa.table({out_id: sub[id_col].cast(pa.int64()),
                         out_h: sub["simhash"].cast(pa.int64())})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        d = hamming64(df["h_a"].to_numpy().astype(np.uint64),
                      df["h_b"].to_numpy().astype(np.uint64))
        keep = d <= max_hamming
        return pd.DataFrame({
            "id_a": df["id_a"].to_numpy()[keep].astype(np.int64),
            "id_b": df["id_b"].to_numpy()[keep].astype(np.int64),
            "hamming": d[keep],
        })

    nparts = max(2, int(concurrency))
    n_pairs = len(pairs_df) if pairs_df is not None else pairs.count()
    if n_pairs <= max(0, driver_cap // 50):
        hh = hashes.map_batches(
            lambda t: hash_frame(t, "id", "h"), batch_format="pyarrow"
        ).to_pandas()
        j = (
            (pairs_df if pairs_df is not None else pairs.to_pandas())
            .merge(hh.rename(columns={"id": "id_a", "h": "h_a"}), on="id_a")
            .merge(hh.rename(columns={"id": "id_b", "h": "h_b"}), on="id_b")
        )
        out = verify(j)
    else:
        h_a = hashes.map_batches(
            lambda t: hash_frame(t, "id_a", "h_a"), batch_format="pyarrow"
        ).materialize()
        h_b = h_a.map_batches(
            lambda t: t.rename_columns(["id_b", "h_b"]),
            batch_format="pyarrow",
        )
        out = _join_payloads(pairs, h_a, h_b, nparts).map_batches(
            verify, batch_format="pandas"
        ).to_pandas()
    if "id_a" not in out.columns or len(out) == 0:
        return empty
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hamming distance via SWAR popcount (the classic
    parallel bit-count): ~12 array ops total instead of a 64-iteration
    shift-and-mask loop — the verify stage XOR-popcounts every candidate
    pair, and biased simhash bits make candidate volume large."""
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


_PLANES_CACHE: dict = {}


def _hyperplanes(seed: int, bands: int, band_bits: int,
                 dim: int) -> np.ndarray:
    """Deterministic seeded hyperplane matrix, cached per WORKER PROCESS
    keyed by (seed, bands, band_bits, dim): stateless map_batches tasks
    then pay the allocation once per worker — no actor pool, no
    constructor args in the object store, parallelism bounded only by the
    cluster (the r4 actor-pool variant capped banding at `concurrency`
    actors and its spin-up dominated small runs)."""
    k = (seed, bands, band_bits, dim)
    h = _PLANES_CACHE.get(k)
    if h is None:
        rng = np.random.default_rng(seed)
        h = rng.standard_normal((bands * band_bits, dim))
        _PLANES_CACHE[k] = h
    return h


def hyperplane_bands(batch: pd.DataFrame, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", bands: int = 16,
                     band_bits: int = 12,
                     seed: int = 0x5EED) -> pd.DataFrame:
    """map_batches stage: embedding -> one row per random-hyperplane LSH
    band (SimHash-for-cosine, the public random-projection scheme):
    ``band_bits`` sign bits per band packed into an integer band hash. Two
    vectors at cosine c collide in a band with
    p = (1 - arccos(c)/pi)^band_bits; the defaults (16 bands x 12 bits)
    give recall ~0.995 at c>=0.95 while random (c~0) pairs collide in only
    ~0.4% of cases — fewer bits make the candidate set quadratic-ish in n
    (8 bits => ~6% of ALL pairs). The hyperplane matrix is seeded and
    process-cached (``_hyperplanes``); each batch is a single matmul."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "band": pd.Series(dtype=np.int64),
                             "band_hash": pd.Series(dtype=np.int64)})
    m = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
    planes = _hyperplanes(seed, bands, band_bits, m.shape[1])
    bits = (m @ planes.T) > 0  # (n, bands*bits)
    bb = bits.reshape(n, bands, band_bits)
    weights = (np.uint64(1) << np.arange(band_bits, dtype=np.uint64))
    bh = (bb.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
    # mix the band index into the hash so bands share one bucket space
    bh = bh * np.uint64(0x100000001B3) + np.arange(
        bands, dtype=np.uint64)[None, :]
    return pd.DataFrame({
        id_col: np.repeat(
            batch[id_col].to_numpy().astype(np.int64), bands),
        "band": np.tile(np.arange(bands, dtype=np.int64), n),
        "band_hash": bh.reshape(-1).astype(np.int64),
    })


class HyperplaneBands:
    """Callable-class wrapper over ``hyperplane_bands`` (kept for API
    compatibility; the pipeline uses the stateless function — the
    process-level matrix cache makes actor-held state redundant)."""

    def __init__(self, vec_col: str = "embedding", id_col: str = "vec_id",
                 bands: int = 16, band_bits: int = 12, dim: int | None = None,
                 seed: int = 0x5EED):
        self.vec_col, self.id_col = vec_col, id_col
        self.bands, self.band_bits = bands, band_bits
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return hyperplane_bands(
            batch, vec_col=self.vec_col, id_col=self.id_col,
            bands=self.bands, band_bits=self.band_bits, seed=self.seed)


def _vec_frame(t: pa.Table, id_col: str, vec_col: str, out_id: str,
               out_v: str, ids_ref) -> pa.Table:
    """Filtered projection: candidate ids -> normalized vector as BINARY
    (raw float64 bytes; Arrow's hash join rejects list payload columns)."""
    import pyarrow.compute as pc
    import ray

    need = ray.get(ids_ref)
    mask = pc.is_in(t[id_col], value_set=pa.array(need, type=t[id_col].type))
    sub = t.filter(mask)
    vecs = sub[vec_col].to_pylist()
    out = []
    for v in vecs:
        a = np.asarray(v, dtype=np.float64)
        a = a / max(np.linalg.norm(a), 1e-12)
        out.append(a.tobytes())
    return pa.table({
        out_id: sub[id_col].cast(pa.int64()),
        out_v: pa.array(out, type=pa.binary()),
    })


def _verify_cosine(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    cols = {"id_a": np.int64, "id_b": np.int64, "cosine": np.float64}
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    va = np.stack([np.frombuffer(b, dtype=np.float64) for b in df["v_a"]])
    vb = np.stack([np.frombuffer(b, dtype=np.float64) for b in df["v_b"]])
    # threshold the UNROUNDED cosine, round only the reported value —
    # rounding first would admit pairs strictly below threshold (e.g.
    # 0.9499996 -> 0.95), the same discipline as _verify_pairs
    sims = np.einsum("ij,ij->i", va, vb)
    keep = sims >= threshold
    return pd.DataFrame({
        "id_a": df["id_a"].to_numpy()[keep].astype(np.int64),
        "id_b": df["id_b"].to_numpy()[keep].astype(np.int64),
        "cosine": np.round(sims[keep], 6),
    })


def embedding_near_dups(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.95, bands: int = 16,
                        band_bits: int = 12, concurrency: int = 4,
                        bucket_cap: int = 1024,
                        driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs -> DataFrame[(id_a, id_b,
    cosine)] with id_a < id_b and exact cosine >= threshold.

    Same distributed skeleton as ``minhash_near_dups`` (candidate buckets ->
    sorted pair emission with boundary stitch and capped hot buckets ->
    hash-join payloads -> exact verify), with random-hyperplane LSH as the
    bucketing function instead of minhash bands. Nothing materializes the
    dataset on the driver; the verify is one vectorized einsum per batch.
    Chosen over IVF-probe bucketing for near-dup detection: hyperplane
    buckets give a tunable per-pair recall guarantee, while IVF centroid
    buckets miss boundary-crossing pairs unless probes are replicated."""
    import ray

    def band_and_fuse(df: pd.DataFrame) -> pd.DataFrame:
        out = hyperplane_bands(df, vec_col=vec_col, id_col=id_col,
                               bands=bands, band_bits=band_bits)
        out["bucket"] = (
            (out["band"].to_numpy() * np.int64(0x9E3779B9))
            ^ out["band_hash"].to_numpy()
        )
        return out[[id_col, "bucket"]]

    empty = pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    # ONE stateless task stage, not an actor pool + a second fuse stage:
    # the hyperplane matrix is process-cached by seed (`_hyperplanes`), so
    # tasks pay the allocation once per worker with no pool spin-up, no
    # constructor args in the object store, and parallelism bounded by the
    # cluster instead of `concurrency` actors (the r4 pool variant
    # regressed the bench 3.2x; the extra stage doubled task launches)
    banded = ds.map_batches(band_and_fuse, batch_format="pandas")
    pairs, pairs_df = _candidate_pairs(banded, id_col, bucket_cap,
                                       "embedding_near_dups",
                                       driver_cap=driver_cap)
    if pairs is None:
        return empty
    ids_ref = ray.put(_pair_ids_of(pairs, pairs_df))
    nparts = max(2, int(concurrency))
    n_pairs = len(pairs_df) if pairs_df is not None else pairs.count()
    if n_pairs <= max(0, driver_cap // 50):
        # small candidate volume: one filtered vector pass + a pandas merge
        # (driver_cap dual path; driver_cap=0 forces the distributed branch)
        vv = ds.map_batches(
            lambda t: _vec_frame(t, id_col, vec_col, "id", "v", ids_ref),
            batch_format="pyarrow",
        ).to_pandas()
        j = (
            (pairs_df if pairs_df is not None else pairs.to_pandas())
            .merge(vv.rename(columns={"id": "id_a", "v": "v_a"}), on="id_a")
            .merge(vv.rename(columns={"id": "id_b", "v": "v_b"}), on="id_b")
        )
        out = _verify_cosine(j, threshold)
    else:
        v_a = ds.map_batches(
            lambda t: _vec_frame(t, id_col, vec_col, "id_a", "v_a", ids_ref),
            batch_format="pyarrow",
        ).materialize()
        v_b = v_a.map_batches(
            lambda t: t.rename_columns(["id_b", "v_b"]),
            batch_format="pyarrow",
        )
        joined = _join_payloads(pairs, v_a, v_b, nparts)
        out = joined.map_batches(
            lambda df: _verify_cosine(df, threshold), batch_format="pandas"
        ).to_pandas()
    if "id_a" not in out.columns or len(out) == 0:
        return empty
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dup_clusters(pairs: pd.DataFrame, *, a_col: str = "id_a",
                 b_col: str = "id_b") -> pd.DataFrame:
    """Connected components over a COMPACT duplicate-pair list -> one
    (doc_id, cluster_id) row per member, cluster_id = smallest doc_id in
    the component (the canonical-keeper convention of every dedup stage
    here). Union-find runs driver-side because the pair list is already
    o(corpus): only verified duplicates survive the banded LSH + verify
    funnel, so even a 10^12-doc corpus reaches this step as |dup pairs|
    rows, not |docs|. (A corpus that is MOSTLY one duplicate cluster
    degrades — the scale path for that regime is pointer-doubling label
    propagation over the pair Dataset, trading ~log(diameter) extra
    shuffles; not needed while pairs fit the driver, which bucket_cap
    already bounds.) Reference ancestor: duplicate GROUP reporting in
    rule_validator.py DUP_* result assembly."""
    cols = ["doc_id", "cluster_id"]
    if len(pairs) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    a = pairs[a_col].to_numpy(np.int64)
    b = pairs[b_col].to_numpy(np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(a.tolist(), b.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by smaller root so the root IS the component minimum
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = np.unique(np.concatenate([a, b]))
    labels = np.fromiter((find(int(x)) for x in nodes), dtype=np.int64,
                         count=len(nodes))
    return pd.DataFrame({"doc_id": nodes, "cluster_id": labels})


def dup_clusters_ds(pairs, *, a_col: str = "id_a", b_col: str = "id_b",
                    nparts: int = 8, max_rounds: int = 64):
    """Distributed connected components over a duplicate-pair DATASET ->
    Dataset[(doc_id, cluster_id)], cluster_id = component minimum — the
    scale fallback ``dup_clusters``'s docstring promises for the regime
    where the verified-pair list itself exceeds the driver (a corpus that
    is mostly one duplicate cluster).

    Algorithm: min-label propagation with pointer doubling. Each round,
    every node takes the min of its own label, its neighbors' labels
    (one hash join of the edge list against the label table), and its
    label's label (a second join — the pointer-doubling step that makes
    convergence O(log diameter) rounds instead of O(diameter)). Labels
    are monotone non-increasing, so the global label SUM is a convergence
    witness: one unchanged sum proves a fixpoint. Per round: 2 hash joins
    + 1 groupby-min over |pairs|-scale rows — nothing ever collects."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def undirected(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": np.concatenate([df[a_col].to_numpy(np.int64),
                                   df[b_col].to_numpy(np.int64)]),
            "dst": np.concatenate([df[b_col].to_numpy(np.int64),
                                   df[a_col].to_numpy(np.int64)]),
        })

    edges = pairs.map_batches(undirected,
                              batch_format="pandas").materialize()
    labels = (
        edges.groupby("src").aggregate(Min("dst"))
        .map_batches(
            lambda df: pd.DataFrame({
                "node": df["src"].to_numpy(np.int64),
                "label": np.minimum(df["src"].to_numpy(np.int64),
                                    df["min(dst)"].to_numpy(np.int64)),
            }),
            batch_format="pandas")
        .materialize()
    )

    if labels.count() == 0:
        return rd.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "cluster_id": pd.Series([], dtype=np.int64)}))

    def lab_sum(lab) -> int:
        agg = lab.aggregate(Sum("label"))
        return int(agg["sum(label)"])

    prev = lab_sum(labels)
    for _ in range(max_rounds):
        # neighbor min: label(dst) flows to src
        nbr = (
            edges.repartition(nparts)
            .join(labels.map_batches(
                lambda df: df.rename(columns={"node": "dst",
                                              "label": "cand"}),
                batch_format="pandas").repartition(nparts),
                "inner", nparts, on=("dst",))
            .map_batches(lambda df: df.rename(
                columns={"src": "node"})[["node", "cand"]],
                batch_format="pandas")
        )
        # pointer doubling: label(label(node)) flows to node
        ptr = (
            labels.map_batches(
                lambda df: df.rename(columns={"label": "key"}),
                batch_format="pandas").repartition(nparts)
            .join(labels.map_batches(
                lambda df: df.rename(columns={"node": "key",
                                              "label": "cand"}),
                batch_format="pandas").repartition(nparts),
                "inner", nparts, on=("key",))
            .map_batches(lambda df: df[["node", "cand"]],
                         batch_format="pandas")
        )
        own = labels.map_batches(
            lambda df: df.rename(columns={"label": "cand"}),
            batch_format="pandas")
        labels = (
            nbr.union(ptr).union(own)
            .groupby("node").aggregate(Min("cand"))
            .map_batches(lambda df: df.rename(
                columns={"min(cand)": "label"}),
                batch_format="pandas")
            .materialize()
        )
        cur = lab_sum(labels)
        if cur == prev:  # labels never increase: equal sum == fixpoint
            break
        prev = cur
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["node"].to_numpy(np.int64),
            "cluster_id": df["label"].to_numpy(np.int64)}),
        batch_format="pandas")


class _Decontam:
    """Actor-pool membership stage: the benchmark shingle set arrives via
    ONE object-store broadcast per actor (ray.get in __init__)."""

    def __init__(self, grams_ref, col: str, id_col: str, n: int):
        import ray

        self.grams = ray.get(grams_ref)
        self.col, self.id_col, self.n = col, id_col, n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [self.id_col, "n_hits", "contaminated"]
        if len(df) == 0:
            return pd.DataFrame(columns=out_cols)
        grams, n = self.grams, self.n
        hits = np.empty(len(df), dtype=np.int64)
        for j, s in enumerate(df[self.col].to_numpy()):
            words = s.split()
            if len(words) < n:
                cand = {" ".join(words)}
            else:
                cand = {" ".join(words[i:i + n])
                        for i in range(len(words) - n + 1)}
            hits[j] = len(cand & grams)
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "n_hits": hits,
            "contaminated": (hits > 0).astype(np.int64),
        })


def bench_shingle_set(texts, n: int = 8) -> set:
    """Exact word n-gram STRING set of a benchmark corpus (strings, not
    hashes, so membership is collision-free and bit-matches the SQL twin).
    Same short-doc rule as word_shingles: <n words contribute the whole
    token string."""
    grams: set = set()
    for s in texts:
        words = s.split()
        if len(words) < n:
            grams.add(" ".join(words))
        else:
            grams.update(" ".join(words[i:i + n])
                         for i in range(len(words) - n + 1))
    return grams


def decontaminate(ds, bench_texts, *, col: str = "text",
                  id_col: str = "doc_id", n: int = 8,
                  concurrency: int | tuple = (1, 4)):
    """Training-set decontamination against a held-out benchmark: flag
    every document sharing an n-word shingle with any benchmark text, with
    ``n_hits`` = number of DISTINCT shared shingles. Benchmarks are tiny
    relative to a training corpus, so the exact shingle-string set
    broadcasts once per actor (ray.put + __init__ fetch) and the corpus
    side streams through a single map_batches — no shuffle anywhere.
    The reference has no corpus-overlap operator; shingling follows the
    word n-gram rule of ``word_shingles`` so the SQL twin is the same
    space-joined distinct n-gram list."""
    import ray

    ref = ray.put(bench_shingle_set(bench_texts, n))
    return ds.map_batches(
        _Decontam, fn_constructor_args=(ref, col, id_col, n),
        batch_format="pandas", concurrency=concurrency,
    )


def _byte_lengths(texts: np.ndarray) -> np.ndarray:
    """UTF-8 byte length per doc, Arrow-side (one C pass) with a per-doc
    errors='ignore' fallback for non-encodable input — matching exactly
    which encoding the shingle kernels use on the same input."""
    import pyarrow.compute as pc

    try:
        arr = pa.array(texts, type=pa.large_string())
        return pc.binary_length(
            arr.cast(pa.large_binary())).to_numpy().astype(np.int64)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return np.array(
            [len(str(s).encode("utf-8", "ignore")) for s in texts],
            dtype=np.int64)


def _window_hash_rows(df: pd.DataFrame, col: str, id_col: str, window: int
                      ) -> pd.DataFrame:
    """Per-doc DISTINCT window-hash inventory rows (hash, doc_id). Docs
    shorter than ``window`` bytes have no windows and emit nothing."""
    texts = df[col].fillna("").to_numpy(dtype=object)
    blen = _byte_lengths(texts)
    keep = blen >= window
    if not keep.any():
        return pd.DataFrame({"h": np.zeros(0, np.uint64),
                             id_col: np.zeros(0, object)})
    texts, ids = texts[keep], df[id_col].to_numpy()[keep]
    hashes, lens = char_shingles_batch(texts, k=window)  # per-doc unique
    return pd.DataFrame({"h": hashes,
                         id_col: np.repeat(ids, lens)})


class _WindowVerify:
    """Actor: holds the broadcast candidate-hash array; per batch extracts
    the ACTUAL window substrings whose hash is a candidate — exactness
    against rolling-hash collisions is restored downstream by grouping on
    the literal bytes, and only candidate windows (a tiny fraction) ever
    leave the batch."""

    def __init__(self, cand_ref, col: str, id_col: str, window: int):
        import ray

        self.cand = np.sort(ray.get(cand_ref))  # sorted for searchsorted
        self.col, self.id_col, self.window = col, id_col, window

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        w = self.window
        empty = pd.DataFrame({self.id_col: np.zeros(0, object),
                              "win": np.zeros(0, object),
                              "h": np.zeros(0, np.uint64)})
        texts = df[self.col].fillna("").to_numpy(dtype=object)
        # Arrow-side byte lengths for the filter; docs encode in Python
        # ONLY when they carry a candidate hit (a tiny fraction)
        keep = _byte_lengths(texts) >= w
        if not keep.any():
            return empty
        kept = np.flatnonzero(keep)
        ids = df[self.id_col].to_numpy()[kept]
        # ONE batch kernel pass (multiset, stream order), then a single
        # vectorized membership test; Python touches only the hits
        hs, lens = char_shingle_windows_batch(texts[kept], k=w)
        pos = np.searchsorted(self.cand, hs)
        pos[pos >= self.cand.size] = 0
        hit = np.flatnonzero(self.cand[pos] == hs)
        if hit.size == 0:
            return empty
        off = np.concatenate([[0], np.cumsum(lens)])
        doc_idx = np.searchsorted(off, hit, side="right") - 1
        win_pos = hit - off[doc_idx]
        # group on the LITERAL BYTES — decode-ignore would conflate
        # distinct byte windows that strip to the same string on
        # non-ASCII text (same (id, bytes) -> same hash, so the
        # overwrite is harmless)
        seen: dict = {}
        enc_cache: dict = {}
        for i, d, p in zip(hit, doc_idx, win_pos):
            b = enc_cache.get(d)
            if b is None:
                b = str(texts[kept[d]]).encode("utf-8", "ignore")
                enc_cache[d] = b
            seen[(ids[d], bytes(b[p:p + w]))] = hs[i]
        keys = list(seen)
        return pd.DataFrame({self.id_col: [k[0] for k in keys],
                             "win": [k[1] for k in keys],
                             "h": np.fromiter(seen.values(), np.uint64,
                                              len(seen))})


def shared_window_docs(ds, *, col: str = "text", id_col: str = "doc_id",
                       window: int = 32, max_candidates: int = 2_000_000,
                       concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """EXACT substring-level duplicate detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" semantics,
    hash-inventory form): find every document that shares a verbatim
    ``window``-byte substring with another document, reporting how many
    distinct such windows each document carries.

    Scale shape — never all-pairs, never raw text through a shuffle:
      1. inventory: one rolling-hash pass per batch (concatenated-buffer
         kernel), per-doc DISTINCT hashes -> compact (hash, doc_id) rows;
      2. count docs per hash with the keyed reduce; hashes with >= 2 docs
         become the candidate set (capped at ``max_candidates`` with a
         logged truncation, like the LSH bucket caps);
      3. verify: candidates broadcast once per actor (ray.put), a second
         streaming scan extracts only candidate windows' literal bytes,
         and grouping on (hash, substring) kills rolling-hash collisions —
         the result is exact on the byte level.
    Windows are BYTE windows; the SQL twin's character substrings coincide
    on single-byte text (true for this corpus; documented caveat).
    -> DataFrame[(id_col, n_shared_windows)] sorted by id."""
    import logging

    import ray

    from ..stages.keyed_reduce import keyed_reduce_pandas

    inv = ds.map_batches(
        lambda df: _window_hash_rows(df, col, id_col, window),
        batch_format="pandas")
    counts = keyed_reduce_pandas(inv, ["h"], {"n_docs": (id_col, "count")})
    cand = counts.loc[counts["n_docs"] >= 2, "h"].to_numpy()
    if cand.size > max_candidates:
        logging.getLogger(__name__).warning(
            "shared_window_docs: %d candidate hashes truncated to %d",
            cand.size, max_candidates)
        cand = np.sort(cand)[:max_candidates]
    if cand.size == 0:
        return pd.DataFrame({id_col: [], "n_shared_windows": []})
    ref = ray.put(cand.astype(np.uint64))
    wins = ds.map_batches(
        _WindowVerify, fn_constructor_args=(ref, col, id_col, window),
        batch_format="pandas", concurrency=concurrency,
    ).to_pandas()
    if len(wins) == 0:
        return pd.DataFrame({id_col: [], "n_shared_windows": []})
    per_win = wins.groupby(["h", "win"])[id_col].nunique()
    dup_wins = per_win[per_win >= 2].reset_index()[["h", "win"]]
    hits = wins.merge(dup_wins, on=["h", "win"])
    out = (hits.groupby(id_col)["win"].nunique()
           .reset_index(name="n_shared_windows"))
    out["n_shared_windows"] = out["n_shared_windows"].astype(np.int64)
    return out.sort_values(id_col, kind="stable").reset_index(drop=True)

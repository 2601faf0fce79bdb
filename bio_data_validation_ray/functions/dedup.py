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
                 k: int = 5, n_perm: int = 128, bands: int = 16):
        assert n_perm % bands == 0
        self.col, self.id_col = col, id_col
        self.k, self.n_perm, self.bands = k, n_perm, bands
        self.rows_per_band = n_perm // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({self.id_col: [], "band": [], "band_hash": []})
        # batch-vectorized minhash: concatenate every doc's shingle set and
        # min-reduce per (permutation, doc) with reduceat — no per-doc loop
        shingle_sets = [char_shingles(s, self.k) for s in batch[self.col]]
        lens = np.array([s.size for s in shingle_sets], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        allsh = np.concatenate(shingle_sets) if lens.sum() else np.zeros(0, np.uint64)
        sigs = np.empty((n, self.n_perm), dtype=np.uint64)
        if allsh.size:
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


def minhash_near_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.8, k: int = 5,
                      n_perm: int = 128, bands: int = 16,
                      concurrency: int = 4) -> pd.DataFrame:
    """Full MinHash+LSH near-dup pipeline -> DataFrame[(id_a, id_b, jaccard)]
    with id_a < id_b and exact shingle-Jaccard >= threshold.

    Candidate generation is fully distributed; verification re-reads only the
    candidate documents (at 100 TB: a filtered, pushdown-friendly re-read,
    same pattern as the conversation exact fallback)."""
    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    from ..stages.keyed_reduce import keyed_reduce_pandas

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (
            (df["band"].to_numpy().astype(np.int64) * np.int64(0x9E3779B9))
            ^ df["band_hash"].to_numpy()
        )
        return df[[id_col, "bucket"]]

    banded = ds.map_batches(
        MinHashBands(col=col, id_col=id_col, k=k, n_perm=n_perm, bands=bands),
        batch_format="pandas",
    ).map_batches(fuse, batch_format="pandas").materialize()
    # buckets with >1 doc -> candidate pairs. Bucket sizes via the vectorized
    # keyed reduce; hot-bucket keys broadcast back as a filter — no per-group
    # Python anywhere.
    counts = keyed_reduce_pandas(
        banded, ["bucket"], {"c": (id_col, "count")}
    )
    hot = counts[counts["c"] > 1]
    if len(hot) == 0:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    hot_keys = set(hot["bucket"])
    members = banded.map_batches(
        lambda df: df[df["bucket"].isin(hot_keys)], batch_format="pandas"
    ).to_pandas()
    members = members.drop_duplicates()
    # vectorized pair generation: self-join on bucket
    j = members.merge(members, on="bucket", suffixes=("_a", "_b"))
    cand = j[j[f"{id_col}_a"] < j[f"{id_col}_b"]][
        [f"{id_col}_a", f"{id_col}_b"]
    ].rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})
    cand = cand.drop_duplicates().reset_index(drop=True)
    if len(cand) == 0:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    need = set(cand["id_a"]) | set(cand["id_b"])
    texts = (
        ds.map_batches(
            lambda b: b[b[id_col].isin(need)][[id_col, col]], batch_format="pandas"
        )
        .to_pandas()
        .set_index(id_col)[col]
        .to_dict()
    )
    shingle_cache = {i: char_shingles(texts[i], k) for i in need}

    def fast_jaccard(a, b):
        sa, sb = shingle_cache[a], shingle_cache[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        return inter / union if union else 1.0

    jac = [fast_jaccard(a, b) for a, b in zip(cand["id_a"], cand["id_b"])]
    cand["jaccard"] = np.round(jac, 6)
    out = cand[cand["jaccard"] >= threshold].reset_index(drop=True)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


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


def add_simhash(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch["simhash"] = [np.int64(simhash64(s).astype(np.int64)) for s in batch[col]]
    return batch


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def embedding_near_dups(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.95) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs via blocked matmul: each batch's
    normalized vectors are scored against the full normalized matrix
    (broadcast once via ray.put). O(n·n/B) flops distributed over batches;
    for >10^7 vectors swap the broadcast matrix for the IVF index in
    similarity.py."""
    import ray

    full = ds.to_pandas()
    ids = full[id_col].to_numpy()
    m = np.stack(full[vec_col].to_numpy())
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, m))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, mat = ray.get(ref)
        q = np.stack(batch[vec_col].to_numpy())
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ mat.T
        qa, qb = np.nonzero(sims >= threshold)
        a = batch[id_col].to_numpy()[qa]
        b = all_ids[qb]
        keep = a < b
        return pd.DataFrame(
            {"id_a": a[keep], "id_b": b[keep],
             "cosine": np.round(sims[qa, qb][keep], 6)}
        )

    out = ds.map_batches(score, batch_format="pandas", batch_size=1024).to_pandas()
    if "id_a" not in out.columns:
        return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

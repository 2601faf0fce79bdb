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


def exact_dedup_groups(ds, id_col: str = "doc_id", col: str = "text"):
    """-> Dataset[(doc_id=min id per identical text, n_copies)] — the
    hash-partitioned re-expression of DUP_001/DUP_003
    (rule_validator.py:261-305). Shuffles only (hash, id)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, col=col)[[id_col, "content_hash"]],
        batch_format="pandas",
    )
    agg = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    )
    return agg.drop_columns(["content_hash"])


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
                 k: int = 5, n_perm: int = 128, bands: int = 32):
        assert n_perm % bands == 0
        self.col, self.id_col = col, id_col
        self.k, self.n_perm, self.bands = k, n_perm, bands
        self.rows_per_band = n_perm // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        r = self.rows_per_band
        for i, s in zip(batch[self.id_col], batch[self.col]):
            sig = minhash_signature(char_shingles(s, self.k), self.n_perm)
            for b in range(self.bands):
                chunk = sig[b * r:(b + 1) * r]
                h = np.uint64(0xCBF29CE484222325)
                for v in chunk:
                    h = h * np.uint64(0x100000001B3) + v
                ids.append(i)
                band_ids.append(b)
                band_hashes.append(np.int64(h.astype(np.int64)))
        return pd.DataFrame(
            {self.id_col: ids, "band": band_ids, "band_hash": band_hashes}
        )


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def minhash_near_dups(ds, *, col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.8, k: int = 5,
                      n_perm: int = 128, bands: int = 32,
                      concurrency: int = 4) -> pd.DataFrame:
    """Full MinHash+LSH near-dup pipeline -> DataFrame[(id_a, id_b, jaccard)]
    with id_a < id_b and exact shingle-Jaccard >= threshold.

    Candidate generation is fully distributed; verification re-reads only the
    candidate documents (at 100 TB: a filtered, pushdown-friendly re-read,
    same pattern as the conversation exact fallback)."""
    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    banded = ds.map_batches(
        MinHashBands(col=col, id_col=id_col, k=k, n_perm=n_perm, bands=bands),
        batch_format="pandas",
        concurrency=concurrency,
    )
    # buckets with >1 doc -> candidate pairs
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    cand = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
    cand = cand.drop_duplicates().reset_index(drop=True)
    need = set(cand["id_a"]) | set(cand["id_b"])
    texts = (
        ds.map_batches(
            lambda b: b[b[id_col].isin(need)][[id_col, col]], batch_format="pandas"
        )
        .to_pandas()
        .set_index(id_col)[col]
        .to_dict()
    )
    jac = [jaccard(texts[a], texts[b], k) for a, b in zip(cand["id_a"], cand["id_b"])]
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
    votes = bits.sum(axis=0) * 2 - h.size
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

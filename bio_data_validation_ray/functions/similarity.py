"""Similarity search over an embedding column (list<float>).

- ``topk_cosine``: brute-force cosine top-k — the exact baseline. Per batch:
  one numpy matmul against the (broadcast) query matrix, local top-k, then a
  tiny global merge. The query matrix ships once via ray.put, not per batch.
- ``IVFIndex``: the scale path — coarse k-means-style centroids (built from a
  deterministic sample), vectors bucketed by nearest centroid; queries probe
  only the ``nprobe`` nearest buckets. Bucket assignment is a vectorized
  map_batches stage; the index (centroids) broadcasts once.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def quantize_embeddings(ds, *, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> pd.DataFrame:
    """Symmetric per-vector int8 quantization (the standard embedding
    compression step before ANN indexing at scale): q = round_half_away(
    127 * x / max|x|) with an all-zero vector mapping to zeros. Exploded to
    one (vec_id, dim, q) row per component so the result is integer-exact
    and SQL-statable (queries.emb_quantize oracle; arithmetic is done in
    float64 on both sides — half-away rounding matches SQL round())."""
    import pyarrow as pa

    def q(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
        if V.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        mx = np.abs(V).max(axis=1)
        scale = np.where(mx == 0, 1.0, mx)
        y = 127.0 * V / scale[:, None]
        Q = (np.floor(np.abs(y) + 0.5) * np.sign(y)).astype(np.int64)
        n, d = Q.shape
        return pa.table({
            id_col: np.repeat(ids, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "q": Q.reshape(-1),
        })

    out = ds.map_batches(q, batch_format="pyarrow").to_pandas()
    return out.sort_values([id_col, "dim"]).reset_index(drop=True)


def topk_cosine(ds, query: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
                vec_col: str = "embedding", batch_size: int = 4096) -> pd.DataFrame:
    """Exact top-k by cosine vs a single query vector.
    -> DataFrame[(vec_id, cosine)] sorted by (-cosine, vec_id), rounded 6dp
    (ties broken by id so results are deterministic and oracle-comparable)."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    qref = ray.put(q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:  # e.g. a block fully pruned by an IVF probe
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        qv = ray.get(qref)
        m = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = np.round(m @ qv, 6)
        order = np.lexsort((batch[id_col].to_numpy(), -sims))[:k]
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[order], "cosine": sims[order]}
        )

    parts = ds.map_batches(
        local_topk, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    parts = parts.sort_values(["cosine", id_col], ascending=[False, True],
                              kind="stable")
    return parts.head(k).reset_index(drop=True)


class IVFIndex:
    """Inverted-file ANN index (public IVF-flat scheme, cosine metric)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids.astype(np.float64))

    @classmethod
    def train(cls, sample: np.ndarray, n_lists: int = 16, iters: int = 10,
              seed: int = 42) -> "IVFIndex":
        """Mini k-means on a driver-side sample (deterministic)."""
        rng = np.random.default_rng(seed)
        x = _normalize(sample.astype(np.float64))
        idx = rng.choice(len(x), size=min(n_lists, len(x)), replace=False)
        c = x[idx].copy()
        for _ in range(iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        return cls(c)

    def assign_batch(self, batch: pd.DataFrame, vec_col: str = "embedding") -> pd.DataFrame:
        if len(batch) == 0:
            batch["ivf_list"] = pd.Series([], dtype=np.int64)
            return batch
        m = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        batch["ivf_list"] = np.argmax(m @ self.centroids.T, axis=1).astype(np.int64)
        return batch

    def probe_lists(self, query: np.ndarray, nprobe: int = 4) -> np.ndarray:
        q = np.asarray(query, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        return np.argsort(-(self.centroids @ q))[:nprobe]


def ivf_topk(ds, query: np.ndarray, k: int = 10, *, index: IVFIndex,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> pd.DataFrame:
    """One-shot ANN top-k: assign + filter + scan in a single pass. For
    repeated queries build an ``IVFStore`` instead — it materializes the
    assignment once as ivf_list-partitioned Parquet, turning every probe
    into a partition-pruned read."""
    import ray

    lists = set(int(x) for x in index.probe_lists(query, nprobe))
    iref = ray.put(index)

    assigned = ds.map_batches(
        lambda b: ray.get(iref).assign_batch(b, vec_col), batch_format="pandas"
    )
    pruned = assigned.map_batches(
        lambda b: b[b["ivf_list"].isin(lists)].drop(columns=["ivf_list"]),
        batch_format="pandas",
    )
    return topk_cosine(pruned, query, k, id_col=id_col, vec_col=vec_col)


class IVFStore:
    """Materialized IVF index: vectors written ONCE as Parquet partitioned
    by ``ivf_list`` (hive layout), so each query reads only its ``nprobe``
    probed partitions — a partition-pruned read, not a full scan + filter.
    This is the at-scale layout (the partition key IS the inverted list);
    rebuilding is only needed when the corpus or centroids change."""

    def __init__(self, index: IVFIndex, path: str,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.index, self.path = index, path
        self.id_col, self.vec_col = id_col, vec_col

    @classmethod
    def build(cls, ds, index: IVFIndex, path: str, *,
              id_col: str = "vec_id", vec_col: str = "embedding") -> "IVFStore":
        import ray

        iref = ray.put(index)
        assigned = ds.map_batches(
            lambda b: ray.get(iref).assign_batch(b, vec_col),
            batch_format="pandas",
        )
        assigned.write_parquet(path, partition_cols=["ivf_list"], mode="overwrite")
        return cls(index, path, id_col=id_col, vec_col=vec_col)

    def topk(self, query: np.ndarray, k: int = 10,
             nprobe: int = 4) -> pd.DataFrame:
        import ray.data as rd

        import glob

        lists = [int(x) for x in self.index.probe_lists(query, nprobe)]
        files = []
        for li in lists:
            files += sorted(glob.glob(
                os.path.join(self.path, f"ivf_list={li}", "*.parquet")))
        if not files:
            return pd.DataFrame(columns=[self.id_col, "cosine"])
        pruned = rd.read_parquet(files)
        return topk_cosine(pruned, query, k, id_col=self.id_col,
                           vec_col=self.vec_col)


def _quantize_rows(V: np.ndarray) -> np.ndarray:
    """Row-wise symmetric int8-scale quantization (same arithmetic as
    quantize_embeddings: float64, half-away rounding) as an int64 matrix."""
    if V.size == 0:
        return V.astype(np.int64)
    mx = np.abs(V).max(axis=1)
    scale = np.where(mx == 0, 1.0, mx)
    y = 127.0 * V / scale[:, None]
    return (np.floor(np.abs(y) + 0.5) * np.sign(y)).astype(np.int64)


def _seed_centroids(ds, n_clusters: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic centroid seed set: the quantized vectors of the
    ``n_clusters`` lowest ids (SQL-statable, so assignment gets an exact
    oracle). Only the seed rows are collected — the scan is column-pruned
    and the result is tiny."""
    import pyarrow.compute as pc

    # exact "n lowest ids" for ANY id distribution (ids need not be dense
    # or 0-based): mergeable per-batch nsmallest partials, n rows each
    seed = ds.map_batches(
        lambda df: df.nsmallest(n_clusters, id_col),
        batch_format="pandas",
    ).to_pandas()
    seed = seed.nsmallest(n_clusters, id_col).sort_values(id_col)
    if len(seed) == 0:
        raise ValueError("_seed_centroids: empty dataset")
    return _quantize_rows(np.stack(seed[vec_col].to_numpy()).astype(np.float64))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: a BIJECTIVE 64-bit mixer whose output is
    non-monotone in the input (a bare Knuth multiply mod 2^64 is strictly
    order-preserving for ids < 2^64/2654435761 ≈ 7e9 — 'smallest hash'
    would then be exactly 'smallest id', the bias this sample exists to
    avoid). uint64 arithmetic wraps, which is the intended mod-2^64."""
    h = x.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _hash_sample(ds, n: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic pseudo-random sample of ~``n`` vectors — the one
    distributed splitmix64 top-k draw (windows.uniform_sample: mergeable
    nsmallest partials, n rows per batch, driver nsmallest) projected to
    the vector matrix. Unbiased w.r.t. id order (unlike a lowest-id
    sample, which inherits any id/content correlation) and stable across
    runs/blockings. Only the sample rows are ever collected."""
    from .windows import uniform_sample

    samp = uniform_sample(ds, k=n, id_col=id_col,
                          columns=[id_col, vec_col])
    if len(samp) == 0:
        raise ValueError("_hash_sample: empty dataset")
    samp = samp.sort_values(id_col)
    return np.stack(samp[vec_col].to_numpy()).astype(np.float64)


def _trained_centroids(ds, n_clusters: int, id_col: str, vec_col: str,
                       train_sample: int = 4096,
                       iters: int = 10) -> np.ndarray:
    """Balanced centroids for the 100-TB path: mini k-means
    (``IVFIndex.train``'s loop) over a deterministic hash sample, then
    quantized into the same int64 space as the vectors so assignment
    arithmetic stays identical to the seed path. Unlike seed-by-lowest-id
    this adapts centroids to the data distribution, which is what bounds
    cluster sizes when clusters must grow with corpus size."""
    x = _hash_sample(ds, train_sample, id_col, vec_col)
    idx = IVFIndex.train(x, n_lists=n_clusters, iters=iters)
    return _quantize_rows(idx.centroids)


def _centroids_of(ds, n_clusters: int, id_col: str, vec_col: str,
                  centroids) -> np.ndarray:
    if isinstance(centroids, np.ndarray):
        return _quantize_rows(centroids.astype(np.float64))
    if centroids == "trained":
        return _trained_centroids(ds, n_clusters, id_col, vec_col)
    if centroids == "seed":
        return _seed_centroids(ds, n_clusters, id_col, vec_col)
    raise ValueError(f"centroids must be 'seed', 'trained' or an array, "
                     f"got {centroids!r}")


def cluster_assign(ds, *, n_clusters: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding", centroids="seed"):
    """Nearest-centroid cluster assignment over quantized embeddings —
    integer-exact squared-L2, ties to the lowest centroid id (np.argmin
    takes the first minimum). The centroid matrix broadcasts once via
    ray.put; per batch one int64 matmul. Returns Dataset[(vec_id, cluster)].

    ``centroids``: 'seed' (the n_clusters lowest-id vectors — SQL-statable,
    so assignment gets an exact oracle), 'trained' (mini k-means over a
    deterministic hash sample — the scale path: balanced clusters for any
    data distribution), or an explicit float array.

    This is the bucketing step of SemDeDup-style semantic dedup (Abbas et
    al. 2023): clusters bound the pairwise-comparison cost downstream."""
    import pyarrow as pa
    import ray

    cref = ray.put(_centroids_of(ds, n_clusters, id_col, vec_col,
                                 centroids))

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        C = ray.get(cref)
        Q = _quantize_rows(np.asarray(t[vec_col].to_pylist(), dtype=np.float64))
        d2 = ((Q * Q).sum(1)[:, None] - 2 * (Q @ C.T)
              + (C * C).sum(1)[None, :])
        return pa.table({id_col: ids,
                         "cluster": d2.argmin(1).astype(np.int64)})

    return ds.map_batches(assign, batch_format="pyarrow")


def semdedup(ds, *, n_clusters: int = 8, radius2: int = 50,
             id_col: str = "vec_id", vec_col: str = "embedding",
             chunk: int = 1024, centroids="seed",
             cluster_cap: int | None = 100_000):
    """SemDeDup-style semantic dedup: drop a vector when an EARLIER (lower
    id) member of its cluster lies within integer squared-L2 ``radius2``
    on the quantized vectors. Returns Dataset[(vec_id, cluster, keep)].

    Scale shape: pairwise work happens ONLY within a cluster
    (groupby(cluster).map_groups — the SemDeDup partitioning assumption:
    one cluster fits in a worker block). ``n_clusters`` must grow with
    corpus size so clusters stay bounded; ``centroids='trained'`` (mini
    k-means over a deterministic hash sample) is the scale path that keeps
    them balanced — 'seed' (lowest-id vectors) exists for the exact SQL
    oracle. ``cluster_cap`` bounds the comparison set inside a runaway
    cluster: members beyond the cap compare only against the cap's
    lowest-id prefix, with the truncation logged (the same logged-
    truncation discipline as the LSH bucket_cap — no silent sampling).
    The within-group kernel is a chunked int64 matmul, O(chunk x n_c)
    memory, no Python loop over rows."""
    import pyarrow as pa
    import ray

    cref = ray.put(_centroids_of(ds, n_clusters, id_col, vec_col,
                                 centroids))

    def assign_q(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = len(ray.get(cref)[0])
        if len(ids) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "q": pa.array([], pa.list_(pa.int64(), d)),
            })
        C = ray.get(cref)
        Q = _quantize_rows(np.asarray(t[vec_col].to_pylist(), dtype=np.float64))
        d2 = ((Q * Q).sum(1)[:, None] - 2 * (Q @ C.T)
              + (C * C).sum(1)[None, :])
        return pa.table({
            id_col: ids,
            "cluster": d2.argmin(1).astype(np.int64),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(Q.reshape(-1), pa.int64()), Q.shape[1]),
        })

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col)
        ids = df[id_col].to_numpy().astype(np.int64)
        Q = np.stack(df["q"].to_numpy()).astype(np.int64)
        n = len(ids)
        # comparison-set cap: every row still gets a decision, but only
        # against the cluster's lowest-id prefix — O(n * cap) worst case
        # instead of O(n^2) when one cluster degenerates
        ncmp = n if cluster_cap is None else min(n, int(cluster_cap))
        if ncmp < n:
            import logging

            logging.getLogger(__name__).warning(
                "semdedup: cluster %s has %d members > cluster_cap=%d; "
                "comparisons truncated to the lowest-id prefix "
                "(raise n_clusters or use centroids='trained')",
                int(df["cluster"].iloc[0]), n, ncmp,
            )
        Qc = Q[:ncmp]
        sq = (Q * Q).sum(1)
        sqc = sq[:ncmp]
        drop = np.zeros(n, dtype=bool)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            d2 = (sq[lo:hi, None] - 2 * (Q[lo:hi] @ Qc.T) + sqc[None, :])
            close = d2 <= radius2
            # earlier = strictly lower id == strictly lower sorted position
            col = np.arange(ncmp)[None, :]
            row = np.arange(lo, hi)[:, None]
            drop[lo:hi] = (close & (col < row)).any(axis=1)
        return pd.DataFrame({
            id_col: ids,
            "cluster": df["cluster"].to_numpy().astype(np.int64),
            "keep": ~drop,
        })

    assigned = ds.map_batches(assign_q, batch_format="pyarrow")
    return assigned.groupby("cluster").map_groups(dedup_group,
                                                  batch_format="pandas")

"""Similarity search over an embedding column (list<float>) — approximate
nearest neighbours for training-data curation (embedding-cosine near-dup,
retrieval). Two paths:

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  (``ray.put``) once; each batch does one float64 matmul against it and
  emits only its local top-k per query (combiner) — the driver merges
  |queries|·k rows per block, never the corpus.
- ``ivf_topk``: IVF-style scale path — embeddings bucketed to their nearest
  coarse centroid (deterministic k-means-lite), queries probe the nprobe
  nearest buckets; groupby(bucket) co-locates. Same output contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds: ray.data.Dataset, queries: np.ndarray,
                     query_ids: np.ndarray, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_self: bool = True) -> pd.DataFrame:
    """Returns (query_id, neighbor_id, rank, score) — score = cosine rounded
    to 6 dp, rank by (score desc, neighbor_id asc) for determinism."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids)
    # query state is small → plain-function stage (closure is shipped once
    # per task); actor pools are reserved for heavy per-actor state, and
    # chaining multiple pools can starve a small session's CPUs.

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        m = _normalize(_to_matrix(batch[vec_col]))
        sims = m @ qm.T  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for j in range(sims.shape[1]):
            s = np.round(sims[:, j], 6)
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[j]
            order = np.lexsort((ids[mask], -s[mask]))[:k]
            sel = np.nonzero(mask)[0][order]
            out_q.extend([qids[j]] * len(sel))
            out_n.extend(ids[sel])
            out_s.extend(s[sel])
        return pa.table({"query_id": pa.array(out_q),
                         "neighbor_id": pa.array(out_n),
                         "score": pa.array(out_s, type=pa.float64())})

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        score, batch_format="pyarrow", batch_size=8192).to_pandas()
    cand = cand.sort_values(["query_id", "score", "neighbor_id"],
                            ascending=[True, False, True], kind="stable")
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype("int64")
    return top[["query_id", "neighbor_id", "rank", "score"]]


def train_centroids(ds: ray.data.Dataset, n_centroids: int,
                    vec_col: str = "embedding", iters: int = 3,
                    sample_limit: int = 65536, seed: int = 42) -> np.ndarray:
    """Deterministic k-means-lite on a bounded sample (driver-side; the
    sample is the small side)."""
    sample = _to_matrix(
        pa.concat_tables([pa.table(b) for b in ds.select_columns([vec_col])
                          .limit(sample_limit).iter_batches(
                              batch_size=sample_limit, batch_format="pyarrow")]
                         )[vec_col])
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                             replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: np.ndarray,
             k: int, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> pd.DataFrame:
    """IVF path: only vectors in the nprobe closest buckets per query are
    scored. Recall < 1.0 by design; same output schema as brute force."""
    cent = train_centroids(ds, n_centroids, vec_col)
    qm = np.asarray(queries, dtype=np.float64)
    qd = ((qm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe_buckets = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    probes = np.array(sorted({int(b) for row in probe_buckets for b in row}))

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[vec_col])
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        bucket = d.argmin(axis=1)
        return batch.filter(pa.array(np.isin(bucket, probes)))

    pruned = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=8192)
    return brute_force_topk(pruned, qm, query_ids, k, id_col, vec_col,
                            exclude_self)

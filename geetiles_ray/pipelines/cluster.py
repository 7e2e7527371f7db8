"""Embedding clustering + LSH-bucketed similarity search, engine-exact.

Both operators run on a deterministic INTEGER quantization of the embedding
column (``floor(v·2²⁰ + 0.5)`` — the multiply is by a power of two, so the
double arithmetic is exact and any engine computes the same int64 grid).
That makes the distributed algorithms bit-reproducible:

- ``kmeans_quantized``: Lloyd iterations where assignment distances are
  exact int64 arithmetic and the centroid update is an exact rational
  rounding (``round(S/n)`` via floor-division identities), so per-cluster
  partial sums can be folded in ANY order (integer addition commutes
  exactly — no float non-associativity) and a fixed-iteration SQL replay
  matches value-for-value. The usual float k-means is NOT reproducible
  across engines (summation order changes ulps, ulps flip boundary
  assignments); quantizing is the principled fix for a resumable pipeline,
  not a test convenience.
- ``lsh_topk``: random-hyperplane LSH where each plane's ±1 signs come from
  an integer hash formula, so the signature bit (sign of an exact integer
  dot product) can never diverge between engines. The scale path to
  ``sim.brute_force_topk``'s exact scan: only bucket-colliding candidates
  are scored (recall < 1 by design — documented, and the SQL twin replays
  the same buckets so the check is exact).

Scale shape: k-means moves k·dim·blocks partial-sum rows per iteration
(the corpus never moves); LSH moves only bucket-matched candidates through
a streaming filter+score pass with a per-block top-k combiner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Q_SCALE = 1 << 20  # |v| < 2000 fits int64 distances at dim ≤ 1024
_MIX = 0x9E3779B97F4A7C15


def quantize(mat: np.ndarray) -> np.ndarray:
    """float embedding matrix → exact int64 grid (floor(v·2²⁰ + 0.5); the
    SQL twin is FLOOR(v * 1048576 + 0.5) — identical doubles, identical
    ints)."""
    return np.floor(np.asarray(mat, dtype=np.float64) * Q_SCALE + 0.5) \
        .astype(np.int64)


def _q_batch(batch: pa.Table, vec_col: str) -> np.ndarray:
    return quantize(np.asarray(batch[vec_col].to_pylist()))


def _round_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact round-half-up of the rational S/n over int64 (floor((2S+n)/2n);
    numpy floor_divide floors, matching the SQL residue identity)."""
    return np.floor_divide(2 * s + n, 2 * n)


# ------------------------------------------------------------------ k-means

def kmeans_quantized(ds: ray.data.Dataset, k: int = 8, iters: int = 3,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed Lloyd k-means over the quantized grid: ``iters``
    assignment rounds with ``iters−1`` exact centroid updates between them
    (init = the vectors with the ``k`` smallest ids). Returns
    ``(assignments Dataset(id, cluster), centroids int64[k, dim])`` where
    the assignments are round ``iters``'s (computed against the final
    centroids). Ties in distance break to the lowest cluster index.

    Each update round is one streaming pass: map-side per-cluster
    (count, Σxq) partials (≤ k rows per block — the combiner), an
    order-independent integer fold on the driver (k·dim ints), and a
    broadcast of the new k×dim centroid grid. Empty clusters keep their
    previous centroid."""
    base = ds.select_columns([id_col, vec_col])

    # init: k smallest ids via a per-block top-k combiner (no global sort)
    def local_smallest(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(order))

    seed = base.map_batches(local_smallest, batch_format="pyarrow") \
        .to_pandas().sort_values(id_col).head(k)
    if len(seed) < k:
        raise ValueError(f"k={k} exceeds the {len(seed)} input vectors")
    cent = quantize(np.asarray(seed[vec_col].tolist()))

    def assign_against(c: np.ndarray):
        c2 = (c * c).sum(axis=1)

        def f(xq: np.ndarray) -> np.ndarray:
            # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant per row, so
            # argmin over −2x·c + ‖c‖² suffices — all exact int64
            d = c2[None, :] - 2 * (xq @ c.T)
            return d.argmin(axis=1)  # first min = lowest cluster index
        return f

    for _ in range(iters - 1):
        assign = assign_against(cent)

        def partial(batch: pa.Table, _assign=assign) -> pa.Table:
            xq = _q_batch(batch, vec_col)
            a = _assign(xq)
            n = np.bincount(a, minlength=k)
            s = np.zeros((k, xq.shape[1]), dtype=np.int64)
            np.add.at(s, a, xq)
            nz = np.nonzero(n)[0]
            return pa.table({
                "cluster": pa.array(nz, type=pa.int64()),
                "n": pa.array(n[nz], type=pa.int64()),
                "s": pa.array(list(s[nz]), type=pa.list_(pa.int64()))})

        rows = base.map_batches(partial, batch_format="pyarrow").to_pandas()
        n_tot = np.zeros(k, dtype=np.int64)
        s_tot = np.zeros_like(cent)
        np.add.at(n_tot, rows.cluster.to_numpy(), rows.n.to_numpy())
        np.add.at(s_tot, rows.cluster.to_numpy(),
                  np.asarray(rows.s.tolist(), dtype=np.int64))
        live = n_tot > 0
        cent = cent.copy()
        cent[live] = _round_div(s_tot[live], n_tot[live, None])

    final = assign_against(cent)

    def label(batch: pa.Table) -> pa.Table:
        a = final(_q_batch(batch, vec_col))
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(a, type=pa.int64())})

    return base.map_batches(label, batch_format="pyarrow"), cent


def sql_kmeans(k: int = 8, iters: int = 3, dim: int = 64,
               table: str = "embeddings", id_col: str = "vec_id",
               vec_col: str = "embedding") -> str:
    """Generated SQL twin of kmeans_quantized: the same quantization,
    distances, tie order, and round-half-up centroid update, unrolled over
    ``iters`` rounds as chained CTEs (every intermediate is exact integer
    arithmetic, so the two engines cannot drift)."""
    # floor division of a by b>0 in DuckDB (// truncates): subtract the
    # non-negative residue first, then the division is exact
    fdiv = ("(2*s + n - ((2*s + n) % (2*n) + 2*n) % (2*n)) // (2*n)")
    parts = [f"""
WITH xq AS (
  SELECT {id_col} AS vid, d,
         CAST(FLOOR({vec_col}[d + 1]::DOUBLE * {Q_SCALE} + 0.5) AS BIGINT)
           AS xq
  FROM {table}, range(0, {dim}) t(d)
), c0 AS (
  SELECT vid AS j, d, xq AS cq FROM xq WHERE vid < {k}
)"""]
    for r in range(1, iters):
        parts.append(f""", d{r} AS (
  SELECT x.vid, c.j, SUM((x.xq - c.cq) * (x.xq - c.cq)) AS dist
  FROM xq x JOIN c{r - 1} c USING (d) GROUP BY x.vid, c.j
), a{r} AS (
  SELECT vid, j AS cluster FROM d{r}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, j) = 1
), s{r} AS (
  SELECT a.cluster AS j, x.d, SUM(x.xq) AS s, COUNT(*) AS n
  FROM a{r} a JOIN xq x USING (vid) GROUP BY a.cluster, x.d
), c{r} AS (
  SELECT j, d, {fdiv} AS cq FROM s{r}
  UNION ALL
  SELECT c.j, c.d, c.cq FROM c{r - 1} c
  WHERE c.j NOT IN (SELECT DISTINCT j FROM s{r})
)""")
    parts.append(f""", dF AS (
  SELECT x.vid, c.j, SUM((x.xq - c.cq) * (x.xq - c.cq)) AS dist
  FROM xq x JOIN c{iters - 1} c USING (d) GROUP BY x.vid, c.j
)
SELECT vid AS {id_col}, j AS cluster FROM dF
QUALIFY ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, j) = 1
ORDER BY {id_col}""")
    return "".join(parts)


# ---------------------------------------------------------------- LSH top-k

def plane_signs(nplanes: int, dim: int) -> np.ndarray:
    """±1 hyperplane matrix from the integer hash
    bit = ((p·dim + d + 1)·MIX mod 2⁶⁴) >> 63 — reproducible in HUGEINT
    SQL, no RNG state."""
    idx = (np.arange(nplanes * dim, dtype=np.uint64) + np.uint64(1)) \
        * np.uint64(_MIX)
    return (1 - 2 * (idx >> np.uint64(63)).astype(np.int64)) \
        .reshape(nplanes, dim)


def lsh_buckets(xq: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """Signature bucket per row: bit_p = (Σ_d s_pd·xq_d ≥ 0) — an exact
    integer sign, so engines can't disagree on a near-zero dot."""
    bits = (xq @ signs.T) >= 0
    return bits @ (1 << np.arange(signs.shape[0], dtype=np.int64))


def centroid_outliers(ds: ray.data.Dataset, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      label_col: str = "label") -> ray.data.Dataset:
    """Embedding pruning by centroid distance (the SemDeDup /
    SSL-prototypes dataset-curation signal): per label, the exact
    quantized centroid (same int64 grid + round-half-up update as
    kmeans_quantized), then each vector's exact squared distance to its
    label's centroid; ``outlier`` = distance above the label's integer
    mean distance. All int64 arithmetic — fold order cannot change a
    flag. Output (id, label, d2, outlier).

    Three streaming passes over the corpus, nothing corpus-sized on
    the driver: (1) per-(label, dim) sum/count combiner (≤ labels·dim
    rows per block, kmeans' accepted fold shape), (2) broadcast
    centroids → exact d2 map, (3) per-label mean fold (labels rows) →
    broadcast thresholds → map-side flag."""
    base = ds.select_columns([id_col, vec_col, label_col])

    def partial(batch: pa.Table) -> pa.Table:
        xq = _q_batch(batch, vec_col)
        lab = batch[label_col].to_numpy()
        labs, inv = np.unique(lab, return_inverse=True)
        dim = xq.shape[1]
        sums = np.zeros((len(labs), dim), dtype=np.int64)
        np.add.at(sums, inv, xq)
        n = np.bincount(inv, minlength=len(labs)).astype(np.int64)
        nl = len(labs)
        return pa.table({
            label_col: pa.array(np.repeat(labs, dim)),
            "d": pa.array(np.tile(np.arange(dim, dtype=np.int64), nl)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(n, dim))})

    part = base.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = part.groupby([label_col, "d"], sort=True)[["s", "n"]].sum()
    cents, counts = {}, {}
    for lab, g in agg.reset_index().groupby(label_col, sort=True):
        g = g.sort_values("d")
        cents[lab] = _round_div(g["s"].to_numpy(), g["n"].to_numpy())
        counts[lab] = int(g["n"].iloc[0])

    def dist(batch: pa.Table) -> pa.Table:
        xq = _q_batch(batch, vec_col)
        lab = batch[label_col].to_numpy()
        c = np.stack([cents[v] for v in np.unique(lab)])
        lmap = {v: i for i, v in enumerate(np.unique(lab))}
        rows = np.array([lmap[v] for v in lab], dtype=np.int64)
        diff = xq - c[rows]
        d2 = (diff * diff).sum(axis=1)
        return pa.table({id_col: batch[id_col],
                         label_col: batch[label_col],
                         "d2": pa.array(d2.astype(np.int64))})

    d2t = base.map_batches(dist, batch_format="pyarrow").materialize()

    def d2part(batch: pa.Table) -> pa.Table:
        lab = batch[label_col].to_numpy()
        labs, inv = np.unique(lab, return_inverse=True)
        s = np.zeros(len(labs), dtype=np.int64)
        np.add.at(s, inv, batch["d2"].to_numpy())
        return pa.table({label_col: pa.array(labs),
                         "s": pa.array(s),
                         "n": pa.array(np.bincount(
                             inv, minlength=len(labs)).astype(np.int64))})

    dagg = d2t.map_batches(d2part, batch_format="pyarrow").to_pandas() \
        .groupby(label_col)[["s", "n"]].sum()
    thr = {lab: int(r.s) // int(r.n) for lab, r in dagg.iterrows()}

    def flag(batch: pa.Table) -> pa.Table:
        lab = batch[label_col].to_numpy()
        t = np.array([thr[v] for v in lab], dtype=np.int64)
        return batch.append_column(
            "outlier", pa.array(batch["d2"].to_numpy() > t))

    return d2t.map_batches(flag, batch_format="pyarrow")


def lsh_topk(ds: ray.data.Dataset, query_ids: np.ndarray, k: int = 5,
             nplanes: int = 6, id_col: str = "vec_id",
             vec_col: str = "embedding") -> pd.DataFrame:
    """LSH-bucketed approximate top-k: candidates for a query are the
    vectors sharing its signature bucket (recall < 1 by design — a
    neighbor hashed to another bucket is missed; more planes = fewer,
    purer candidates). Scoring/ordering matches sim.brute_force_topk
    (cosine rounded to 6 dp, ties to lowest neighbor id).

    Plan: one map computes buckets; the query rows (tiny) broadcast their
    buckets + normalized vectors; a streaming filter keeps only
    bucket-colliding rows and a per-block top-k combiner bounds what the
    driver merges at |queries|·k per block. The corpus is scanned once,
    never materialized."""
    base = ds.select_columns([id_col, vec_col])
    qid_arr = np.asarray(sorted(query_ids))

    def with_bucket(batch: pa.Table) -> pa.Table:
        xq = _q_batch(batch, vec_col)
        # signs are recomputed per task from the integer formula — cheaper
        # than shipping, and immune to closure-capture drift
        b = lsh_buckets(xq, plane_signs(nplanes, xq.shape[1]))
        return batch.append_column("__bucket", pa.array(b, type=pa.int64()))

    bucketed = base.map_batches(with_bucket, batch_format="pyarrow")
    qset = pa.array(qid_arr)
    qdf = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=qset)),
        batch_format="pyarrow").to_pandas().sort_values(id_col)
    qm = np.asarray(qdf[vec_col].tolist(), dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qm = qm / qn
    qids = qdf[id_col].to_numpy()
    qbuckets = qdf["__bucket"].to_numpy()
    bucket_set = pa.array(np.unique(qbuckets))

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["__bucket"],
                                      value_set=bucket_set))
        if not len(batch):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch[id_col].to_numpy()
        bk = batch["__bucket"].to_numpy()
        m = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        sims = (m / nrm) @ qm.T
        out_q, out_n, out_s = [], [], []
        for j in range(len(qids)):
            mask = (bk == qbuckets[j]) & (ids != qids[j])
            if not mask.any():
                continue
            s = np.round(sims[mask, j], 6)
            order = np.lexsort((ids[mask], -s))[:k]
            sel = np.nonzero(mask)[0][order]
            out_q.extend([qids[j]] * len(sel))
            out_n.extend(ids[sel])
            out_s.extend(np.round(sims[sel, j], 6))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    cand = bucketed.map_batches(score, batch_format="pyarrow").to_pandas()
    if cand.empty:  # all-empty blocks lose their columns through to_pandas
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    cand = cand.sort_values(["query_id", "score", "neighbor_id"],
                            ascending=[True, False, True], kind="stable")
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype("int64")
    return top[["query_id", "neighbor_id", "rank", "score"]]


def sql_lsh_topk(k: int = 5, nplanes: int = 6, dim: int = 64,
                 n_queries: int = 5) -> str:
    """SQL twin of lsh_topk over the embeddings table: HUGEINT replay of
    the plane-sign formula, exact integer signature bits, then the shared
    cosine/rank conventions of SQL_ANN_TOPK on bucket-colliding pairs."""
    mask = (1 << 64) - 1
    return f"""
WITH xq AS (
  SELECT vec_id, d,
         CAST(FLOOR(embedding[d + 1]::DOUBLE * {Q_SCALE} + 0.5) AS BIGINT)
           AS xq
  FROM embeddings, range(0, {dim}) t(d)
), planes AS (
  SELECT p, d,
         1 - 2 * CAST((((p * {dim} + d + 1)::HUGEINT * {_MIX}::HUGEINT)
                       & {mask}::HUGEINT) >> 63 AS BIGINT) AS s
  FROM range(0, {nplanes}) tp(p), range(0, {dim}) td(d)
), dots AS (
  SELECT x.vec_id, pl.p, SUM(pl.s * x.xq) AS dot
  FROM xq x JOIN planes pl USING (d) GROUP BY x.vec_id, pl.p
), buckets AS (
  SELECT vec_id,
         SUM(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END)::BIGINT AS bucket
  FROM dots GROUP BY vec_id
), qb AS (
  SELECT vec_id AS qid, bucket FROM buckets WHERE vec_id < {n_queries}
), cand AS (
  SELECT q.qid, b.vec_id AS nid
  FROM qb q JOIN buckets b USING (bucket) WHERE b.vec_id <> q.qid
), scored AS (
  SELECT c.qid AS query_id, c.nid AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                      CAST(en.embedding AS DOUBLE[])), 6)
           AS score
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings en ON en.vec_id = c.nid
)
SELECT query_id, neighbor_id, "rank", score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS "rank"
  FROM scored
) WHERE "rank" <= {k} ORDER BY query_id, "rank"
"""

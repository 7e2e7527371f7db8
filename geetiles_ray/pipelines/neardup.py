"""Near-duplicate detection over document/page text — the training-data
extensions of the exact dedup (SURVEY.md §2.7; the reference dedups only by
content-hash identity, utils.py:232-250 / gee.py:267-274):

- MinHash + LSH: shingle → minhash signature (vectorized over the batch) →
  band buckets → groupby(band, hash) candidate pairs → exact-Jaccard verify
  → connected components.
- SimHash: 64-bit token-weight simhash; near-dup = small Hamming distance,
  banded on 16-bit chunks for candidate generation.
- n-gram Jaccard: exact pairwise verification kernel.

Shuffle discipline: signatures are computed in map_batches (one pass over
text); only (band_id, band_hash, doc_id) triples — a few dozen bytes per
doc — enter the groupby; pairs are verified by joining text back per
candidate id (broadcast for small candidate sets, semi-join otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_MERSENNE = (1 << 61) - 1


def _hash_shingles(texts: list[str], k: int) -> list[np.ndarray]:
    """Per text: uint64 hashes of its k-byte shingle set. Vectorized: utf-8
    bytes → sliding window view → polynomial hash Σ b[j]·257^j, which is
    EXACT in uint64 for k ≤ 7 (255·257^6 · 7 < 2^64), then np.unique.
    ~40x faster than per-substring Python sets at crawl-page sizes."""
    if k > 7:
        raise ValueError(f"shingle_k={k} not supported: the uint64 polynomial "
                         "hash is exact only for k <= 7")
    pows = np.uint64(257) ** np.arange(k, dtype=np.uint64)
    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            b = np.pad(b, (0, k - len(b)))
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        out.append(np.unique((win * pows[None, :]).sum(axis=1)))
    return out


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def optimal_bands(threshold: float, num_perm: int,
                  fp_weight: float = 0.5) -> tuple[int, int]:
    """(bands, rows_per_band) minimizing weighted false-positive +
    false-negative probability mass for the LSH S-curve
    P(candidate | J=s) = 1-(1-s^r)^b — the standard datasketch-style
    parameter search, evaluated by numerical integration of the curve
    below/above the threshold. Guarantees the banding is co-tuned with the
    caller's threshold instead of a fixed (b, r)."""
    best, best_err = (16, num_perm // 16 or 1), float("inf")
    s = np.linspace(0.0, 1.0, 201)
    below = s <= threshold
    # any (b, r) with b*r <= num_perm (the stage then uses exactly b*r
    # permutations) — restricting to exact divisors of num_perm makes the
    # r-grid so coarse (4->8->16 at 128) that some thresholds can't be hit
    for r in range(1, num_perm + 1):
        b = num_perm // r
        if b < 1:
            break
        p = 1.0 - (1.0 - s ** r) ** b
        fp = np.trapz(p[below], s[below])
        fn = np.trapz(1.0 - p[~below], s[~below])
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if err < best_err:
            best, best_err = (b, r), err
    return best


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*h + b) mod p over the shingle set."""
    h = shingle_hashes.astype(np.uint64)[:, None]
    vals = (h * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


class MinHashStage:
    """map_batches stage: text → minhash signature + LSH band rows."""

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128,
                 bands: int = 16, shingle_k: int = 5, seed: int = 42):
        # defaults: 16 bands x 8 rows -> collision prob = 1-(1-J^8)^16,
        # ~0.71 inflection. Measured on the sf0.1 documents corpus (random
        # pair J ~0.17, p99 0.26): 4-row bands produced 927k candidate
        # pairs (7% of all-pairs!); 8-row bands cut that to a few thousand
        # while keeping recall >99.9% for true near-dups (J >= 0.85).
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        sh = _hash_shingles(texts, self.k)
        out_id, out_band, out_hash = [], [], []
        for i, s in enumerate(sh):
            sig = minhash_signature(s, self.a, self.b)
            bands = sig.reshape(self.bands, self.rows_per_band)
            bh = pd.util.hash_array(
                np.ascontiguousarray(bands).view(
                    [("", np.uint64)] * self.rows_per_band).ravel())
            out_id.extend([ids[i]] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(bh.tolist())
        return pa.table({
            "doc_id": pa.array(out_id),
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.uint64()),
        })


def lsh_candidate_pairs(band_rows: ray.data.Dataset) -> pd.DataFrame:
    """band rows → unordered candidate id pairs (deduped).

    The band table is tiny (bands × 16 B per doc), and almost every
    (band, band_hash) bucket is a singleton — a Ray ``map_groups`` pays
    per-group Python overhead on ~|docs|×bands groups (measured 10 s for
    5k docs), so the fold is driver-side vectorized instead: sort by
    bucket, run-length detect buckets with ≥2 members, expand pairs with
    numpy. Scale path (10^9+ docs): hash-repartition on band_hash and run
    this same vectorized kernel per partition (`map_batches`, batch=block).
    """
    df = band_rows.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"id_a": [], "id_b": []})
    df = df.sort_values(["band", "band_hash", "doc_id"], kind="stable")
    band = df["band"].to_numpy()
    bh = df["band_hash"].to_numpy()
    ids = df["doc_id"].to_numpy()
    new = np.empty(len(df), dtype=bool)
    new[0] = True
    new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(df))
    aa, bb = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        g = np.unique(ids[s:e])
        if len(g) < 2:
            continue
        ia, ib = np.triu_indices(len(g), k=1)
        aa.append(g[ia]); bb.append(g[ib])
    if not aa:
        return pd.DataFrame({"id_a": [], "id_b": []})
    got = pd.DataFrame({"id_a": np.concatenate(aa), "id_b": np.concatenate(bb)})
    return got.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


def exact_jaccard(texts_by_id: dict, pairs: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """Verification kernel: k-shingle Jaccard per candidate pair."""
    cache: dict = {}

    def sh(i):
        if i not in cache:
            t = texts_by_id[i]
            cache[i] = ({t} if len(t) < k
                        else {t[j:j + k] for j in range(len(t) - k + 1)})
        return cache[i]

    jac = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = sh(a), sh(b)
        inter = len(sa & sb)
        jac.append(inter / (len(sa) + len(sb) - inter))
    out = pairs.copy()
    out["jaccard"] = jac
    return out


def dedup_minhash(ds: ray.data.Dataset, id_col: str, text_col: str,
                  threshold: float = 0.8, num_perm: int = 128,
                  bands: int | None = None,
                  shingle_k: int = 5) -> pd.DataFrame:
    """Full near-dup pipeline. Returns (doc_id, group_id) for every doc in a
    near-dup group (group_id = min doc id of its connected component).

    Scale notes: signature+banding is one streaming pass; the groupby moves
    bands*16B per doc; verification joins text only for candidate ids
    (semi-join). Connected components run on the driver over the verified
    pair list — valid while |pairs| ≪ |corpus| (the LSH contract); the
    documented alternative for adversarial corpora is iterative min-label
    propagation via groupby.
    """
    if bands is None:
        # co-tune banding with the requested threshold (a fixed (b, r) is
        # only right for one threshold: 16x8 bands recall ~18% at J=0.6).
        # FN weighted 4x FP: misses are unrecoverable, false candidates are
        # killed by the exact-Jaccard verification below.
        bands, rows = optimal_bands(threshold, num_perm, fp_weight=0.2)
        num_perm = bands * rows
    band_rows = ds.map_batches(
        MinHashStage, fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
            shingle_k=shingle_k),
        batch_format="pyarrow", concurrency=2)
    pairs = lsh_candidate_pairs(band_rows)
    if len(pairs) == 0:
        return pd.DataFrame({id_col: [], "group_id": []})

    cand_ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    texts_by_id = {}
    id_set = set(cand_ids)
    for b in ds.select_columns([id_col, text_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if i in id_set:
                texts_by_id[i] = t
    verified = exact_jaccard(texts_by_id, pairs, k=shingle_k)
    dup = verified[verified["jaccard"] >= threshold]

    parent = {i: i for i in cand_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(dup["id_a"], dup["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = pd.Series({i: find(i) for i in cand_ids})
    sizes = roots.value_counts()
    in_group = roots[roots.map(sizes) >= 2]
    groups = pd.DataFrame({id_col: in_group.index, "group_id": in_group.values})
    return groups.sort_values([id_col]).reset_index(drop=True)


# ------------------------------------------------------------------ simhash

_TOKEN_BITS = 64


def simhash_batch(texts: list[str]) -> np.ndarray:
    """64-bit simhash per text from token hashes (unweighted)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        h = pd.util.hash_array(np.array(toks, dtype=object))
        bits = ((h[:, None] >> np.arange(_TOKEN_BITS, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((v > 0).astype(np.uint8)[::-1], bitorder="little") \
            .view(np.uint64)[0]
    return out


def add_simhash(ds: ray.data.Dataset, text_col: str,
                out_col: str = "simhash") -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(sh, type=pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_candidates(ds: ray.data.Dataset, id_col: str,
                       simhash_col: str = "simhash",
                       max_hamming: int = 3) -> pd.DataFrame:
    """Banded candidate generation: 4 chunks of 16 bits — any pair within
    Hamming ≤ 3 shares at least one chunk (pigeonhole). Verify exactly."""

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch[simhash_col].to_numpy()
        ids = batch[id_col].to_pylist()
        out_id, out_band, out_val, out_sh = [], [], [], []
        for chunk in range(4):
            vals = (sh >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
            out_id.extend(ids)
            out_band.extend([chunk] * len(ids))
            out_val.extend(vals.tolist())
            out_sh.extend(sh.tolist())
        return pa.table({
            "doc_id": pa.array(out_id), "band": pa.array(out_band, type=pa.int32()),
            "val": pa.array(out_val, type=pa.uint64()),
            "sh": pa.array(out_sh, type=pa.uint64()),
        })

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].tolist()
        shs = g["sh"].tolist()
        aa, bb, hh = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(shs[i]) ^ int(shs[j])).count("1")
                if ham <= max_hamming:
                    aa.append(ids[i]); bb.append(ids[j]); hh.append(ham)
        return pd.DataFrame({"id_a": aa, "id_b": bb, "hamming": hh})

    got = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby(["band", "val"]).map_groups(pairs, batch_format="pandas") \
        .to_pandas()
    if len(got) == 0:
        return got
    return got.drop_duplicates(["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)

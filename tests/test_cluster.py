"""Independent oracles for pipelines/cluster.py: a single-process numpy
reference of the quantized Lloyd recurrence, bucket-membership properties
for LSH, and exactness pins for the quantization/rounding primitives
(the SQL twins are checked end-to-end by tools/check_oracle.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from geetiles_ray.pipelines import cluster as cl
from geetiles_ray.pipelines import sim


def _emb_df(n=300, dim=16, seed=9):
    r = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": list(r.normal(0, 0.3, (n, dim)).astype(np.float32)),
    })


def _ds(df, nblocks=5):
    return ray.data.from_pandas([d for d in np.array_split(df, nblocks)
                                 if len(d)])


def _reference_kmeans(mat, k, iters):
    """Single-process replay of the same quantized recurrence (independent
    of the distributed partial-fold code path)."""
    xq = cl.quantize(mat)
    cent = xq[:k].copy()
    for r in range(iters):
        d = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        if r == iters - 1:
            return a, cent
        for j in range(k):
            m = a == j
            if m.any():
                s = xq[m].sum(axis=0)
                cent[j] = (2 * s + m.sum()) // (2 * m.sum())
    raise AssertionError


class TestQuantize:
    def test_exact_grid_and_half_rule(self):
        # ±0.5 grid points must round identically to SQL's FLOOR(v*S+0.5):
        # half always rounds UP (toward +inf), not banker's
        s = cl.Q_SCALE
        v = np.array([[0.0, 1.5 / s, -1.5 / s, 2.5 / s, -2.5 / s, 0.3]])
        out = cl.quantize(v)[0]
        assert out.tolist()[:5] == [0, 2, -1, 3, -2]
        assert out[5] == int(np.floor(0.3 * s + 0.5))


class TestKMeans:
    def test_matches_single_process_reference(self):
        df = _emb_df()
        mat = np.asarray(df.embedding.tolist())
        for iters in (1, 3):
            got, cent = cl.kmeans_quantized(_ds(df), k=6, iters=iters)
            got = got.to_pandas().sort_values("vec_id")
            want_a, want_c = _reference_kmeans(mat, 6, iters)
            assert got.cluster.tolist() == want_a.tolist()
            np.testing.assert_array_equal(cent, want_c)

    def test_blocking_invariance(self):
        # integer folds commute exactly → identical result at any blocking
        df = _emb_df(n=120, seed=3)
        a1, c1 = cl.kmeans_quantized(_ds(df, 1), k=4, iters=3)
        a2, c2 = cl.kmeans_quantized(_ds(df, 9), k=4, iters=3)
        pd.testing.assert_frame_equal(
            a1.to_pandas().sort_values("vec_id").reset_index(drop=True),
            a2.to_pandas().sort_values("vec_id").reset_index(drop=True))
        np.testing.assert_array_equal(c1, c2)

    def test_empty_cluster_keeps_centroid(self):
        # two distinct points, k=4: clusters 2 and 3 never win a vector,
        # so their centroids must stay at their init values
        df = pd.DataFrame({
            "vec_id": np.arange(8, dtype="int64"),
            "embedding": [np.array([1.0, 0.0], dtype=np.float32),
                          np.array([0.0, 1.0], dtype=np.float32)] * 4,
        })
        _, cent = cl.kmeans_quantized(_ds(df, 2), k=4, iters=3)
        np.testing.assert_array_equal(cent[2], cl.quantize(
            df.embedding.iloc[2][None, :])[0])
        np.testing.assert_array_equal(cent[3], cl.quantize(
            df.embedding.iloc[3][None, :])[0])

    def test_k_exceeds_rows_rejected(self):
        with pytest.raises(ValueError, match="exceeds"):
            cl.kmeans_quantized(_ds(_emb_df(n=3), 1), k=5)


class TestLsh:
    def test_plane_signs_deterministic_pm1(self):
        s = cl.plane_signs(6, 32)
        assert set(np.unique(s)) == {-1, 1}
        np.testing.assert_array_equal(s, cl.plane_signs(6, 32))
        # not degenerate: both signs appear in every plane
        assert (np.abs(s.sum(axis=1)) < 32).all()

    def test_topk_is_bucket_restricted_brute(self):
        df = _emb_df(n=200, dim=16, seed=21)
        ds = _ds(df)
        qids = np.arange(4)
        got = cl.lsh_topk(ds, qids, k=3, nplanes=4)
        # reference: buckets single-process, then brute top-k inside them
        mat = np.asarray(df.embedding.tolist())
        signs = cl.plane_signs(4, 16)
        buckets = cl.lsh_buckets(cl.quantize(mat), signs)
        for q in qids:
            cand_ids = df.vec_id[(buckets == buckets[q])
                                 & (df.vec_id != q)].to_numpy()
            sub = got[got.query_id == q]
            assert set(sub.neighbor_id) <= set(cand_ids)
            if len(cand_ids):
                want = sim.brute_force_topk(
                    _ds(df[df.vec_id.isin(np.append(cand_ids, q))], 2),
                    mat[q][None, :], np.array([q]), k=3)
                pd.testing.assert_frame_equal(
                    sub.reset_index(drop=True), want, check_dtype=False)

    def test_query_without_candidates_absent(self):
        # a query alone in its bucket yields no rows (documented recall<1)
        df = pd.DataFrame({
            "vec_id": np.arange(3, dtype="int64"),
            "embedding": [np.array([1.0, 0.0], dtype=np.float32),
                          np.array([-1.0, 0.01], dtype=np.float32),
                          np.array([-1.0, 0.02], dtype=np.float32)],
        })
        out = cl.lsh_topk(_ds(df, 1), np.array([0]), k=2, nplanes=8)
        signs = cl.plane_signs(8, 2)
        b = cl.lsh_buckets(cl.quantize(np.asarray(df.embedding.tolist())),
                           signs)
        if b[0] not in (b[1], b[2]):
            assert len(out) == 0


class TestCentroidOutliers:
    def test_matches_brute(self):
        rng = np.random.default_rng(17)
        n, dim = 300, 8
        emb = rng.normal(size=(n, dim)).astype(np.float32)
        labels = rng.integers(0, 4, n).astype(np.int32)
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                           "embedding": list(emb), "label": labels})
        out = cl.centroid_outliers(ray.data.from_pandas(df)).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)

        xq = cl.quantize(emb.astype(np.float64))
        for lab in np.unique(labels):
            m = labels == lab
            s = xq[m].sum(axis=0)
            cnt = int(m.sum())
            cent = cl._round_div(s, np.full(dim, cnt, dtype=np.int64))
            d2 = ((xq[m] - cent) ** 2).sum(axis=1)
            thr = int(d2.sum()) // cnt
            got = out[out.label == lab].sort_values("vec_id")
            assert got["d2"].tolist() == d2.tolist()
            assert got["outlier"].tolist() == (d2 > thr).tolist()

    def test_tight_cluster_flags_far_point(self):
        base = np.zeros((20, 4), dtype=np.float64)
        base[-1] = 10.0  # one far point
        df = pd.DataFrame({"vec_id": np.arange(20, dtype=np.int64),
                           "embedding": list(base.astype(np.float32)),
                           "label": np.zeros(20, dtype=np.int32)})
        out = cl.centroid_outliers(ray.data.from_pandas(df)).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert bool(out.outlier.iloc[-1])
        assert not out.outlier.iloc[:-1].any()

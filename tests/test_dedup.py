"""dedup_exact (both exchange paths) + partial combiner oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from ray.data.context import DataContext, ShuffleStrategy

from geetiles_ray.pipelines import dedup as dedupmod


def _pages_with_cross_block_dups(n=5000, nblocks=8) -> ray.data.Dataset:
    """Every 10th key appears in TWO different blocks; the later copy has a
    later ts and must lose."""
    rng = np.random.default_rng(7)
    key = np.arange(n) % (n // 2 + n // 10)      # forced collisions
    ts = rng.permutation(n).astype("int64")
    df = pd.DataFrame({"url": [f"u{k}" for k in key], "warc_ts": ts,
                       "payload": rng.integers(0, 1 << 30, n)})
    return ray.data.from_pandas(df, override_num_blocks=nblocks)


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["url", "warc_ts"], kind="stable") \
        .drop_duplicates(["url"], keep="first") \
        .sort_values("url").reset_index(drop=True)


class TestDedupExact:
    def test_sort_path_matches_pandas(self):
        ds = _pages_with_cross_block_dups()
        want = _oracle(ds.to_pandas())
        got = dedupmod.dedup_exact(ds, key="url", order_col="warc_ts") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_hash_shuffle_path_matches_sort_path(self):
        # the DataContext is snapshotted at dataset creation, so the strategy
        # flip must precede _pages_with_cross_block_dups()
        ctx = DataContext.get_current()
        old = ctx.shuffle_strategy
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            ds = _pages_with_cross_block_dups()
            want = _oracle(ds.to_pandas())
            got = dedupmod.dedup_exact(ds, key="url", order_col="warc_ts") \
                .to_pandas().sort_values("url").reset_index(drop=True)
        finally:
            ctx.shuffle_strategy = old
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_one_block_probe_true_under_hash_strategy(self):
        # under the pinned Ray + hash strategy the canary probe must pass
        # (i.e. the fast path is actually exercised, not silently skipped)
        ctx = DataContext.get_current()
        old = ctx.shuffle_strategy
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            dedupmod._HASH_ONE_BLOCK_PROBE = None  # force a fresh probe
            assert dedupmod._hash_partition_is_one_block() is True
        finally:
            ctx.shuffle_strategy = old
            dedupmod._HASH_ONE_BLOCK_PROBE = None

    def test_forced_fallback_routes_to_groupby_plan(self, monkeypatch):
        # a failing probe (future Ray splitting hash partitions) must route
        # to the groupby path even under HASH_SHUFFLE. Asserted on the
        # LOGICAL PLAN without executing: running a hash-strategy groupby
        # in this 4-CPU test session starves on aggregator actors (the
        # documented tiny-session pathology), and the fallback plan's
        # dedup correctness is already covered by test_sort_path_matches_
        # pandas (identical code path under the sort strategy).
        ctx = DataContext.get_current()
        old = ctx.shuffle_strategy
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            ds = _pages_with_cross_block_dups()
            monkeypatch.setattr(dedupmod, "_HASH_ONE_BLOCK_PROBE", True)
            fast = dedupmod.dedup_exact(ds, key="url", order_col="warc_ts")
            monkeypatch.setattr(dedupmod, "_HASH_ONE_BLOCK_PROBE", False)
            slow = dedupmod.dedup_exact(ds, key="url", order_col="warc_ts")
        finally:
            ctx.shuffle_strategy = old
        assert fast._logical_plan.dag.name == "MapBatches(per_block)"
        assert slow._logical_plan.dag.name == "MapBatches(per_bucket)"

    def test_dup_key_set_range_matches_driver(self):
        # the pre-bucketed split+fold range reduce must produce the exact
        # same (sorted) broadcast duplicate-hash set as the serial driver
        # fold, on a corpus whose dups straddle blocks
        ds = _pages_with_cross_block_dups()
        a = ray.get(dedupmod.dup_key_set(ds, "url", reduce="range"))
        b = ray.get(dedupmod.dup_key_set(ds, "url", reduce="driver"))
        assert a.dtype == np.uint64 and b.dtype == np.uint64
        assert len(a) > 0
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, np.sort(a))

    def test_multi_key(self):
        df = pd.DataFrame({"a": [1, 1, 2, 2, 1], "b": ["x", "x", "y", "y", "z"],
                           "v": [5, 3, 9, 1, 7]})
        got = dedupmod.dedup_exact(ray.data.from_pandas(df, override_num_blocks=3),
                                   key=["a", "b"], order_col="v") \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        want = df.sort_values(["a", "b", "v"], kind="stable") \
            .drop_duplicates(["a", "b"], keep="first") \
            .sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestDedupBroadcast:
    def test_matches_single_pass(self):
        ds = _pages_with_cross_block_dups().materialize()
        want = _oracle(ds.to_pandas())
        got = dedupmod.dedup_exact_broadcast(ds, key="url", order_col="warc_ts") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_no_duplicates_identity(self):
        df = pd.DataFrame({"url": [f"u{i}" for i in range(100)],
                           "warc_ts": range(100)})
        ds = ray.data.from_pandas(df, override_num_blocks=4).materialize()
        assert dedupmod.dedup_exact_broadcast(
            ds, key="url", order_col="warc_ts").count() == 100

    def test_tie_keys_route_through_exchange(self):
        # two fully-identical rows at the key's minimum order: the
        # broadcast filter can't pick one map-side, so the tie key must go
        # through the exchange and exactly one copy survive
        df = pd.DataFrame({
            "url": ["t", "t", "t", "a", "b"],
            "warc_ts": [5, 5, 9, 1, 2],
            "payload": [1, 1, 3, 4, 5],   # tied rows identical
        })
        ds = ray.data.from_pandas(df, override_num_blocks=3).materialize()
        got = dedupmod.dedup_exact_broadcast(ds, key="url", order_col="warc_ts") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        want = _oracle(df)
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_multi_key(self):
        df = pd.DataFrame({"a": [1, 1, 2, 2, 1], "b": ["x", "x", "y", "y", "z"],
                           "v": [5, 3, 9, 1, 7]})
        ds = ray.data.from_pandas(df, override_num_blocks=3).materialize()
        got = dedupmod.dedup_exact_broadcast(ds, key=["a", "b"], order_col="v") \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        want = df.sort_values(["a", "b", "v"], kind="stable") \
            .drop_duplicates(["a", "b"], keep="first") \
            .sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want)


class TestPartialCombiners:
    def test_counts_match_pandas(self):
        ds = _pages_with_cross_block_dups()
        df = ds.to_pandas()
        got = dedupmod.partial_counts(ds, ["url"], "n").to_pandas() \
            .sort_values("url").reset_index(drop=True)
        want = df.groupby("url", as_index=False).size() \
            .rename(columns={"size": "n"}).sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_sums_shuffle_reduce_matches_driver_reduce(self):
        ds = _pages_with_cross_block_dups()
        a = dedupmod.partial_sums(ds, ["url"], "payload", "s", reduce="driver") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        b = dedupmod.partial_sums(ds, ["url"], "payload", "s", reduce="shuffle") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestDedupTwoPass:
    def test_matches_single_pass(self):
        ds = _pages_with_cross_block_dups().materialize()
        want = _oracle(ds.to_pandas())
        got = dedupmod.dedup_exact_twopass(ds, key="url", order_col="warc_ts") \
            .to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_no_duplicates_bypasses_everything(self):
        df = pd.DataFrame({"url": [f"u{i}" for i in range(100)],
                           "warc_ts": range(100)})
        ds = ray.data.from_pandas(df, override_num_blocks=4).materialize()
        out = dedupmod.dedup_exact_twopass(ds, key="url", order_col="warc_ts")
        assert out.count() == 100

    def test_multi_key(self):
        df = pd.DataFrame({"a": [1, 1, 2, 2, 1], "b": ["x", "x", "y", "y", "z"],
                           "v": [5, 3, 9, 1, 7]})
        ds = ray.data.from_pandas(df, override_num_blocks=3).materialize()
        got = dedupmod.dedup_exact_twopass(ds, key=["a", "b"], order_col="v") \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        want = df.sort_values(["a", "b", "v"], kind="stable") \
            .drop_duplicates(["a", "b"], keep="first") \
            .sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestDedupBroadcastProperties:
    def test_random_corpora_match_pandas(self):
        """Property check: random key/order corpora (dup rates 0-60%, ties
        at the minimum with identical payloads, 1-8 blocks) must match the
        pandas drop_duplicates oracle exactly."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=12, deadline=None)
        @given(st.integers(0, 10_000), st.integers(1, 8),
               st.sampled_from([1, 3, 10]))
        def check(seed, nblocks, key_div):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(20, 300))
            keys = rng.integers(0, max(n // key_div, 1), n)
            order = rng.integers(0, 50, n)  # small range → ties likely
            df = pd.DataFrame({
                "url": [f"k{k}" for k in keys],
                "warc_ts": order,
                # payload must be a pure function of (key, order) so tied
                # minimum rows are identical and any tie pick is correct
                "payload": keys * 1000 + order,
            })
            ds = ray.data.from_pandas(df, override_num_blocks=nblocks) \
                .materialize()
            got = dedupmod.dedup_exact_broadcast(
                ds, key="url", order_col="warc_ts") \
                .to_pandas().sort_values("url").reset_index(drop=True)
            want = _oracle(df)
            pd.testing.assert_frame_equal(got[want.columns], want,
                                          check_dtype=False)

        check()


class TestUpsert:
    def test_latest_wins_and_appends(self):
        import pandas as pd

        from geetiles_ray.pipelines.dedup import upsert

        base = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
        upd = pd.DataFrame({"k": [2, 4], "v": [99, 40]})
        got = upsert(ray.data.from_pandas(base), ray.data.from_pandas(upd),
                     key="k").to_pandas().sort_values("k") \
            .reset_index(drop=True)
        assert got.k.tolist() == [1, 2, 3, 4]
        assert got.v.tolist() == [10, 99, 30, 40]
        assert "__pri" not in got.columns

    def test_order_col_resolves_update_duplicates(self):
        import pandas as pd

        from geetiles_ray.pipelines.dedup import upsert

        base = pd.DataFrame({"k": [1], "ts": [0], "v": [1]})
        upd = pd.DataFrame({"k": [1, 1], "ts": [5, 9], "v": [50, 90]})
        got = upsert(ray.data.from_pandas(base), ray.data.from_pandas(upd),
                     key="k", order_col="ts").to_pandas()
        assert got.v.tolist() == [90]  # greatest ts among updates wins


class TestUpsertPatch:
    def _sides(self):
        base = pd.DataFrame({
            "k": np.arange(10, dtype="int64"),
            "price": np.arange(10, dtype="int64") * 100,
            "name": [f"n{i}" for i in range(10)],
        })
        upd = pd.DataFrame({
            "k": np.array([2, 2, 5, 7, 99], dtype="int64"),
            "ver": np.array([1, 2, 1, 1, 1], dtype="int64"),
            # k=2 has two updates (ver 2 wins); k=7 patches with NULL
            # (must keep base); k=99 doesn't exist in base (dropped)
            "price": pd.array([111, 222, 555, None, 999], dtype="Int64"),
            "tag": ["a", "b", "c", "d", "e"],  # new column
        })
        return base, upd

    def test_coalesce_semantics(self):
        from geetiles_ray.pipelines import dedup as dd
        base, upd = self._sides()
        upd_ds = ray.data.from_arrow(
            pa.Table.from_pandas(upd, preserve_index=False))
        out = dd.upsert_patch(ray.data.from_pandas(base).repartition(3),
                              upd_ds,
                              key="k", order_col="ver").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert len(out) == 10                     # no inserts, no drops
        assert list(out.columns) == ["k", "price", "name", "tag"]
        got = dict(zip(out.k, out.price))
        assert got[2] == 222                      # latest update wins
        assert got[5] == 555
        assert got[7] == 700                      # NULL patch keeps base
        assert got[0] == 0 and got[9] == 900      # untouched rows
        tags = dict(zip(out.k, out.tag))
        assert tags[2] == "b" and tags[5] == "c"
        assert pd.isna(tags[0])                   # new col null elsewhere
        # one consistent arrow schema across blocks
        types = {str(b.schema.field("price").type)
                 for b in dd.upsert_patch(
                     ray.data.from_pandas(base).repartition(3),
                     upd_ds, key="k",
                     order_col="ver").iter_batches(batch_format="pyarrow")
                 if len(b)}
        assert types == {"int64"}

    def test_no_updates_is_identity(self):
        from geetiles_ray.pipelines import dedup as dd
        base, upd = self._sides()
        out = dd.upsert_patch(
            ray.data.from_pandas(base),
            ray.data.from_arrow(pa.Table.from_pandas(
                upd.iloc[:0], preserve_index=False)),
            key="k").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert (out.price == base.price).all()
        assert out.tag.isna().all()


class TestRangeFoldEmptyRanges:
    def test_more_ranges_than_keys(self):
        # Round-4 review: with |distinct keys| < nranges some ranges are
        # empty; empty slices must carry the explicit target schema (not
        # inferred null types) and out_names must apply inside the fold
        # (Dataset.rename_columns skips zero-row bundles).
        df = pd.DataFrame({"k": ["a", "b", "c"] * 10,
                           "v": np.arange(30, dtype="int64")})
        ds = ray.data.from_pandas(df).repartition(4)

        def local(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby("k", as_index=False).agg(__n=("v", "size"))
            return g.astype({"__n": "int64"})

        partial = ds.map_batches(local, batch_format="pandas")
        out = dedupmod.range_fold_partials(
            partial, ["k"], [("__n", "sum")], nranges=16,
            out_names=["k", "n"])
        # every block (including the 13+ empty ranges) must share the
        # renamed, correctly-typed schema
        types = set()
        for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
            assert b.column_names == ["k", "n"]
            types.add((str(b.schema.field("k").type),
                       str(b.schema.field("n").type)))
        assert types == {("string", "int64")}
        got = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert list(got.k) == ["a", "b", "c"]
        assert list(got.n) == [10, 10, 10]

    def test_postings_with_tiny_vocab_many_ranges(self):
        from geetiles_ray.pipelines import analytics as an
        df = pd.DataFrame({"doc_id": np.arange(20, dtype="int64"),
                           "text": ["alpha beta"] * 20})
        ds = ray.data.from_pandas(df).repartition(3)
        # 2-token vocab; default nranges on a many-core host >> 2
        post = an.token_postings(ds)
        got = post.to_pandas().sort_values("token").reset_index(drop=True)
        assert list(got.columns) == ["token", "df", "tf", "first_doc"]
        assert list(got.token) == ["alpha", "beta"]
        assert list(got.tf) == [20, 20]


class TestUpsertPatchProperties:
    def test_matches_pandas_coalesce(self):
        # property: upsert_patch == LEFT JOIN + COALESCE for random keys,
        # random null patches and random duplicate update multiplicity
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(st.integers(0, 10**6))
        def prop(seed):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(3, 40))
            base = pd.DataFrame({
                "k": np.arange(n, dtype="int64"),
                "v": rng.integers(0, 1000, n).astype("int64"),
            })
            m = int(rng.integers(0, 30))
            # ver unique per update row: ties on (k, ver) resolve
            # arbitrarily by contract (row order does not survive the
            # exchange), so the oracle must not depend on file position
            upd = pd.DataFrame({
                "k": rng.integers(0, n * 2, m).astype("int64"),
                "ver": rng.permutation(m).astype("int64"),
                "v": pd.array([None if rng.random() < 0.3
                               else int(rng.integers(0, 1000))
                               for _ in range(m)], dtype="Int64"),
            })
            got = dedupmod.upsert_patch(
                ray.data.from_pandas(base).repartition(3),
                ray.data.from_arrow(pa.Table.from_pandas(
                    upd, preserve_index=False)),
                key="k", order_col="ver").to_pandas() \
                .sort_values("k").reset_index(drop=True)
            # pandas oracle: latest per key (ver, then position), COALESCE
            u = upd.copy().reset_index()
            u = u.sort_values(["k", "ver", "index"], kind="mergesort") \
                .drop_duplicates("k", keep="last")
            exp = base.merge(u[["k", "v"]], on="k", how="left",
                             suffixes=("", "__u"))
            exp["v"] = exp["v__u"].astype("float64").combine_first(
                exp["v"].astype("float64"))
            assert list(got.k) == list(exp.k)
            assert list(got.v.astype("float64")) == list(exp.v)

        prop()


class TestRangeFoldProperties:
    def test_matches_pandas_groupby(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(st.integers(0, 10**6), st.integers(2, 40),
               st.booleans())
        def prop(seed, nranges, route_subset):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(1, 200))
            df = pd.DataFrame({
                "a": rng.integers(0, 8, n).astype("int64"),
                "b": [f"t{x}" for x in rng.integers(0, 6, n)],
                "v": rng.integers(-50, 50, n).astype("int64"),
            })
            ds = ray.data.from_pandas(df).repartition(
                int(rng.integers(1, 6)))

            def local(x: pd.DataFrame) -> pd.DataFrame:
                g = x.groupby(["a", "b"], as_index=False).agg(
                    __s=("v", "sum"), __m=("v", "min"))
                return g.astype({"__s": "int64", "__m": "int64"})

            partial = ds.map_batches(local, batch_format="pandas")
            got = dedupmod.range_fold_partials(
                partial, ["a", "b"], [("__s", "sum"), ("__m", "min")],
                nranges=nranges,
                range_by=["a"] if route_subset else None,
                out_names=["a", "b", "s", "m"]).to_pandas() \
                .sort_values(["a", "b"]).reset_index(drop=True)
            exp = df.groupby(["a", "b"], as_index=False).agg(
                s=("v", "sum"), m=("v", "min")) \
                .sort_values(["a", "b"]).reset_index(drop=True) \
                .astype({"s": "int64", "m": "int64"})
            pd.testing.assert_frame_equal(
                got.astype(exp.dtypes.to_dict()), exp)

        prop()

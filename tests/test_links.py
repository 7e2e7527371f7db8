"""Hyperlink extraction (functions/links.py) and the LAG window
(stages/temporal.lag_deltas)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from geetiles_ray.functions import links
from geetiles_ray.sources.pages import extract_text
from geetiles_ray.stages import temporal as tmp


class TestLinks:
    def test_link_rule_counts(self):
        assert links.link_targets(0) == []
        assert len(links.link_targets(7)) == 3
        assert links.link_targets(5)[0] == \
            f"https://dst{(5 * 31 + 7) % 97}.example/5-0"

    def test_text_invariant_preserved(self):
        # north rule: adding link anchors must not change extracted text
        text = "the quick tile page crawl web data map grid cell"
        for d in (0, 1, 2, 3, 7, 123):
            h = links.html_with_links(text, d)
            assert extract_text(h) == text

    def test_href_hosts_strips_userinfo_and_port(self):
        h = (b'<html><body><a href="https://u:p@ex.com:8080/x"></a>'
             b'<a href="http://plain.org/"></a>'
             b'<a href="/relative/path"></a></body></html>')
        assert links.href_hosts(h) == ["ex.com", "plain.org"]

    def test_extract_links_batch_flatmap_shape(self):
        texts = ["a b c"] * 4
        ids = [0, 1, 2, 3]  # 0+1+2+3 = 6 edges
        batch = pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "html": pa.array([links.html_with_links(t, d)
                              for t, d in zip(texts, ids)],
                             type=pa.binary()),
        })
        edges = links.extract_links_batch(batch)
        assert len(edges) == 6
        # every edge matches the synthesis rule
        src = edges["doc_id"].to_pylist()
        dst = edges["dst_host"].to_pylist()
        for d in ids:
            want = [u.split("//")[1].split("/")[0]
                    for u in links.link_targets(d)]
            got = [h for s, h in zip(src, dst) if s == d]
            assert got == want

    def test_extract_links_empty_batch(self):
        batch = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "html": pa.array([], type=pa.binary())})
        out = links.extract_links_batch(batch)
        assert len(out) == 0
        assert out.column_names == ["doc_id", "dst_host"]


class TestHostRank:
    def test_end_to_end_matches_brute_reference(self):
        # q_host_rank at sf0.001 vs a driver-side brute replay: edges from
        # the same link rule (src = doc_id % 97, dst per link_targets),
        # ranks from graph.pagerank_reference — proves the html parse,
        # host mapping and all 3 integer iterations end-to-end.
        from geetiles_ray.pipelines import graph as graphmod
        from geetiles_ray.pipelines.queries import q_host_rank

        sf_dir = "/root/testdata/sf0.001"
        out = q_host_rank(sf_dir)
        n = links.N_DST_HOSTS
        assert list(out["node"]) == list(range(n))
        assert (out["host"] == "dst" + out["node"].astype(str)
                + ".example").all()

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
        rows = []
        for d in docs["doc_id"].to_numpy():
            for u in links.link_targets(int(d)):
                host = u.split("//")[1].split("/")[0]
                rows.append((int(d) % n, int(host[3:].split(".")[0])))
        edges = pd.DataFrame(rows, columns=["src", "dst"])
        want = graphmod.pagerank_reference(edges, n, iters=3)
        assert list(out["r"]) == list(want)


class TestLagDeltas:
    def test_matches_pandas_lag(self):
        rng = np.random.default_rng(7)
        n = 500
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "ts_us": rng.integers(0, 10_000, n).astype(np.int64),
        })
        ds = ray.data.from_pandas(df)
        out = tmp.lag_deltas(ds, key="user_id", ts="ts_us",
                             order_tiebreak="event_id", out_col="delta_us") \
            .to_pandas().sort_values("event_id").reset_index(drop=True)

        want = df.sort_values(["user_id", "ts_us", "event_id"]).copy()
        prev = want.groupby("user_id")["ts_us"].shift()
        want["delta_us"] = (want["ts_us"] - prev).fillna(-1).astype("int64")
        want = want.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[["event_id", "user_id", "ts_us", "delta_us"]], want)

    def test_single_event_users_get_sentinel(self):
        df = pd.DataFrame({"event_id": [0, 1], "user_id": [1, 2],
                           "ts_us": [100, 200]})
        out = tmp.lag_deltas(ray.data.from_pandas(df), key="user_id",
                             ts="ts_us", order_tiebreak="event_id",
                             out_col="d").to_pandas()
        assert set(out["d"]) == {-1}

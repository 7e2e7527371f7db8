"""Driver-checkable query suite: each ``q_*`` has a Ray Data implementation
and (where SQL-expressible) a DuckDB oracle string with IDENTICAL column
names and value arithmetic (see __ray_entry__ contract). Inputs are the
driver's parquet tables under ``sf_dir`` (TESTDATA.md).

Float parity discipline: every float that reaches an output is either the
result of an identically-structured IEEE expression on both sides, or is
rounded to a fixed number of decimals in BOTH implementations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..functions import geocode as geo
from ..sources import pages as pagesmod
from . import dedup as dedupmod


def _docs_with_points(sf_dir: str) -> ray.data.Dataset:
    """documents → url (pure fn of doc_id) → geocoded lon/lat + arith tile."""
    ds = pagesmod.pages_from_documents(sf_dir)

    def add_geo(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        lon, lat = geo.geocode(urls, langs)
        tile = geo.arith_tile(lon, lat)
        return pa.table({
            "doc_id": batch["doc_id"], "url": batch["url"],
            "lang": batch["lang"], "text": batch["text"],
            "lon": pa.array(lon), "lat": pa.array(lat),
            "tile_key": pa.array(tile),
        })

    return ds.map_batches(add_geo, batch_format="pyarrow")


_GEO_CTE = """
WITH pages AS (
  SELECT doc_id, {url} AS url, lang, text FROM documents
), geo AS (
  SELECT doc_id, url, lang, text, {lon} AS lon, {lat} AS lat FROM pages
), tiled AS (
  SELECT *, {tile} AS tile_key FROM geo
)
"""


def _geo_cte() -> str:
    lon, lat = geo.geocode_sql("url", "lang")
    return _GEO_CTE.format(url=pagesmod.URL_FROM_DOCID_SQL, lon=lon, lat=lat,
                           tile=geo.arith_tile_sql("lon", "lat"))


# ------------------------------------------------------------------ queries

def q_page_tile_counts(sf_dir: str):
    """Pages per tile on the arithmetic grid (the SQL-parity twin of the
    UTM-grid assignment, which tests/test_grid_and_assign.py oracles)."""
    ds = _docs_with_points(sf_dir)
    return dedupmod.partial_counts(ds, ["tile_key"], "n_pages").sort("tile_key")


SQL_PAGE_TILE_COUNTS = _geo_cte() + """
SELECT tile_key, COUNT(*) AS n_pages FROM tiled GROUP BY tile_key ORDER BY tile_key
"""


def q_tile_lang_share(sf_dir: str):
    """Per-tile language proportions (label-proportions analogue A1)."""
    counts = dedupmod.partial_counts(_docs_with_points(sf_dir),
                                     ["tile_key", "lang"], "n").to_pandas()
    tot = counts.groupby("tile_key")["n"].transform("sum")
    counts["share"] = (counts["n"] / tot).round(9)
    return counts.sort_values(["tile_key", "lang"]).reset_index(drop=True)


SQL_TILE_LANG_SHARE = _geo_cte() + """
SELECT tile_key, lang, COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY tile_key) AS DOUBLE), 9) AS share
FROM tiled GROUP BY tile_key, lang ORDER BY tile_key, lang
"""


def q_knn_pages(sf_dir: str):
    """3-NN among document points for the 10 lowest doc_ids (kNN operator
    J-graft): output (query_id, neighbor_id, rank) rows."""
    ds = _docs_with_points(sf_dir).select_columns(["doc_id", "lon", "lat"])
    qdf = ds.sort("doc_id").limit(10).to_pandas()
    qid = qdf.doc_id.to_numpy()
    qlon = qdf.lon.to_numpy()
    qlat = qdf.lat.to_numpy()

    def pair(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()[:, None]
        lat = batch["lat"].to_numpy()[:, None]
        did = batch["doc_id"].to_numpy()
        d2 = (lon - qlon[None, :]) ** 2 + (lat - qlat[None, :]) ** 2
        n, q = d2.shape
        # per-batch top-3 per query (combiner: ≤ 3*q rows leave each batch)
        out_q, out_n, out_d = [], [], []
        for j in range(q):
            dj = d2[:, j]
            mask = did != qid[j]
            order = np.lexsort((did[mask], dj[mask]))[:3]
            sel = np.nonzero(mask)[0][order]
            out_q.extend([qid[j]] * len(sel))
            out_n.extend(did[sel])
            out_d.extend(dj[sel])
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "d2": pa.array(out_d, type=pa.float64())})

    cand = ds.map_batches(pair, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "d2", "neighbor_id"], kind="stable")
    top = cand.groupby("query_id", sort=True).head(3).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]]


SQL_KNN_PAGES = _geo_cte() + """
, q AS (SELECT doc_id AS query_id, lon AS qlon, lat AS qlat FROM tiled
        ORDER BY doc_id LIMIT 10)
, pairs AS (
  SELECT q.query_id, t.doc_id AS neighbor_id,
         (t.lon - q.qlon) * (t.lon - q.qlon) + (t.lat - q.qlat) * (t.lat - q.qlat) AS d2
  FROM q CROSS JOIN tiled t WHERE t.doc_id <> q.query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
  FROM pairs
) WHERE rank <= 3 ORDER BY query_id, rank
"""


def q_dedup_events(sf_dir: str):
    """Exact dedup: first event per (user_id, event_type) by (ts, event_id)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "event_type"])
    out = dedupmod.dedup_exact(ds, key=["user_id", "event_type"],
                               order_col=["ts", "event_id"])
    return out.sort(["user_id", "event_type"]).select_columns(
        ["user_id", "event_type", "event_id"])


SQL_DEDUP_EVENTS = """
SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id, event_type
"""


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate over lineitem (groupby/agg breadth)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less_equal(batch["l_shipdate"],
                             pa.scalar(pd.Timestamp("1998-09-02")))
        batch = batch.filter(keep)
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc_price)

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                   Sum("disc_price", alias_name="sum_disc_price"),
                   Mean("l_discount", alias_name="avg_disc"),
                   Count(alias_name="count_order")) \
        .to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    out["sum_qty"] = out.sum_qty.round(2)
    out["sum_disc_price"] = out.sum_disc_price.round(2)
    out["avg_disc"] = out.avg_disc.round(6)
    return out


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def q_top_customers(sf_dir: str):
    """Join + top-k: revenue per customer joined to nation, top 10."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    rev = dedupmod.partial_sums(orders, ["o_custkey"], "o_totalprice", "revenue")
    # small side broadcast join (customer+nation are dimension tables)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    dimref = ray.put(dim[["c_custkey", "c_name", "n_name"]])

    class JoinDim:
        def __init__(self):
            self.dim = ray.get(dimref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.dim, left_on="o_custkey", right_on="c_custkey") \
                [["c_custkey", "c_name", "n_name", "revenue"]]

    out = rev.map_batches(JoinDim, batch_format="pandas", concurrency=2) \
        .sort(["revenue", "c_custkey"], descending=[True, False]).limit(10).to_pandas()
    out["revenue"] = out.revenue.round(2)
    return out


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, n_name, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM(o_totalprice) DESC, c_custkey LIMIT 10
"""


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: events per (event_type, hour)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy()
        hour = (ts.astype("datetime64[s]").astype(np.int64) // 3600) * 3600
        return pa.table({"event_type": batch["event_type"],
                         "hour_epoch": pa.array(hour, type=pa.int64()),
                         "value": batch["value"]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["event_type", "hour_epoch"]) \
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value")) \
        .to_pandas().sort_values(["event_type", "hour_epoch"]).reset_index(drop=True)
    out["sum_value"] = out.sum_value.round(4)
    return out


SQL_EVENTS_HOURLY = """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type, hour_epoch ORDER BY event_type, hour_epoch
"""


def q_token_stats(sf_dir: str):
    """Text analysis: per-lang doc count, token total, avg chars."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text", "n_chars"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        # token count = single-space split length (DuckDB string_split parity)
        df["n_tokens"] = df.text.str.count(" ").astype("int64") + 1
        return df[["lang", "n_tokens", "n_chars"]]

    out = ds.map_batches(prep, batch_format="pandas") \
        .groupby("lang") \
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_tokens", alias_name="total_tokens"),
                   Mean("n_chars", alias_name="avg_chars")) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    out["avg_chars"] = out.avg_chars.round(6)
    return out


SQL_TOKEN_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       SUM(array_length(string_split(text, ' '))) AS total_tokens,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


REGISTRY = {
    "page_tile_counts": (q_page_tile_counts, SQL_PAGE_TILE_COUNTS),
    "tile_lang_share": (q_tile_lang_share, SQL_TILE_LANG_SHARE),
    "knn_pages": (q_knn_pages, SQL_KNN_PAGES),
    "dedup_events": (q_dedup_events, SQL_DEDUP_EVENTS),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
}

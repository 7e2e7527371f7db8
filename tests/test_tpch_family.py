"""TPC-H-family queries vs their DuckDB twins at sf0.001 — the same
comparison tools/check_oracle.py runs, kept in-suite so `pytest` alone
covers the Q-only rows (shipping_priority, late_orders,
priority_shipmix, promo_share, returned_revenue)."""

import duckdb
import pandas as pd
import pytest

from geetiles_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["customer", "orders", "lineitem", "part"]

CASES = [
    ("shipping_priority", q.q_shipping_priority, q.SQL_SHIPPING_PRIORITY),
    ("late_orders", q.q_late_orders, q.SQL_LATE_ORDERS),
    ("priority_shipmix", q.q_priority_shipmix, q.SQL_PRIORITY_SHIPMIX),
    ("promo_share", q.q_promo_share, q.SQL_PROMO_SHARE),
    ("returned_revenue", q.q_returned_revenue, q.SQL_RETURNED_REVENUE),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * "
              f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name,fn,sql", CASES,
                         ids=[c[0] for c in CASES])
def test_matches_duckdb(name, fn, sql, con):
    ray_df = fn(SF_DIR)
    sql_df = con.sql(sql).df()
    a = ray_df[sorted(ray_df.columns)].reset_index(drop=True)
    b = sql_df[sorted(sql_df.columns)].reset_index(drop=True)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), name
    # order-insensitive value compare, same discipline as the driver
    key = list(a.columns)
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("datetime") \
                or str(bv.dtype).startswith("datetime"):
            av = pd.to_datetime(av).astype("datetime64[us]")
            bv = pd.to_datetime(bv).astype("datetime64[us]")
        else:
            assert av.dtype == bv.dtype, (name, c, av.dtype, bv.dtype)
        assert (av == bv).all(), (name, c)

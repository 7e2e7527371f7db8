"""Scale probe for the round-3b operators (text-curation family): runs
each over a deterministic synthetic pages-shaped table of PROBE_ROWS
(default 1M) texts ≈ 40 words each (~0.25 GB of string payload) plus an
events-shaped table — the oracle tables are 500-10⁴ rows, so this checks
the plans at 10²-10³× that. Prints one JSON line; recorded in
BENCH/BASELINE.md.

Usage: python tools/scale_probe_r3b.py  [PROBE_ROWS=1000000 RAY_GRAFT_CPUS=32]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PROBE_ROWS", "1000000"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

_VOCAB = np.array([f"w{i:02d}" for i in range(200)], dtype=object)
_BOILER = "cookie banner accept"  # 3-word aligned boilerplate segment


def synth_pages(n: int):
    """n docs, ~40 words each from a 200-word vocab; every 4th doc starts
    with a shared 3-word boilerplate segment (aligned → removable by
    segment_dedup width=3); every 16th doc doubles one 2-gram (repetition
    signal). Deterministic per block."""
    import pyarrow as pa
    import ray.data

    nblocks = NCPU * 4
    per = -(-n // nblocks)

    def gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        lo = b * per
        m = min(per, n - lo)
        ids = np.arange(lo, lo + m, dtype=np.int64)
        r = np.random.default_rng(b + 7)
        nw = 39  # multiple of 3 → aligned windows
        words = _VOCAB[r.integers(0, len(_VOCAB), (m, nw))]
        texts = np.array([" ".join(row) for row in words], dtype=object)
        boiler = ids % 4 == 0
        texts[boiler] = _BOILER + " " + texts[boiler]
        return pa.table({
            "doc_id": ids,
            "text": pa.array(texts, type=pa.string()),
            "lang": np.take(np.array(["en", "es", "de", "fr", "zh"]),
                            (ids % 5).astype(np.int64)),
            "n_chars": pa.array(np.char.str_len(texts.astype(str))
                                .astype(np.int64)),
        })

    return ray.data.range(nblocks, override_num_blocks=nblocks) \
        .map_batches(lambda t: pa.table({"b": t["id"]}),
                     batch_format="pyarrow", batch_size=None) \
        .map_batches(gen, batch_format="pyarrow", batch_size=None) \
        .materialize()


def main():
    import pyarrow as pa
    import ray
    import ray.data

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from bench import host_probe
    from geetiles_ray.pipelines import analytics as an
    from geetiles_ray.pipelines import lines, pyramid
    from geetiles_ray.functions import url as urlmod
    from geetiles_ray.ray_tuning import tune
    from geetiles_ray.stages import joins
    tune(NCPU)

    pages = synth_pages(N)
    out = {"rows": N, "num_cpus": NCPU, **host_probe()}

    def timed(name, fn):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        out[name] = round(dt, 2)
        out[f"{name}_rows_per_sec"] = round(N / dt)

    timed("segment_dedup", lambda: lines.segment_dedup(
        pages, "text", mode="words", width=3, min_docs=2).count())
    timed("repetition_stats", lambda: lines.repetition_stats(
        pages, ns=(2, 3)).count())
    timed("token_postings", lambda: an.token_postings(pages).count())
    timed("tfidf_topk", lambda: an.tfidf_topk(pages, k=3).count())

    def add_urls(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        langs = batch["lang"].to_pylist()
        urls = [f"https://{lg}.site{int(i) % 5000}.example/p/{int(i)}"
                for lg, i in zip(langs, d)]
        return pa.table({"url": pa.array(urls, type=pa.string()),
                         "lang": batch["lang"], "n_chars": batch["n_chars"]})

    with_urls = pages.map_batches(add_urls, batch_format="pyarrow") \
        .materialize()
    timed("domain_stats_5k_domains", lambda: urlmod.domain_stats(with_urls))

    def cells(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        r = np.random.default_rng(int(d[0]) % 100003 + 1)
        nx = 1 << 10
        return pa.table({"tx": r.integers(0, nx, len(d)),
                         "ty": r.integers(0, nx, len(d))})

    pts = pages.map_batches(cells, batch_format="pyarrow").materialize()
    timed("pyramid_z10_to_0", lambda: pyramid.pyramid_counts(
        pts, "tx", "ty", base_zoom=10))

    left = pages.map_batches(
        lambda b: pa.table({"identifier": b["doc_id"],
                            "lv": b["n_chars"]}), batch_format="pyarrow") \
        .materialize()
    rkeys = np.arange(0, N, 100, dtype=np.int64)  # 1% selectivity
    right = ray.data.from_arrow(pa.table({
        "identifier": rkeys, "rv": rkeys * 2}))
    timed("join_bloom_1pct", lambda: joins.join_on_identifier_bloom(
        left, right).count())
    timed("join_plain_1pct", lambda: joins.join_on_identifier(
        left, right).count())

    ev = pages.map_batches(
        lambda b: pa.table({
            "event_id": b["doc_id"],
            "user_id": pa.array(b["doc_id"].to_numpy() % 10000),
            "ts": b["n_chars"],
            "cents": pa.array((b["doc_id"].to_numpy() * 37) % 100000)}),
        batch_format="pyarrow").materialize()
    timed("running_total", lambda: an.running_total(
        ev, key="user_id", order_cols=["ts", "event_id"],
        value_col="cents").count())
    timed("grouped_quantiles", lambda: an.grouped_quantiles(
        ev, "user_id", "cents", [0.25, 0.5, 0.75]))
    timed("rollup", lambda: an.rollup(
        ev.map_batches(lambda b: pa.table({
            "region": pa.array((b["user_id"].to_numpy() % 5)
                               .astype(np.int64)),
            "nation": pa.array((b["user_id"].to_numpy() % 25)
                               .astype(np.int64)),
            "cents": b["cents"]}), batch_format="pyarrow"),
        ["region", "nation"], "cents"))

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

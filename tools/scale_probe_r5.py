"""Round-5 scale probe: the three new training-prep operators
(chunk_plan, shard_plan, redact_pii) on a ~1M-doc synthetic corpus.

What each one must prove at this shape:
- chunk_plan: pure map-side flat expansion — wall time linear in bytes,
  driver RSS flat (the planner never materializes chunk strings; output
  here is consumed by a count aggregate, not to_pandas).
- shard_plan: exact global ROW_NUMBER over 1M rows with only an
  nranges-row table on the driver — RSS flat, one co-bucket exchange.
- redact_pii: regex mask chain — map-side, linear, RSS flat.

Usage: python tools/scale_probe_r5.py [n_docs]
Writes one JSON line; pass criterion = driver RSS growth ≪ corpus size
and no operator degrades super-linearly vs the 100k leg.
"""

from __future__ import annotations

import json
import resource
import sys
import time


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/scale_probe_r5_docs_{n_docs}.parquet"
    if not os.path.exists(path):
        # ~40 tokens/doc, id-derived, with injected emails/IPs every few
        # docs so the redaction rules actually fire
        ids = np.arange(n_docs, dtype=np.int64)
        texts = [
            " ".join(f"w{(i * m + j) % 50000}"
                     for j, m in enumerate((1, 7, 13, 29, 31, 37, 41, 43))
                     for _ in range(5))
            + (f" u{i}@h{i % 9}.example" if i % 3 == 0 else "")
            + (f" 10.0.{i % 256}.{(i * 7) % 256}" if i % 5 == 0 else "")
            for i in ids
        ]
        pq.write_table(pa.table({"doc_id": ids, "text": texts}), path)

    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    import logging

    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    from ray.data.aggregate import Sum

    from geetiles_ray.functions import pii as piimod
    from geetiles_ray.pipelines import analytics as anmod

    results = {"n_docs": n_docs, "rss_mb_start": round(rss_mb(), 1)}

    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])

    t0 = time.time()
    total = anmod.chunk_plan(ds, window=64, stride=48) \
        .aggregate(Sum("n_chunk_bytes"))
    results["chunk_plan_sec"] = round(time.time() - t0, 2)
    results["chunk_sum_bytes"] = int(total["sum(n_chunk_bytes)"])

    t0 = time.time()
    sh = anmod.shard_plan(ds, key_col="doc_id", shard_size=4096)
    shard_counts = sh.groupby("shard").count().to_pandas()
    results["shard_plan_sec"] = round(time.time() - t0, 2)
    results["n_shards"] = int(len(shard_counts))
    full = shard_counts["count()"].iloc[:-1] if len(shard_counts) > 1 \
        else shard_counts["count()"]
    results["all_full_shards_4096"] = bool((full == 4096).all())

    t0 = time.time()
    red = piimod.redact_pii(ds).aggregate(Sum("n_email"), Sum("n_ipv4"))
    results["redact_pii_sec"] = round(time.time() - t0, 2)
    results["n_emails_masked"] = int(red["sum(n_email)"])
    results["n_ips_masked"] = int(red["sum(n_ipv4)"])

    # sliding 8-gram census + probe pass (dup spans exist by synthesis:
    # the 40-token body repeats its 8-token pattern 5x within each doc,
    # and doc bodies collide across ids sharing (i*m+j)%50000 patterns)
    from geetiles_ray.pipelines import lines as linesmod
    t0 = time.time()
    dup = linesmod.dup_ngram_stats(ds, width=8, min_docs=2) \
        .aggregate(Sum("n_dup"))
    results["dup_ngrams_sec"] = round(time.time() - t0, 2)
    results["n_dup_windows"] = int(dup["sum(n_dup)"])

    # exact stratified take-k over a 16-way synthetic stratum
    def strat(batch):
        import pyarrow as _pa
        d = batch["doc_id"].to_numpy()
        return _pa.table({"doc_id": batch["doc_id"],
                          "lang": _pa.array([f"s{int(x) % 16}"
                                             for x in d])})
    sds = ds.select_columns(["doc_id"]).map_batches(
        strat, batch_format="pyarrow")
    quota = {f"s{i}": 1000 * (i + 1) for i in range(16)}
    t0 = time.time()
    taken = anmod.stratified_take(sds, "doc_id", "lang", quota)
    sizes = taken.groupby("lang").count().to_pandas()
    results["stratified_take_sec"] = round(time.time() - t0, 2)
    per_stratum = n_docs // 16  # doc_id % 16 is exactly uniform
    results["quotas_exact"] = bool(all(
        int(sizes[sizes.lang == s]["count()"].iloc[0])
        == min(q, per_stratum)
        for s, q in quota.items()))

    results["rss_mb_end"] = round(rss_mb(), 1)
    results["rss_mb_growth"] = round(
        results["rss_mb_end"] - results["rss_mb_start"], 1)
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Cross-snapshot incremental dedup — a NEW crawl snapshot drops keys
already ingested by PRIOR runs without rescanning their payloads.

This is the reference's ``skip_if_exists`` resume contract
(/root/reference/geetiles/gee.py:267-274 — "a tile already on disk is
never re-fetched") lifted from per-file granularity to corpus scale:
the durable record of what a prior run ingested is its checkpointed
partition layout + manifests (state/manifest.py), and a new snapshot
consults ONLY the key column of that record.

Scale shape (the whole point at 100 TB):
- prior snapshots are read column-pruned (just ``key``) straight from
  their checkpoint parquet — the html/text payloads never move;
- a Bloom filter over the prior keys is built from constant-size
  per-block partials (stages/joins.key_bloom) and broadcast ONCE via
  ``ray.put``; the membership probe is a pure map over the new
  snapshot, so rows that are PROVABLY new (Bloom has no false
  negatives) never enter any exchange;
- only Bloom HITS (true re-crawls + the few-% false positives) are
  verified exactly, through one co-bucketed hash exchange against the
  prior keys — the exchange carries |dups| + fp·|new| rows, not the
  snapshot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.arrowio import dataset_arrow_schema, pandas_to_arrow_normalizer
from ..stages.joins import bloom_member, key_bloom
from ..stages.temporal import _key_hash


def prior_keys(prior_dirs: list[str], key: str) -> ray.data.Dataset:
    """Column-pruned union of the ``key`` column across prior snapshots'
    checkpoint dirs. Nothing but the key column leaves storage."""
    from ..state import manifest as manifestmod

    if not prior_dirs:
        raise ValueError("prior_dirs is empty")
    parts = [manifestmod.read_checkpointed(d).select_columns([key])
             for d in prior_dirs]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def dedup_against_snapshots(
    ds: ray.data.Dataset,
    prior_dirs: list[str],
    key: str = "url",
    nbits: int = 1 << 23,
    nhashes: int = 2,
    nbuckets: int = 64,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose ``key`` appears in NO prior snapshot. Exact
    (the Bloom filter only routes: misses bypass, hits are verified by a
    co-bucketed anti-join), whatever the false-positive rate.

    CONTRACT — deterministic rescan: ``ds`` is executed twice (once per
    Bloom split), the same contract as joins.join_on_identifier_bloom;
    a non-deterministic upstream must be materialized by the caller.
    """
    if not prior_dirs:
        return ds
    keys_ds = prior_keys(prior_dirs, key)
    bloom_ref = key_bloom(keys_ds, key, nbits=nbits, nhashes=nhashes)
    target = dataset_arrow_schema(ds, ds.schema().names)
    out_names = list(target.names)

    class Split:
        """Bloom probe as a stateful stage: the bitset is ray.get ONCE per
        actor, never per batch."""

        def __init__(self, want_hit: bool):
            self.words = ray.get(bloom_ref)
            self.want_hit = want_hit

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not len(batch):
                return batch
            hit = bloom_member(self.words, _key_hash(batch[key]),
                               nbits, nhashes)
            return batch.filter(pa.array(hit == self.want_hit))

    new_for_sure = ds.map_batches(
        Split, fn_constructor_kwargs=dict(want_hit=False),
        batch_format="pyarrow", concurrency=(1, 4))
    candidates = ds.map_batches(
        Split, fn_constructor_kwargs=dict(want_hit=True),
        batch_format="pyarrow", concurrency=(1, 4))

    # exact verify: co-bucket candidates (src=0, full row) with prior keys
    # (src=1, key only — other columns padded with typed nulls so the
    # union shares ONE explicit schema) and anti-filter per bucket
    def tag(src: int):
        def f(batch: pa.Table) -> pa.Table:
            b = (_key_hash(batch[key]) % np.uint64(nbuckets)).astype(np.int64)
            cols = {}
            for n in out_names:
                cols[n] = (batch[n] if n in batch.column_names
                           else pa.nulls(len(batch), type=target.field(n).type))
            t = pa.table(cols)
            return t.append_column("__bucket", pa.array(b)) \
                .append_column("__src", pa.array([src] * len(batch),
                                                 type=pa.int8()))
        return f

    both = candidates.map_batches(tag(0), batch_format="pyarrow").union(
        keys_ds.map_batches(tag(1), batch_format="pyarrow"))
    to_arrow = pandas_to_arrow_normalizer(target)

    def per_bucket(group: pd.DataFrame) -> pa.Table:
        seen = group.loc[group["__src"] == 1, key]
        keep = group[(group["__src"] == 0) & ~group[key].isin(seen)]
        return to_arrow(keep)

    survivors = both.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")
    return new_for_sure.union(survivors)


def ingest_snapshot(
    ds: ray.data.Dataset,
    dest_dir: str,
    prior_dirs: list[str] | None = None,
    key: str = "url",
    n_partitions: int | None = None,
    nbits: int = 1 << 23,
) -> dict:
    """Checkpointed snapshot ingest: drop keys already in ``prior_dirs``
    (if any), then durable partitioned write with per-partition manifests
    — so BOTH resume layers hold: a killed run of THIS snapshot skips its
    finished partitions on re-run, and the next snapshot dedups against
    this one's record without rescanning it."""
    from ..state import manifest as manifestmod

    if prior_dirs:
        ds = dedup_against_snapshots(ds, prior_dirs, key=key, nbits=nbits)
    return manifestmod.checkpointed_write(
        ds, dest_dir, key_col=key, n_partitions=n_partitions)

"""Arrow/pandas block-schema utilities shared by the exchange kernels.

Two recurring needs, one home (round-4 review: the idiom was growing
copies in joins.py and dedup.py):

- ``pa_type``: normalize whatever ``Dataset.schema().types`` yields
  (Arrow DataType for arrow-block datasets, numpy dtypes / python
  classes for pandas-block ones) to a ``pyarrow.DataType``.
- ``pandas_to_arrow_normalizer``: a map_batches fn that converts pandas
  kernel output to Arrow under ONE explicit schema — without it, an
  empty or all-null batch infers ``null``-typed columns and the blocks
  of a union/fold diverge (observed crashing schema unification on
  multi-core hosts where some hash ranges are empty).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pa_type(t) -> pa.DataType:
    """Schema type (Arrow, numpy dtype, or python class) → pa.DataType."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string() if t in (object, str) else pa.null()


def dataset_arrow_schema(ds, names: list[str]) -> pa.Schema:
    """Explicit Arrow schema of ``names`` from a Dataset's reported
    schema, normalized via :func:`pa_type` (works for pandas-block
    datasets too)."""
    types = {n: pa_type(t)
             for n, t in zip(ds.schema().names, ds.schema().types)}
    return pa.schema([(n, types[n]) for n in names])


def pandas_to_arrow_normalizer(target: pa.Schema):
    """Returns f(pd.DataFrame) -> pa.Table that selects the target's
    columns and converts under the explicit schema (NaN→typed null; an
    empty frame yields a typed empty table, never null columns)."""
    names = list(target.names)

    def to_arrow(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(df[names], schema=target,
                                    preserve_index=False)

    return to_arrow

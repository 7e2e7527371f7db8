"""Named-AOI registry (S5): the reference looks AOI names up in a bundled
natural_earth parquet over country/continent/region columns and unions the
shapes (utils.py:139-182; the parquet blob is stripped from the reference
snapshot). Here: a small built-in registry of named fixture AOIs plus a
user-extensible parquet lookup with the same search-priority semantics
(exact name match over a priority-ordered column list)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from ..functions import geom, wkt

_BUILTIN = {
    # the pages-fixture AOI bbox (functions/geocode.py)
    "luxbox": "POLYGON ((5.8 49.4, 6.6 49.4, 6.6 50.2, 5.8 50.2, 5.8 49.4))",
    # the non-convex test AOI (tests/conftest.py)
    "luxel": ("POLYGON ((5.8 49.45, 6.5 49.45, 6.5 49.8, 6.2 49.8, "
              "6.2 50.1, 5.8 50.1, 5.8 49.45))"),
}


class AOINames:
    """Lazy registry; ``load`` may point at a parquet with columns
    (name, wkt) or (country, continent, region, wkt)."""

    def __init__(self):
        self.table = None

    def load(self, parquet_path: str | None = None):
        if parquet_path:
            self.table = pq.read_table(parquet_path)
        return self

    def get_aoi(self, name: str) -> np.ndarray:
        """name → exterior ring. Search order mirrors the reference's
        priority columns (utils.py:162-176): explicit name, then country /
        continent / region columns of the loaded table."""
        if name in _BUILTIN:
            return wkt.load_exterior(_BUILTIN[name])
        if self.table is not None:
            cols = [c for c in ["name", "country", "continent", "region"]
                    if c in self.table.column_names]
            for col in cols:
                mask = [str(v).lower() == name.lower()
                        for v in self.table[col].to_pylist()]
                if any(mask):
                    idx = mask.index(True)
                    return wkt.load_exterior(self.table["wkt"][idx].as_py())
        raise ValueError(f"unknown AOI name: {name}")


aoinames = AOINames()

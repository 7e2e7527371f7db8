"""Deterministic geocoding of web pages: (url, lang) → (lon, lat).

The graft's analogue of the reference's per-tile geographic anchoring
(SURVEY.md §1.5 mapping table): every page gets a deterministic point from
the sha256 of its url, biased by ``lang`` into per-language "hot" boxes so
dense crawl regions create skewed cells (BASELINE.json north_rule skew
requirement; FIXTURES.md F1 geocode oracle).

The arithmetic is deliberately expressible in ANSI SQL (DuckDB:
``('0x' || substr(sha256(url), 1, 8))::ubigint``) so the driver's oracle can
reproduce it exactly — see __ray_entry__.oracle_sql().

    h1 = int(sha256(url).hexdigest()[0:8],  16)
    h2 = int(sha256(url).hexdigest()[8:16], 16)
    u1 = (h1 % 1000000) / 1000000.0          # in [0, 1)
    u2 = (h2 % 1000000) / 1000000.0
    lang in HOT:  lon = hot.W + u1 * 0.1 ;  lat = hot.S + u2 * 0.1
    else:         lon = W + u1 * (E - W) ;  lat = S + u2 * (N - S)
"""

from __future__ import annotations

import hashlib

import numpy as np

# Fixture AOI bounding box (FIXTURES.md F2: ~1°×1°, Luxembourg-ish)
AOI_W, AOI_S, AOI_E, AOI_N = 5.8, 49.4, 6.6, 50.2

# per-language hot boxes (0.1° × 0.1°) — ≥30% of pages land here
HOT_BOXES = {
    "en": (6.05, 49.95),
    "zh": (6.35, 49.55),
}


def url_hash_units(urls) -> tuple[np.ndarray, np.ndarray]:
    """Vector of (u1, u2) uniform units from sha256(url). One hashlib call
    per row (unavoidable), but digest→int decoding is a single vectorized
    big-endian uint32 view over the concatenated digests (int(hexdigest
    [0:8], 16) == big-endian uint32 of digest bytes 0:4)."""
    n = len(urls)
    if n == 0:
        return np.empty(0), np.empty(0)
    digests = np.frombuffer(
        b"".join(hashlib.sha256(u.encode("utf-8")).digest() for u in urls),
        dtype=np.uint8).reshape(n, 32)
    h1 = digests[:, 0:4].copy().view(">u4").ravel().astype(np.uint64)
    h2 = digests[:, 4:8].copy().view(">u4").ravel().astype(np.uint64)
    u1 = (h1 % 1000000) / 1000000.0
    u2 = (h2 % 1000000) / 1000000.0
    return u1, u2


def geocode(urls, langs) -> tuple[np.ndarray, np.ndarray]:
    """(urls, langs) arrays → (lon, lat) float64 arrays."""
    u1, u2 = url_hash_units(urls)
    langs = np.asarray(langs, dtype=object)
    lon = AOI_W + u1 * (AOI_E - AOI_W)
    lat = AOI_S + u2 * (AOI_N - AOI_S)
    for lg, (w, s) in HOT_BOXES.items():
        m = langs == lg
        lon[m] = w + u1[m] * 0.1
        lat[m] = s + u2[m] * 0.1
    return lon, lat


def geocode_sql(url_expr: str = "url", lang_expr: str = "lang") -> tuple[str, str]:
    """DuckDB SQL expressions computing the identical (lon, lat)."""
    h1 = f"(('0x' || substr(sha256({url_expr}), 1, 8))::ubigint % 1000000) / 1000000.0"
    h2 = f"(('0x' || substr(sha256({url_expr}), 9, 8))::ubigint % 1000000) / 1000000.0"
    lon_cases = " ".join(
        f"WHEN {lang_expr} = '{lg}' THEN {w!r} + {h1} * 0.1"
        for lg, (w, _s) in HOT_BOXES.items()
    )
    lat_cases = " ".join(
        f"WHEN {lang_expr} = '{lg}' THEN {s!r} + {h2} * 0.1"
        for lg, (_w, s) in HOT_BOXES.items()
    )
    lon = f"(CASE {lon_cases} ELSE {AOI_W!r} + {h1} * ({AOI_E!r} - {AOI_W!r}) END)"
    lat = f"(CASE {lat_cases} ELSE {AOI_S!r} + {h2} * ({AOI_N!r} - {AOI_S!r}) END)"
    return lon, lat


# ---- uniform arithmetic tile grid (the SQL-parity assignment target) ----
# A gap-free equal-angle grid over the AOI bbox: the oracle-checkable
# counterpart of the UTM grid tileset (which pytest checks instead,
# tests/test_assign.py, because UTM math is not SQL-expressible).
ARITH_STEP = 0.05
ARITH_NX = int(round((AOI_E - AOI_W) / ARITH_STEP))  # 16
ARITH_NY = int(round((AOI_N - AOI_S) / ARITH_STEP))  # 16


def arith_tile(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Point → int64 tile key on the uniform arithmetic grid."""
    tx = np.clip(np.floor((lon - AOI_W) / ARITH_STEP).astype(np.int64), 0, ARITH_NX - 1)
    ty = np.clip(np.floor((lat - AOI_S) / ARITH_STEP).astype(np.int64), 0, ARITH_NY - 1)
    return ty * ARITH_NX + tx


def arith_tile_sql(lon_expr: str, lat_expr: str) -> str:
    tx = (f"LEAST(GREATEST(CAST(floor(({lon_expr} - {AOI_W!r}) / {ARITH_STEP!r}) "
          f"AS BIGINT), 0), {ARITH_NX - 1})")
    ty = (f"LEAST(GREATEST(CAST(floor(({lat_expr} - {AOI_S!r}) / {ARITH_STEP!r}) "
          f"AS BIGINT), 0), {ARITH_NY - 1})")
    return f"({ty} * {ARITH_NX} + {tx})"

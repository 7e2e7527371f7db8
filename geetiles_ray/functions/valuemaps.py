"""Array value transforms — reference semantics reproduced exactly:

- apply_value_map (utils.py:273-318): relabel int arrays via dict/list map,
  implicit 0 handling, init value rules.
- apply_range_map (utils.py:320-352): bucketize floats into n+1 classes,
  monotonicity validation.
- binary_mask (utils.py:199-230): geometry → 0/1 mask at raster shape:
  normalize coords to [0,1] over ALL polygon coords, flip y, scale to
  (W, H), rasterize (pixel center containment — rasterio default).
"""

from __future__ import annotations

import numpy as np

from . import geom


def apply_value_map(array: np.ndarray, value_map) -> np.ndarray:
    if isinstance(value_map, list):
        if not all(isinstance(i, int) for i in value_map):
            raise ValueError("all mapped values must be int")
        value_map = sorted(value_map)
        if 0 not in value_map:
            value_map = [0] + value_map
        value_map = {i: value_map[i] for i in range(len(value_map))}
    elif isinstance(value_map, dict):
        if not all(isinstance(i, int) for i in value_map.keys()):
            raise ValueError("all keys in map dict must be int")
        if not all(isinstance(i, int) for i in value_map.values()):
            raise ValueError("all values in map dict must be int")
        if 0 not in value_map.keys() and 0 not in value_map.values():
            value_map[0] = 0

    if 0 in value_map.keys() and value_map[0] == 0:
        init_val = 0
    else:
        init_val = list(value_map.keys())[0]

    r = np.ones_like(array) * init_val
    for k, v in value_map.items():
        if v == init_val:
            continue
        r[array == k] = v
    return r


def apply_range_map(array: np.ndarray, range_map) -> np.ndarray:
    range_map = np.r_[range_map]
    if len(range_map.shape) != 1:
        raise ValueError("range_map must have one dimension")
    try:
        range_map = range_map.astype(float)
    except Exception:
        raise ValueError("range_map must be a list of floats")
    if not np.all(range_map[1:] - range_map[:-1] > 0):
        raise ValueError("range_map must be a list or ordered floats with no repetitions")
    r = np.zeros_like(array)
    for i in range(0, len(range_map)):
        if i == len(range_map) - 1:
            r[array >= range_map[i]] = i + 1
        else:
            r[(array >= range_map[i]) & (array < range_map[i + 1])] = i + 1
    return r


def binary_mask(ring: np.ndarray, raster_shape) -> np.ndarray:
    """Reference get_binary_mask: normalize ring coords to [0,1] (min/max
    over all coords), flip y, scale x by W and y by H, then rasterize with
    pixel-center containment (rasterio.features.rasterize default)."""
    h, w = raster_shape[:2]
    c = np.asarray(ring, dtype=np.float64)
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    rng = cmax - cmin
    rng[rng == 0] = 1.0
    p = (c - cmin) / rng
    p[:, 1] = 1 - p[:, 1]
    p = p * np.r_[w, h]
    # pixel centers
    xs = np.arange(w) + 0.5
    ys = np.arange(h) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    inside = geom.points_in_ring(gx.ravel(), gy.ravel(), p)
    return inside.reshape(h, w).astype(np.uint8)

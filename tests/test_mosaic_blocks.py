"""Block-grid mosaic (S11 scale path), mosaic.fromvals, cleanup.

Pixel-identity contract: the distributed block path must reproduce the
driver-loop mosaic bit-for-bit (same placement arithmetic, per-block
identifier-order overwrite == global identifier-order overwrite because
the rule is per-pixel)."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geetiles_ray.functions import geom, tiff
from geetiles_ray.pipelines import grid
from geetiles_ray.stages import raster


@pytest.fixture(scope="module")
def tiles(aoi_ring):
    return grid.build_grid(aoi_ring, 5000.0).materialize()


@pytest.fixture(scope="module")
def rasters(tiles):
    return raster.render_tiles(tiles, "worldcoverlike", pixels_hw=(50, 50),
                               concurrency=2).materialize()


def _boxes_tileset(boxes):
    from geetiles_ray.sources.tileset import tile_batch_from_rings

    rings = [geom.box_ring(*b) for b in boxes]
    return tile_batch_from_rings(rings, np.arange(len(rings)), 31, True, 8)


class TestMosaicBlocks:
    def test_pixel_identical_to_driver(self, rasters, tiles):
        canvas, bounds = raster.mosaic(rasters, tiles)
        blocks, frame = raster.mosaic_blocks(rasters, tiles, block_px=64)
        got, gbounds = raster.assemble_blocks(blocks, frame, block_px=64)
        assert gbounds == bounds
        assert got.shape == canvas.shape
        assert (got == canvas).all()
        # the canvas really spans multiple blocks (the test would be
        # vacuous on a single-block canvas)
        assert blocks.count() > 4

    def test_channels_subset(self, rasters, tiles):
        canvas, _ = raster.mosaic(rasters, tiles, channels=[0])
        blocks, frame = raster.mosaic_blocks(rasters, tiles, channels=[0],
                                             block_px=100)
        got, _ = raster.assemble_blocks(blocks, frame, block_px=100)
        assert got.shape[2] == 1
        assert (got == canvas).all()

    def test_write_blockgrid_resume_and_roundtrip(self, rasters, tiles,
                                                  tmp_path):
        blocks, frame = raster.mosaic_blocks(rasters, tiles, block_px=64)
        blocks = blocks.materialize()
        d = str(tmp_path / "blocks")
        n = raster.write_blockgrid(blocks, frame, d, block_px=64)
        assert n == blocks.count()
        # resume: second write skips every finished block
        assert raster.write_blockgrid(blocks, frame, d, block_px=64) == 0
        # a block tif round-trips to the assembled canvas slice, and its
        # bounds sit on the frame's pixel grid
        canvas, _ = raster.assemble_blocks(blocks, frame, block_px=64)
        name = sorted(p for p in os.listdir(d) if p.endswith(".tif"))[0]
        by, bx = (int(s) for s in name[:-4].split("_"))
        arr, tb, _names = tiff.read_tiff(os.path.join(d, name))
        sl = canvas[by * 64:by * 64 + arr.shape[0],
                    bx * 64:bx * 64 + arr.shape[1]]
        assert (arr == sl).all()
        assert tb[0] == pytest.approx(frame["minx"] + bx * 64 / frame["ppd"])

    def test_fromvals_matches_brute_force(self):
        tbl = _boxes_tileset([(0.0, 0.0, 1.0, 1.0), (0.8, 0.0, 1.8, 1.0),
                              (0.0, 0.9, 1.0, 1.9), (1.2, 1.2, 1.8, 1.9)])
        vals = [3.0, 5.0, 0.0, 7.0]  # the 0.0 tile must contribute nothing
        tbl = tbl.append_column("value", pa.array(vals, type=pa.float64()))
        tiles = ray.data.from_arrow(tbl)
        ppd = 40.0
        blocks, frame = raster.mosaic_fromvals(tiles, ppd, block_px=16)
        got, _ = raster.assemble_blocks(blocks, frame, block_px=16)

        # independent brute force: same placement formula written out,
        # tiles applied in identifier-sorted order, zero never overwrites
        df = tiles.to_pandas().sort_values("identifier")
        H, W = frame["H"], frame["W"]
        want = np.zeros((H, W, 1), dtype="float32")
        for _, r in df.iterrows():
            if r.value == 0:
                continue
            x0 = int(round((r.minx - frame["minx"]) * ppd))
            y0 = int(round((frame["maxy"] - r.maxy) * ppd))
            th = int(round((r.maxy - r.miny) * ppd)) or 1
            tw = int(round((r.maxx - r.minx) * ppd)) or 1
            want[max(y0, 0):min(y0 + th, H),
                 max(x0, 0):min(x0 + tw, W), 0] = r.value
        assert got.shape == want.shape
        assert (got == want).all()
        assert (got != 0).any()

    def test_fromvals_is_distributed_blocks(self):
        # patches stay (rect, value) rows; block count covers the canvas
        tbl = _boxes_tileset([(0.0, 0.0, 2.0, 2.0)])
        tbl = tbl.append_column("value", pa.array([9.0]))
        blocks, frame = raster.mosaic_fromvals(
            ray.data.from_arrow(tbl), 32.0, block_px=16)
        assert blocks.count() == 16  # 64x64 canvas / 16px blocks


class TestCleanup:
    def test_cleanup_removes_unreadable(self, rasters, tiles, tmp_path):
        d = str(tmp_path)
        raster.write_geotiff_layout(rasters, tiles, d, "wc")
        wc = os.path.join(d, "wc")
        tifs = sorted(os.listdir(wc))
        bad = os.path.join(wc, tifs[0])
        with open(bad, "wb") as f:
            f.write(b"not a tiff at all")
        removed = raster.cleanup_geotiff_dir(wc, dry_run=True)
        assert removed == [tifs[0]]
        assert os.path.exists(bad)  # dry run never deletes
        removed = raster.cleanup_geotiff_dir(wc)
        assert removed == [tifs[0]]
        assert not os.path.exists(bad)
        assert raster.cleanup_geotiff_dir(wc) == []

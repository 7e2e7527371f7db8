"""S4: minimal shapefile reader/writer round-trip + CRS policy."""

import numpy as np
import pytest

from geetiles_ray.functions import geom
from geetiles_ray.sources import shapefile as shp


@pytest.fixture()
def rings():
    return [
        geom.box_ring(5.9, 49.5, 6.1, 49.7),
        geom.box_ring(6.2, 49.8, 6.4, 50.0),
        np.array([[6.0, 49.9], [6.3, 49.9], [6.15, 50.1], [6.0, 49.9]]),
    ]


class TestShapefile:
    def test_roundtrip(self, rings, tmp_path):
        p = str(tmp_path / "foreign.shp")
        shp.write_shapefile(rings, p, attrs={"name": ["a", "b", "c"],
                                             "code": ["1", "2", "3"]})
        back = shp.read_shp_rings(p)
        assert len(back) == 3
        for want, got in zip(rings, back):
            np.testing.assert_allclose(got, want)

    def test_dataset_with_attrs(self, rings, tmp_path):
        p = str(tmp_path / "foreign.shp")
        shp.write_shapefile(rings, p, attrs={"name": ["a", "b", "c"]})
        ds = shp.read_shapefile(p)
        df = ds.to_pandas()
        assert list(df["name"]) == ["a", "b", "c"]
        assert df.minx.iloc[0] == pytest.approx(5.9)
        r0 = geom.wkb_to_ring(df.wkb.iloc[0])
        np.testing.assert_allclose(r0, rings[0])

    def test_rejects_missing_or_wrong_prj(self, rings, tmp_path):
        p = str(tmp_path / "f.shp")
        shp.write_shapefile(rings, p)
        import os
        os.remove(str(tmp_path / "f.prj"))
        with pytest.raises(ValueError, match="prj"):
            shp.read_shapefile(p)
        with open(str(tmp_path / "f.prj"), "w") as f:
            f.write('PROJCS["WGS 84 / UTM zone 31N",AUTHORITY["EPSG","32631"]]')
        with pytest.raises(ValueError, match="not EPSG:4326"):
            shp.read_shapefile(p)

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "x.shp"
        p.write_bytes(b"\x00" * 200)
        with pytest.raises(ValueError, match="magic"):
            shp.read_shp_rings(str(p))

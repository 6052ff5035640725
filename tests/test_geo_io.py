"""Shapefile round-trips, reprojection/mosaic math, display recipes."""

import numpy as np
import pytest

from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.display import contrast_stretch, overlay_prediction, tif_image
from beach_seg_tpu.geo.geometry import LineString, MultiLineString, Polygon
from beach_seg_tpu.geo.mosaic import merge_tifs, reproject
from beach_seg_tpu.geo.rasterize import rasterize
from beach_seg_tpu.geo.shapefile import read_shapefile, save_shapefile
from beach_seg_tpu.geo.tiff import write


# -------------------------------------------------------------- shapefile


def test_shapefile_polygon_round_trip(tmp_path):
    poly = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)], [[(3, 3), (3, 7), (7, 7), (7, 3)]])
    fp = tmp_path / "Mask_20230301.shp"
    save_shapefile([poly], fp, crs="EPSG:32611")
    geoms, crs = read_shapefile(fp)
    assert crs == "EPSG:32611"
    assert len(geoms) == 1
    g = geoms[0]
    assert g.geom_type == "Polygon"
    assert len(g.holes) == 1
    # rasterization must agree before/after the round trip
    m1 = rasterize([poly], (12, 12))
    m2 = rasterize([g], (12, 12))
    assert np.array_equal(m1, m2)
    assert (tmp_path / "Mask_20230301.shx").exists()
    assert (tmp_path / "Mask_20230301.dbf").exists()
    assert (tmp_path / "Mask_20230301.prj").exists()


def test_shapefile_polyline_round_trip(tmp_path):
    line = LineString([(0.5, 1.5), (10.25, 2.5), (20.0, 30.0)])
    fp = tmp_path / "line.shp"
    save_shapefile(line, fp, crs=32611)
    geoms, _ = read_shapefile(fp)
    assert len(geoms) == 1
    assert np.allclose(geoms[0].coords, line.coords)

    ml = MultiLineString([line, LineString([(100, 100), (101, 101)])])
    fp2 = tmp_path / "ml.shp"
    save_shapefile(ml, fp2, crs=32611)
    geoms2, _ = read_shapefile(fp2)
    assert geoms2[0].geom_type == "MultiLineString"
    assert len(geoms2[0].geoms) == 2


# -------------------------------------------------------------- reproject


def test_reproject_identity_exact():
    rng = np.random.default_rng(0)
    src = rng.random((2, 16, 20)).astype(np.float32)
    t = Affine.from_origin(100.0, 200.0, 3.0, 3.0)
    out = reproject(src, t, (16, 20), t, "cubic")
    assert np.allclose(out, src, atol=1e-5)


def test_reproject_integer_offset():
    src = np.arange(100, dtype=np.float32).reshape(1, 10, 10)
    src_t = Affine.from_origin(0.0, 30.0, 3.0, 3.0)
    dst_t = Affine.from_origin(-6.0, 36.0, 3.0, 3.0)  # 2 px left, 2 px up
    out = reproject(src, src_t, (14, 14), dst_t, "cubic", fill=-1)
    assert np.allclose(out[0, 2:12, 2:12], src[0], atol=1e-4)
    assert (out[0, :2] == -1).all() and (out[0, :, :2] == -1).all()
    near = reproject(src, src_t, (14, 14), dst_t, "nearest", fill=0)
    assert np.array_equal(near[0, 2:12, 2:12], src[0])


def test_merge_tifs_weighted_mean(tmp_path):
    # two 4-band uint16 images on offset grids, constant values 1000 / 3000
    t1 = Affine.from_origin(0.0, 30.0, 3.0, 3.0)
    t2 = Affine.from_origin(15.0, 30.0, 3.0, 3.0)  # 5 px to the right
    a = np.full((4, 10, 10), 1000, np.uint16)
    b = np.full((4, 10, 10), 3000, np.uint16)
    write(tmp_path / "20240101_a.tif", a, t1, crs=32611, nodata=0)
    write(tmp_path / "20240101_b.tif", b, t2, crs=32611, nodata=0)
    out_t = Affine.from_origin(0.0, 30.0, 3.0, 3.0)
    img, nodata = merge_tifs(
        [tmp_path / "20240101_a.tif", tmp_path / "20240101_b.tif"], (10, 15), out_t, "EPSG:32611"
    )
    assert img.shape == (10, 15, 3) and img.dtype == np.uint8
    assert nodata.shape == (10, 15)
    assert not nodata[:, :15].any()  # full horizontal coverage
    # display conversion is relative; check the overlap region is brighter than
    # the a-only region (mean 2000 vs 1000) and the b-only region brightest
    assert img[5, 2].mean() < img[5, 7].mean() <= img[5, 12].mean() + 1


def test_tif_image_4band_recipe():
    rng = np.random.default_rng(1)
    data = rng.integers(500, 4000, (4, 8, 8)).astype(np.float32)
    nodata = np.zeros((8, 8), bool)
    nodata[0, 0] = True
    img = tif_image(data, nodata)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert (img[0, 0] == 0).all()  # nodata zeroed
    assert img.max() == 255  # per-channel max-normalized


def test_contrast_stretch_and_overlay():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1000, (16, 16)).astype(np.float32)
    s = contrast_stretch(x)
    assert s.min() >= 0 and s.max() <= 1
    img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    pred = rng.integers(0, 4, (8, 8))
    out = overlay_prediction(img, pred, ("nodata", "sand", "water", "veg"))
    assert out.size == (8, 8)


def test_reproject_fast_path_matches_dense():
    """Scale-1 constant-stencil path ≡ the dense sampling-matrix formulation."""
    import numpy as np

    from beach_seg_tpu.geo.mosaic import affine_sample_matrix
    from beach_seg_tpu.geo import mosaic

    rng = np.random.default_rng(3)
    src = rng.random((2, 30, 40)).astype(np.float32)
    src_t = Affine.from_origin(0.0, 90.0, 3.0, 3.0)
    for dx, dy in [(0.0, 0.0), (5.0, -3.0), (2.7, -1.3), (-4.4, 6.9)]:
        dst_t = Affine.from_origin(dx * 3, 90.0 - dy * 3, 3.0, 3.0)
        for method in ("cubic", "nearest"):
            wx, vx = affine_sample_matrix(40, 44, dx, 1.0, method)
            wy, vy = affine_sample_matrix(30, 33, dy, 1.0, method)
            dense = np.einsum("oh,chw,pw->cop", wy, src, wx, optimize=True)
            dense[:, ~(vy[:, None] & vx[None, :])] = -7
            fast = mosaic.reproject(src, src_t, (33, 44), dst_t, method, fill=-7)
            assert np.abs(dense - fast.astype(np.float64)).max() < 1e-4, (dx, dy, method)

"""Geo layer: native TIFF codec, affine, geometry, rasterize, contours, masks
(SURVEY.md §4.1 — unit tests on synthetic scenes)."""

import numpy as np
import pytest

from beach_seg_tpu.geo.affine import Affine, bounds
from beach_seg_tpu.geo.contours import extract_linestring, find_contours
from beach_seg_tpu.geo.extent import compute_raster_extent, group_images_by_date, infer_date
from beach_seg_tpu.geo.geometry import (
    LineString,
    MultiLineString,
    Polygon,
    generate_square_crops_along_line,
    linemerge,
)
from beach_seg_tpu.geo.masks import crop_tif, merged_no_data_mask, padded_crop, safe_assign_crop
from beach_seg_tpu.geo.rasterize import rasterize
from beach_seg_tpu.geo.tiff import read, write


# ----------------------------------------------------------------- affine


def test_affine_roundtrip():
    t = Affine.from_origin(500000.0, 4100000.0, 3.0, 3.0)
    x, y = t.apply(10, 20)
    assert (x, y) == (500030.0, 4099940.0)
    inv = ~t
    c, r = inv.apply(x, y)
    assert (round(c), round(r)) == (10, 20)
    assert t.rowcol(x + 1.0, y - 1.0) == (20, 10)


def test_affine_bounds():
    t = Affine.from_origin(0.0, 100.0, 2.0, 2.0)
    assert bounds(t, (10, 20)) == (0.0, 80.0, 40.0, 100.0)


def test_affine_mul_point():
    """affine-package idiom: ``transform * (col, row)`` transforms a point,
    ``~transform * (x, y)`` inverts one (used by the notebooks to reload
    exported shapefile lines into pixel space)."""
    t = Affine.from_origin(500000.0, 4100000.0, 3.0, 3.0)
    assert t * (10, 20) == t.apply(10, 20)
    x, y = t * (10, 20)
    c, r = ~t * (x, y)
    assert (round(c), round(r)) == (10, 20)
    # composition with another Affine still works
    assert isinstance(t * Affine.identity(), Affine)
    assert (t * Affine.identity()).to_tuple() == t.to_tuple()


def test_tif_image_uint16():
    """tif_image must render integer (uint16 Dove) rasters — the reference's
    in-place normalize crashes on them (geo_util.py:464)."""
    from beach_seg_tpu.geo.display import tif_image

    rng = np.random.default_rng(0)
    data = rng.integers(100, 5000, (4, 16, 16)).astype(np.uint16)
    nodata = np.zeros((16, 16), bool)
    nodata[:2] = True
    img = tif_image(data, nodata)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert img[nodata].max() == 0 and img[~nodata].max() > 0
    # float input (the reference's working path): near-identical — integer
    # input truncates the B=mean(b1,b2) channel into the uint16 buffer (the
    # reference's own dtype semantics), so allow ±2 display counts
    imgf = tif_image(data.astype(np.float64), nodata)
    assert np.abs(img.astype(int) - imgf.astype(int)).max() <= 2


# --------------------------------------------------------------- geometry


def test_linestring_length_interpolate():
    ln = LineString([(0, 0), (3, 0), (3, 4)])
    assert ln.length == 7.0
    assert ln.interpolate(0) == (0.0, 0.0)
    assert ln.interpolate(3) == (3.0, 0.0)
    assert ln.interpolate(5) == (3.0, 2.0)
    assert ln.interpolate(100) == (3.0, 4.0)  # clamped


def test_multilinestring_interpolate_across_parts():
    ml = MultiLineString([LineString([(0, 0), (2, 0)]), LineString([(10, 0), (10, 2)])])
    assert ml.length == 4.0
    assert ml.interpolate(1) == (1.0, 0.0)
    assert ml.interpolate(3) == (10.0, 1.0)


def test_linemerge_chains_and_branch():
    segs = [
        LineString([(0, 0), (1, 0)]),
        LineString([(1, 0), (2, 0)]),
        LineString([(2, 0), (3, 0)]),
        LineString([(10, 0), (11, 0)]),
    ]
    out = linemerge(segs)
    assert isinstance(out, MultiLineString)
    lens = sorted(g.length for g in out.geoms)
    assert lens == [1.0, 3.0]
    # branching node must break the chain
    segs += [LineString([(2, 0), (2, 1)])]
    out2 = linemerge(segs)
    assert isinstance(out2, MultiLineString)
    assert len(out2.geoms) >= 3


def test_generate_square_crops_zero_overlap():
    line = LineString([(0, 50), (300, 50)])
    boxes = generate_square_crops_along_line(line, 100, 0)
    # steps at 0,100,200,300 → 4 boxes, each 100x100 centered on the line
    assert len(boxes) == 4
    assert boxes[0] == (-50, 0, 50, 100)
    assert boxes[1] == (50, 0, 150, 100)
    assert all(b[2] - b[0] == 100 and b[3] - b[1] == 100 for b in boxes)
    with pytest.raises(ValueError):
        generate_square_crops_along_line(line, 100, 100)


# -------------------------------------------------------------- rasterize


def test_rasterize_square_center_rule():
    # square covering pixel centers (cols 2..5, rows 1..3) in pixel space
    poly = Polygon([(2, 1), (6, 1), (6, 4), (2, 4)])
    m = rasterize([poly], (6, 8))
    expect = np.zeros((6, 8), np.uint8)
    expect[1:4, 2:6] = 1
    assert np.array_equal(m, expect)


def test_rasterize_hole_and_union():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(3, 3), (7, 3), (7, 7), (3, 7)]
    m = rasterize([Polygon(outer, [hole])], (10, 10))
    assert m[5, 5] == 0 and m[1, 1] == 1
    m2 = rasterize([Polygon(outer, [hole]), Polygon([(4, 4), (6, 4), (6, 6), (4, 6)])], (10, 10))
    assert m2[5, 5] == 1


def test_rasterize_world_transform():
    t = Affine.from_origin(100.0, 200.0, 2.0, 2.0)
    # world square [104,110)x(192,198] → pixel cols 2..4, rows 1..3
    poly = Polygon([(104, 198), (110, 198), (110, 192), (104, 192)])
    m = rasterize([poly], (5, 6), t)
    expect = np.zeros((5, 6), np.uint8)
    expect[1:4, 2:5] = 1
    assert np.array_equal(m, expect)


# --------------------------------------------------------------- contours


def test_find_contours_closed_square():
    m = np.zeros((8, 8))
    m[2:6, 2:6] = 1.0
    cs = find_contours(m, 0.5)
    assert len(cs) == 1
    c = cs[0]
    # closed loop around the square, points at 1.5/5.5 boundaries
    assert np.allclose(c[0], c[-1])
    assert c[:, 0].min() == pytest.approx(1.5)
    assert c[:, 0].max() == pytest.approx(5.5)
    # total perimeter of the contour ≈ 4 * 4
    assert LineString(c).length == pytest.approx(16.0, rel=0.1)


def test_extract_linestring_horizontal_boundary():
    # water fills the bottom half → boundary line along row 4.5
    mask = np.zeros((10, 12), bool)
    mask[5:] = True
    nodata = np.zeros((10, 12), bool)
    line = extract_linestring(mask, nodata)
    assert line is not None
    xs = np.asarray([line.interpolate(d) for d in np.linspace(0, line.length, 5)])
    assert np.allclose(xs[:, 1], 4.5)  # y constant at the iso-line


def test_extract_linestring_skips_nodata():
    mask = np.zeros((10, 20), bool)
    mask[5:] = True
    nodata = np.zeros((10, 20), bool)
    nodata[:, 8:12] = True  # hole in the middle splits the line
    line = extract_linestring(mask, nodata, length_threshold=0.0)
    assert line is not None
    assert line.geom_type == "MultiLineString"
    for g in line.geoms:
        for x, y in g.coords:
            assert not (7.6 <= x <= 12.4)


# ------------------------------------------------------------------ masks


def test_merged_no_data_mask_matches_reference_loop():
    rng = np.random.default_rng(0)
    h, w = 40, 60
    water = np.zeros((h, w), bool)
    veg = np.zeros((h, w), bool)
    # random row spans; include rows with only one or neither mask
    for r in range(h):
        kind = rng.integers(0, 4)
        if kind >= 1:
            a = rng.integers(0, w // 2)
            water[r, a : a + rng.integers(1, 10)] = True
        if kind >= 2:
            b = rng.integers(w // 2, w - 5)
            veg[r, b : b + rng.integers(1, 5)] = True
        if kind == 3:  # overlapping / veg left of water
            veg[r, : rng.integers(1, 6)] = True

    def reference(water_mask, veg_mask):
        hh, ww = veg_mask.shape
        out = np.zeros((hh, ww), np.bool_)
        for row in range(hh):
            wr = np.where(water_mask[row])[0]
            vr = np.where(veg_mask[row])[0]
            if not len(wr) and not len(vr):
                continue
            elif not len(wr):
                out[row, : vr[0]] = True
                out[row, vr[-1] + 1 :] = True
            elif not len(vr):
                out[row, : wr[0]] = True
                out[row, wr[-1] + 1 :] = True
            else:
                if vr[0] >= wr[-1]:
                    out[row, : wr[0]] = True
                    out[row, vr[-1] + 1 :] = True
                else:
                    out[row, : vr[0]] = True
                    out[row, wr[-1] + 1 :] = True
        return out

    assert np.array_equal(merged_no_data_mask(water, veg), reference(water, veg))


def test_padded_crop_and_crop_tif():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    out = padded_crop(img, -2, -2, 3, 3, 5, value=7)
    assert out.shape == (5, 5)
    assert out[0, 0] == 7 and out[2, 2] == img[0, 0] and out[4, 4] == img[2, 2]
    img3 = np.stack([img] * 3, axis=-1)
    nodata = np.zeros((10, 10), np.uint8)
    ci, cn, cl = crop_tif((8, 8, 13, 13), img3, nodata, img, 5)
    assert ci.shape == (5, 5, 3) and cn.shape == (5, 5)
    assert cn[0, 0] == 0 and cn[4, 4] == 1  # out-of-bounds nodata filled 1
    assert cl[0, 0] == img[8, 8]


def test_safe_assign_crop():
    out = np.zeros((5, 5), np.uint8)
    crop = np.full((3, 3), 2, np.uint8)
    safe_assign_crop(out, crop, -1, 2, -1, 2, logic="or")
    assert out[0, 0] == 2 and out[2, 2] == 0
    out2 = np.full((5, 5), 3, np.uint8)
    safe_assign_crop(out2, crop, 0, 3, 0, 3, logic="ascending")
    assert (out2 == 3).all()  # max-merge keeps larger


# ------------------------------------------------------- tiff/extent


def test_tiff_roundtrip_dtypes(tmp_path):
    t = Affine.from_origin(500000.0, 4100000.0, 3.0, 3.0)
    rng = np.random.default_rng(1)
    for dtype, c, comp in [("uint8", 3, "lzw"), ("uint16", 8, "deflate"), ("float32", 4, "lzw"), ("int16", 1, None)]:
        if dtype == "float32":
            data = rng.random((c, 21, 33)).astype(dtype)
        else:
            data = rng.integers(0, 200, (c, 21, 33)).astype(dtype)
        p = tmp_path / f"x_{dtype}_{c}.tif"
        write(p, data, t, crs="EPSG:32611", nodata=0, compress=comp)
        r = read(p)
        assert np.array_equal(r.data, data)
        assert r.crs == "EPSG:32611" and r.nodata == 0
        assert r.transform == t


def test_tiff_valid_mask(tmp_path):
    data = np.ones((1, 4, 4), np.uint8)
    data[0, 0, 0] = 0
    p = tmp_path / "m.tif"
    write(p, data, Affine.identity(), crs=32611, nodata=0)
    r = read(p)
    vm = r.valid_mask()
    assert vm[0, 0] == 0 and vm[1, 1] == 255


def test_compute_raster_extent_union(tmp_path):
    t1 = Affine.from_origin(100.0, 200.0, 2.0, 2.0)
    t2 = Affine.from_origin(110.0, 190.0, 2.0, 2.0)
    write(tmp_path / "20240101_a.tif", np.zeros((1, 10, 10), np.uint8), t1, crs=32611)
    write(tmp_path / "20240101_b.tif", np.zeros((1, 10, 10), np.uint8), t2, crs=32611)
    tf, shape, crs = compute_raster_extent([tmp_path / "20240101_a.tif", tmp_path / "20240101_b.tif"])
    # union: x [100, 130], y [170, 200] at 2m → 15 x 15 px
    assert (tf.c, tf.f) == (100.0, 200.0)
    assert shape == (15, 15)
    assert crs == "EPSG:32611"


def test_date_discovery(tmp_path):
    for n in ["20240101_x.tif", "20240101_y.tif", "20240202_z.tif"]:
        write(tmp_path / n, np.zeros((1, 2, 2), np.uint8), Affine.identity())
    groups = group_images_by_date(sorted(tmp_path.glob("*.tif")))
    assert sorted(groups) == ["20240101", "20240202"]
    assert len(groups["20240101"]) == 2
    assert infer_date([tmp_path / "Mask_20230301.shp", tmp_path / "WaterMask_20230301.shp"]) == "20230301"
    with pytest.raises(ValueError):
        infer_date([tmp_path / "Mask_20230301.shp", tmp_path / "Mask_20230302.shp"])

"""SuperDove 8-band path: broad_band display recipe through merge_tifs."""

import numpy as np

from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.display import broad_band, false_color_log, rgb_log_image, tristimulus
from beach_seg_tpu.geo.mosaic import merge_tifs
from beach_seg_tpu.geo.tiff import write


def test_merge_tifs_8band(tmp_path):
    rng = np.random.default_rng(0)
    t = Affine.from_origin(0.0, 60.0, 3.0, 3.0)
    data = rng.integers(100, 4000, (8, 20, 20)).astype(np.uint16)
    write(tmp_path / "20240101_sd.tif", data, t, crs=32611, nodata=0)
    img, nodata = merge_tifs([tmp_path / "20240101_sd.tif"], (20, 20), t, "EPSG:32611")
    assert img.shape == (20, 20, 3) and img.dtype == np.uint8
    assert not nodata.any()
    assert img.max() == 255  # broad_band max-normalizes


def test_8band_recipes_shapes():
    rng = np.random.default_rng(1)
    bands = rng.uniform(100, 4000, (8, 12, 12)).astype(np.float32)
    nodata = np.zeros((12, 12), bool)
    nodata[0, 0] = True
    for fn in (broad_band, tristimulus, rgb_log_image, false_color_log):
        out = fn(bands, nodata)
        assert out.shape == (12, 12, 3)
        assert np.isfinite(out).all()
        assert (out[0, 0] == 0).all()  # nodata zeroed
        assert out.max() <= 1.0 + 1e-6


def test_false_color_4band():
    rng = np.random.default_rng(2)
    bands = rng.uniform(100, 4000, (4, 10, 10)).astype(np.float32)
    nodata = np.zeros((10, 10), bool)
    out = false_color_log(bands, nodata)
    assert out.shape == (10, 10, 3)

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


def test_superdove_scene_end_to_end(tmp_path_factory):
    """8-band SuperDove scene through geo setup + zero-shot inference
    (BASELINE.json config #5: multi-class segmentation on 8-band imagery)."""
    from beach_seg_tpu.config import PredConfig
    from beach_seg_tpu.data.dataset import create_scene
    from beach_seg_tpu.geo.tiff import read
    from beach_seg_tpu.infer.zero_shot import run_zero_shot
    from tests.synthetic_scene import H, MASK_DATE, OTHER_DATES, W, build_scene_8band

    scene_dir = build_scene_8band(tmp_path_factory.mktemp("sd"))
    out_root = tmp_path_factory.mktemp("sd_out")
    conf = PredConfig(
        data=scene_dir, model_training_root=out_root, prediction_root=out_root,
        zero_shot_crop_size=48, n_prompts=2, batch_size=2, debug=True,
        checkpoint="random", mesh_data=1, mesh_model=1,
    )
    # geo setup consumes 8 bands → broad_band display RGB
    scene = create_scene(conf, train=True)
    img, nodata = scene.date_merged_imgs[MASK_DATE]
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    out_dir = run_zero_shot(conf)
    r = read(out_dir / "tif" / f"{OTHER_DATES[0]}.tif")
    assert set(np.unique(r.data)) <= {0, 1, 2, 3}

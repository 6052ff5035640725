"""Dataset layer on a synthetic mini-scene: geo orchestration, crop tensors,
prompt materialization, batch iteration (SURVEY.md §4.3)."""

import numpy as np
import pytest

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.data.dataset import (
    BeachSegDataset,
    create_scene,
    get_crop_arrays,
    iterate_batches,
    materialize_prompts,
)
from tests.synthetic_scene import H, MASK_DATE, OTHER_DATES, VEG_END_ROW, W, WATER_START_ROW, build_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return build_scene(tmp_path_factory.mktemp("scene"))


@pytest.fixture(scope="module")
def conf(scene_dir):
    return BeachSegConfig(data=scene_dir, crop_size=32, inpt_size=64, batch_size=4)


@pytest.fixture(scope="module")
def train_scene(conf):
    return create_scene(conf, train=True)


def test_create_scene_train(train_scene, conf):
    assert train_scene.mask_date == MASK_DATE
    assert train_scene.out_shape == (H, W)
    assert train_scene.crs == "EPSG:32611"
    assert list(train_scene.date_merged_imgs) == [MASK_DATE]
    img, nodata = train_scene.date_merged_imgs[MASK_DATE]
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    assert not nodata.all()
    # merged label raster: veg on top, water at bottom, sand between
    m = train_scene.date_masks[MASK_DATE]
    assert m[5, W // 2] == conf.classes.index("veg")
    assert m[H - 5, W // 2] == conf.classes.index("water")
    assert m[(VEG_END_ROW + WATER_START_ROW) // 2, W // 2] == conf.classes.index("sand")
    # crops follow the shoreline: centers near the water boundary row
    assert len(train_scene.crops) >= 3
    for xmin, ymin, xmax, ymax in train_scene.crops:
        assert xmax - xmin == conf.crop_size and ymax - ymin == conf.crop_size
        cy = (ymin + ymax) / 2
        assert abs(cy - WATER_START_ROW) < conf.crop_size


def test_create_scene_predict(conf):
    scene = create_scene(conf, train=False)
    assert sorted(scene.date_merged_imgs) == sorted(OTHER_DATES)
    assert scene.mask_date == MASK_DATE  # labels still keyed to ref date


def test_get_crop_arrays(train_scene, conf):
    it = get_crop_arrays(train_scene, MASK_DATE, 0, conf)
    assert it["image"].shape == (64, 64, 3) and it["image"].dtype == np.float32
    assert 0.0 <= it["image"].min() and it["image"].max() <= 1.0
    assert it["mask"].shape == (64, 64) and it["mask"].dtype == np.int32
    assert it["nodata"].shape == (64, 64) and it["nodata"].dtype == bool
    # labeled date → mask has real classes, not the stand-in hack
    assert set(np.unique(it["mask"])) <= {0, 1, 2, 3}


def test_unlabeled_crop_hack(conf):
    scene = create_scene(conf, train=False)
    date = OTHER_DATES[0]
    it = get_crop_arrays(scene, date, 0, conf)
    # no labels for this date → data pixels become class 1 (ref data.py:114-116)
    vals = set(np.unique(it["mask"]))
    assert vals <= {0, 1}
    assert (it["mask"][~it["nodata"]] == 1).all()


def test_materialize_prompts(train_scene, conf):
    prompts = materialize_prompts(train_scene, conf)
    p = len(train_scene.crops)
    assert prompts["pixels"].shape == (p, 64, 64, 3)
    assert prompts["masks"].shape == (p, 64, 64)
    assert prompts["nodata"].shape == (p, 64, 64)
    assert np.array_equal(prompts["crop_idx"], np.arange(p))


def test_dataset_and_batches(train_scene, conf):
    ds = BeachSegDataset(train_scene, conf)
    assert len(ds) == len(train_scene.crops)  # one date × crops
    assert 0.0 <= ds.items[0]["pct_nodata"] <= 1.0
    batches = list(iterate_batches(ds, 4, shuffle=True, seed=1))
    assert all(b["image"].shape == (4, 64, 64, 3) for b in batches)
    n_valid = sum(int(b["valid"].sum()) for b in batches)
    assert n_valid == len(ds)
    # shuffling is deterministic per seed
    b2 = list(iterate_batches(ds, 4, shuffle=True, seed=1))
    assert np.array_equal(batches[0]["crop_idx"], b2[0]["crop_idx"])


def test_threaded_batches_match_serial(train_scene, conf):
    """workers>0 (thread-pool crop assembly) is bit-identical to serial."""
    ds = BeachSegDataset(train_scene, conf)
    serial = list(iterate_batches(ds, 3, shuffle=True, seed=7))
    threaded = list(iterate_batches(ds, 3, shuffle=True, seed=7, workers=4))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        assert a["date"] == b["date"]
        for k in ("image", "mask", "nodata", "crop_idx", "valid"):
            np.testing.assert_array_equal(a[k], b[k])


def test_drop_remainder(train_scene, conf):
    ds = BeachSegDataset(train_scene, conf)
    kept = list(iterate_batches(ds, 3, drop_remainder=True, workers=2))
    assert all(b["valid"].all() for b in kept)
    assert len(kept) == len(ds) // 3

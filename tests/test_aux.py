"""Aux subsystems: prefetching, profiling timer, compare harness, confix CLI."""

import json
import time

import numpy as np
import pytest

from beach_seg_tpu.cli.compare import compare_dirs
from beach_seg_tpu.config import BeachSegConfig, PredConfig
from beach_seg_tpu.data.prefetch import MosaicPrefetcher, prefetch_iterator
from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.tiff import write
from beach_seg_tpu.utils.confix import parse_cli, save_yaml, load_yaml
from beach_seg_tpu.utils.profiling import StepTimer


def test_prefetch_iterator_order_and_errors():
    assert list(prefetch_iterator(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_mosaic_prefetcher_overlaps():
    calls = []

    def merge(paths):
        calls.append(paths[0])
        time.sleep(0.01)
        return paths[0] * 2

    items = [(str(i), [i]) for i in range(5)]
    out = list(MosaicPrefetcher(items, merge, ahead=2, workers=2))
    assert out == [(str(i), i * 2) for i in range(5)]
    assert sorted(calls) == [0, 1, 2, 3, 4]


def test_step_timer():
    t = StepTimer(warmup=1)
    assert t.steps_per_sec is None
    for _ in range(3):
        t.tick()
    assert t.steps_per_sec is not None and t.steps_per_sec > 0


def test_compare_dirs(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    t = Affine.identity()
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 4, (20, 20)).astype(np.uint8)
    write(a / "20240101.tif", mask, t, crs=32611)
    write(b / "20240101.tif", mask, t, crs=32611)
    mask2 = mask.copy()
    mask2[0, 0] = (mask2[0, 0] + 1) % 4
    write(a / "20240202.tif", mask, t, crs=32611)
    write(b / "20240202.tif", mask2, t, crs=32611)
    out = compare_dirs(a, b)
    assert out["dates"]["20240101"]["mean_iou"] == 1.0
    assert out["dates"]["20240202"]["mean_iou"] < 1.0
    assert 0.99 < out["pixel_agreement"] < 1.0
    json.dumps(out)  # serializable


def test_cli_dotlist_parsing(tmp_path):
    conf = parse_cli(
        BeachSegConfig,
        ["epochs=7", "lr=0.005", "compute_dtype=bfloat16", "classes=[nodata,sand,water]",
         f"data={tmp_path}", "profile=true"],
    )
    assert conf.epochs == 7 and conf.lr == 0.005
    assert conf.compute_dtype == "bfloat16"
    assert conf.classes == ("nodata", "sand", "water")
    assert conf.profile is True
    save_yaml(conf, tmp_path / "c.yaml")
    conf2 = load_yaml(BeachSegConfig, tmp_path / "c.yaml")
    assert conf2 == conf


def test_pred_config_overlay_fields():
    conf = parse_cli(PredConfig, ["n_prompts=3", "zero_shot_crop_size=224"])
    assert conf.n_prompts == 3 and conf.zero_shot_crop_size == 224
    assert conf.classes == ("nodata", "sand", "water", "veg")


def _double_paths(paths):
    # module-level so the spawn-context ProcessPoolExecutor can pickle it
    return [p for p in paths for _ in range(2)]


def test_mosaic_prefetcher_process_pool():
    """BEACH_SEG_TPU_MOSAIC_PROCS path: spawn-context subprocess merges
    deliver the same results in order (merge_fn must be picklable — the
    engines pass functools.partial over module-level merge_tifs)."""
    from beach_seg_tpu.data.prefetch import MosaicPrefetcher

    dates = [(f"d{i}", [i]) for i in range(3)]
    pf = MosaicPrefetcher(dates, _double_paths, workers=1, processes=True)
    got = list(pf)
    assert got == [("d0", [0, 0]), ("d1", [1, 1]), ("d2", [2, 2])]

from pathlib import Path

import pytest

from beach_seg_tpu.config import CLASSES, BeachSegConfig, PredConfig, num_workers
from beach_seg_tpu.utils import confix


def test_classes_nodata_first():
    assert CLASSES[0] == "nodata"
    assert set(CLASSES) == {"nodata", "sand", "water", "veg"}


def test_defaults_match_reference():
    c = BeachSegConfig()
    assert c.crop_size == 112
    assert c.inpt_size == 448
    assert c.lr == 1e-3
    assert c.loss_beta == 0.01
    assert c.batch_size == 1
    assert c.checkpoint == "BAAI/seggpt-vit-large"
    assert c.monitor_metric == "val/f1"
    assert c.ema_alpha == 0.99


def test_dotlist_merge_types():
    c = confix.parse_cli(
        BeachSegConfig,
        [
            "epochs=5",
            "lr=0.01",
            "debug=true",
            "data=/tmp/scene",
            "scale=[0.2,0.9]",
            "classes=[nodata,water]",
        ],
    )
    assert c.epochs == 5 and isinstance(c.epochs, int)
    assert c.lr == 0.01
    assert c.debug is True
    assert c.data == Path("/tmp/scene")
    assert c.scale == (0.2, 0.9)
    assert c.classes == ("nodata", "water")


def test_unknown_key_rejected():
    with pytest.raises(confix.ConfigError):
        confix.parse_cli(BeachSegConfig, ["nope=1"])


def test_yaml_round_trip(tmp_path):
    c = confix.parse_cli(PredConfig, ["n_prompts=3", "epochs=7"])
    p = tmp_path / "conf.yaml"
    confix.save_yaml(c, p)
    c2 = confix.load_yaml(PredConfig, p)
    assert c2 == c


def test_merge_yaml_into_skips(tmp_path):
    base = BeachSegConfig()
    confix.save_yaml(confix.parse_cli(BeachSegConfig, ["epochs=9", "seed=7"]), tmp_path / "c.yaml")
    merged = confix.merge_yaml_into(base, tmp_path / "c.yaml", skip={"seed"})
    assert merged.epochs == 9
    assert merged.seed == base.seed


def test_num_workers_division():
    c = confix.parse_cli(BeachSegConfig, ["world_size=2", "workers=4"])
    assert num_workers(c) <= 4

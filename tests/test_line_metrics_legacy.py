"""ASD/Hausdorff line metrics + legacy inference mode end-to-end."""

import numpy as np
import pytest

from beach_seg_tpu.config import LegacyConfig
from beach_seg_tpu.geo.geometry import LineString, MultiLineString
from beach_seg_tpu.geo.line_metrics import average_symmetric_distance, hausdorff_distance
from beach_seg_tpu.geo.tiff import read
from beach_seg_tpu.infer.legacy import run_legacy
from tests.synthetic_scene import build_scene


def test_asd_parallel_lines():
    a = LineString([(0, 0), (100, 0)])
    b = LineString([(0, 3), (100, 3)])
    assert average_symmetric_distance(a, b, 200) == pytest.approx(3.0, rel=1e-6)
    assert average_symmetric_distance(a, a, 50) == pytest.approx(0.0, abs=1e-9)
    assert hausdorff_distance(a, b) == pytest.approx(3.0)


def test_asd_multiline():
    a = MultiLineString([LineString([(0, 0), (50, 0)]), LineString([(50, 0), (100, 0)])])
    b = LineString([(0, 4), (100, 4)])
    assert average_symmetric_distance(a, b, 200) == pytest.approx(4.0, rel=1e-6)


def test_hausdorff_asymmetric():
    a = LineString([(0, 0), (100, 0)])
    b = LineString([(0, 0), (100, 0), (100, 50)])
    assert hausdorff_distance(a, b) == pytest.approx(50.0)


def test_run_legacy_end_to_end(tmp_path_factory):
    scene_dir = build_scene(tmp_path_factory.mktemp("scene"))
    out_root = tmp_path_factory.mktemp("legacy")
    conf = LegacyConfig(
        data=scene_dir,
        model_training_root=out_root,
        crop_size=48,
        n_prompts=2,
        batch_size=2,
        debug=True,
        checkpoint="random",
        mesh_data=1,
        mesh_model=1,
    )
    out_dir = run_legacy(conf)
    tifs = sorted(out_dir.glob("*.tif"))
    assert tifs, "no per-class GeoTIFF outputs"
    names = {p.name.split("_")[0] for p in tifs}
    assert names <= {"WetDryLine", "VegLine"}
    r = read(tifs[0])
    assert set(np.unique(r.data)) <= {0, 1}
    assert r.crs == "EPSG:32611"

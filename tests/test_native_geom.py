"""Native geometry engine (geom.cc) vs the NumPy fallbacks — exact agreement."""

import numpy as np
import pytest

from beach_seg_tpu.geo.contours import _cell_segments, _cell_segments_native
from beach_seg_tpu.geo.geometry import Polygon
from beach_seg_tpu.geo.rasterize import _rasterize_native, _rings_to_pixel, rasterize_polygon


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rasterize_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    # random star-shaped polygon (no self-intersections)
    n = 12
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = rng.uniform(5, 20, n)
    cx, cy = rng.uniform(15, 35, 2)
    ring = np.stack([cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1)
    poly = Polygon(ring)
    a = rasterize_polygon(poly, (50, 50), native=False)
    b = _rasterize_native(_rings_to_pixel(poly, None), (50, 50))
    assert np.array_equal(a, b)


def test_rasterize_native_with_hole():
    poly = Polygon([(0, 0), (20, 0), (20, 20), (0, 20)], [[(5, 5), (15, 5), (15, 15), (5, 15)]])
    a = rasterize_polygon(poly, (25, 25), native=False)
    b = _rasterize_native(_rings_to_pixel(poly, None), (25, 25))
    assert np.array_equal(a, b)
    assert a[10, 10] == 0 and a[2, 2] == 1


@pytest.mark.parametrize("seed", [0, 3])
def test_marching_squares_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    img = rng.random((24, 31)).astype(np.float32)
    segs_py = _cell_segments(img, 0.5)
    segs_cc = _cell_segments_native(img, 0.5)
    assert segs_cc is not None
    assert len(segs_py) == len(segs_cc)
    a = np.asarray([(p[0][0], p[0][1], p[1][0], p[1][1]) for p in segs_py])
    b = np.asarray([(p[0][0], p[0][1], p[1][0], p[1][1]) for p in segs_cc])
    # same segment sets (order matches: both sweep row-major)
    assert np.allclose(a, b, atol=1e-6)

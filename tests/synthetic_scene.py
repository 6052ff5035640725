"""Synthetic mini-scene generator (SURVEY.md §4.3): tiny GeoTIFFs + shapefile
masks laid out exactly like the reference's data directory:

    <root>/Masks/Mask_<DATE>.shp        (veg polygons)
    <root>/Masks/WaterMask_<DATE>.shp   (water polygons)
    <root>/SatelliteImagery/<anything>/<DATE>_*.tif

The scene is a horizontal beach: water fills the bottom, veg the top, sand in
between, with band statistics that make the classes separable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.geometry import Polygon
from beach_seg_tpu.geo.shapefile import save_shapefile
from beach_seg_tpu.geo.tiff import write

EPSG = 32611
PIX = 3.0  # meters
H, W = 96, 128
ORIGIN_X, ORIGIN_Y = 500000.0, 4100000.0
MASK_DATE = "20230301"
OTHER_DATES = ("20230415", "20230520")

# region rows (pixel space): veg [0, 28), sand [28, 60), water [60, 96)
VEG_END_ROW = 28
WATER_START_ROW = 60


def world(col: float, row: float) -> tuple[float, float]:
    return (ORIGIN_X + col * PIX, ORIGIN_Y - row * PIX)


def transform() -> Affine:
    return Affine.from_origin(ORIGIN_X, ORIGIN_Y, PIX, PIX)


def _scene_bands(rng: np.ndarray, date_shift: int = 0) -> np.ndarray:
    """(4, H, W) uint16 with class-dependent statistics."""
    rows = np.arange(H)[:, None]
    img = np.empty((4, H, W), np.uint16)
    noise = rng.integers(0, 120, (4, H, W))
    veg = rows < VEG_END_ROW
    water = rows >= WATER_START_ROW + date_shift
    sand = ~veg & ~water
    base = np.zeros((4, H, W), np.int64)
    # water: dark NIR; veg: mid; sand: bright everywhere
    for b, (wv, sv, vv) in enumerate([(900, 2200, 1200), (1000, 2400, 1300), (1100, 2600, 1500), (400, 2800, 2300)]):
        base[b] = np.where(water, wv, 0) + np.where(sand, sv, 0) + np.where(veg, vv, 0)
    return np.clip(base + noise, 1, 65535).astype(np.uint16)


def build_scene(root: Path, seed: int = 0) -> Path:
    rng = np.random.default_rng(seed)
    mask_dir = root / "Masks"
    img_dir = root / "SatelliteImagery" / "files"
    mask_dir.mkdir(parents=True, exist_ok=True)
    img_dir.mkdir(parents=True, exist_ok=True)

    # water and veg polygons in world coordinates (slightly inside the edges
    # so the shoreline does not touch the frame)
    water_poly = Polygon(
        [world(2, WATER_START_ROW), world(W - 2, WATER_START_ROW), world(W - 2, H), world(2, H)]
    )
    veg_poly = Polygon([world(2, 0), world(W - 2, 0), world(W - 2, VEG_END_ROW), world(2, VEG_END_ROW)])
    save_shapefile([water_poly], mask_dir / f"WaterMask_{MASK_DATE}.shp", crs=EPSG)
    save_shapefile([veg_poly], mask_dir / f"Mask_{MASK_DATE}.shp", crs=EPSG)

    t = transform()
    # reference date: two overlapping halves (exercises the weighted merge)
    bands = _scene_bands(rng)
    left = bands[:, :, : W // 2 + 8]
    right = bands[:, :, W // 2 - 8 :]
    write(img_dir / f"{MASK_DATE}_a.tif", left, t, crs=EPSG, nodata=0)
    t_right = Affine.from_origin(ORIGIN_X + (W // 2 - 8) * PIX, ORIGIN_Y, PIX, PIX)
    write(img_dir / f"{MASK_DATE}_b.tif", right, t_right, crs=EPSG, nodata=0)

    # other dates: single full-frame image, shoreline shifted a little
    for i, date in enumerate(OTHER_DATES):
        db = _scene_bands(rng, date_shift=(i + 1) * 3)
        write(img_dir / f"{date}_a.tif", db, t, crs=EPSG, nodata=0)
    return root


def build_scene_8band(root: Path, seed: int = 0) -> Path:
    """SuperDove variant: 8-band imagery (same layout/masks) — exercises the
    broad_band display path through the full pipeline."""
    rng = np.random.default_rng(seed)
    mask_dir = root / "Masks"
    img_dir = root / "SatelliteImagery" / "files"
    mask_dir.mkdir(parents=True, exist_ok=True)
    img_dir.mkdir(parents=True, exist_ok=True)

    water_poly = Polygon(
        [world(2, WATER_START_ROW), world(W - 2, WATER_START_ROW), world(W - 2, H), world(2, H)]
    )
    veg_poly = Polygon([world(2, 0), world(W - 2, 0), world(W - 2, VEG_END_ROW), world(2, VEG_END_ROW)])
    save_shapefile([water_poly], mask_dir / f"WaterMask_{MASK_DATE}.shp", crs=EPSG)
    save_shapefile([veg_poly], mask_dir / f"Mask_{MASK_DATE}.shp", crs=EPSG)

    t = transform()
    rows = np.arange(H)[:, None]
    for date, shift in [(MASK_DATE, 0), (OTHER_DATES[0], 3)]:
        water = rows >= WATER_START_ROW + shift
        veg = rows < VEG_END_ROW
        sand = ~water & ~veg
        img = np.empty((8, H, W), np.uint16)
        for b in range(8):
            base = np.where(water, 400 + 60 * b, 0) + np.where(sand, 2000 + 150 * b, 0) + np.where(veg, 1000 + 90 * b, 0)
            img[b] = np.clip(base + rng.integers(0, 100, (H, W)), 1, 65535)
        write(img_dir / f"{date}_a.tif", img, t, crs=EPSG, nodata=0)
    return root

"""End-to-end predict benchmark: scene wall-clock through the REAL engine.

Measures ``run_predict`` (BASELINE.md "scene wall-clock" north star): host
crop prep (PIL-parity resizes), device forward, back-resize, vote paste, and
PNG/GeoTIFF writes — unlike bench.py, which times only the jitted forward on
pre-staged device arrays. Elision-proof by construction: every tile's votes
end up in GeoTIFFs on disk.

Usage:  python scripts/bench_e2e.py [--dates N] [--width-crops N] [--batch N]
Prints one JSON line per phase; the headline is e2e_tiles_per_sec (steady
state: second run, jit cache warm).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.geometry import Polygon
from beach_seg_tpu.geo.shapefile import save_shapefile
from beach_seg_tpu.geo.tiff import write

EPSG = 32611
PIX = 3.0
ORIGIN_X, ORIGIN_Y = 500000.0, 4100000.0
MASK_DATE = "20230301"


def build_big_scene(root: Path, width_crops: int, n_dates: int, crop_size: int = 112) -> Path:
    """Wide horizontal-beach scene: ~one shoreline crop per ``crop_size`` px
    of width, ``n_dates`` predict dates + the labeled reference date."""
    h = 4 * crop_size
    w = width_crops * crop_size
    veg_end, water_start = h // 4, 2 * h // 4 + crop_size // 2
    rng = np.random.default_rng(0)
    mask_dir = root / "Masks"
    img_dir = root / "SatelliteImagery" / "files"
    mask_dir.mkdir(parents=True, exist_ok=True)
    img_dir.mkdir(parents=True, exist_ok=True)

    def world(col, row):
        return (ORIGIN_X + col * PIX, ORIGIN_Y - row * PIX)

    save_shapefile(
        [Polygon([world(2, water_start), world(w - 2, water_start), world(w - 2, h), world(2, h)])],
        mask_dir / f"WaterMask_{MASK_DATE}.shp", crs=EPSG,
    )
    save_shapefile(
        [Polygon([world(2, 0), world(w - 2, 0), world(w - 2, veg_end), world(2, veg_end)])],
        mask_dir / f"Mask_{MASK_DATE}.shp", crs=EPSG,
    )

    t = Affine.from_origin(ORIGIN_X, ORIGIN_Y, PIX, PIX)
    rows = np.arange(h)[:, None]
    dates = [MASK_DATE] + [f"2023{4 + i:02d}15" for i in range(n_dates)]
    for i, date in enumerate(dates):
        water = rows >= water_start + 3 * i
        veg = rows < veg_end
        sand = ~water & ~veg
        img = np.empty((4, h, w), np.uint16)
        for b, (wv, sv, vv) in enumerate(
            [(900, 2200, 1200), (1000, 2400, 1300), (1100, 2600, 1500), (400, 2800, 2300)]
        ):
            base = np.where(water, wv, 0) + np.where(sand, sv, 0) + np.where(veg, vv, 0)
            img[b] = np.clip(base + rng.integers(0, 120, (h, w)), 1, 65535)
        write(img_dir / f"{date}_a.tif", img, t, crs=EPSG, nodata=0)
    return root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dates", type=int, default=3)
    ap.add_argument("--width-crops", type=int, default=40)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--merge", default="vote", choices=["vote", "blend"])
    ap.add_argument(
        "--engine", default="predict", choices=["predict", "zero_shot", "legacy"],
        help="predict = prompt-tuned (src/predict.py parity); zero_shot = "
        "ensemble (src/predict_no_prompt.py, BASELINE config #1); legacy = "
        "50%%-overlap semantic ensemble (src/old/beach_seg.py)",
    )
    ap.add_argument("--keep", action="store_true", help="keep output dirs")
    ap.add_argument("--debug", action="store_true", help="tiny model + small scene (CPU smoke)")
    args = ap.parse_args()
    if args.debug:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from beach_seg_tpu.config import LegacyConfig, PredConfig, PredictionConfig
    from beach_seg_tpu.infer.legacy import run_legacy
    from beach_seg_tpu.infer.predict import run_predict
    from beach_seg_tpu.infer.zero_shot import run_zero_shot

    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    try:
        crop = 32 if args.debug else 112
        scene_dir = build_big_scene(tmp / "scene", args.width_crops, args.dates, crop_size=crop)
        common = dict(
            data=scene_dir,
            model_training_root=tmp / "out",
            prediction_root=tmp / "out",
            checkpoint="random",
            batch_size=args.batch,
            compute_dtype="bfloat16",
            debug=args.debug,
            crop_size=crop,
            inpt_size=64 if args.debug else 448,
            mesh_data=-1,
            mesh_model=1,
        )
        if args.engine == "predict":
            conf = PredictionConfig(merge=args.merge, **common)
            run = run_predict
        elif args.engine == "zero_shot":
            conf = PredConfig(zero_shot_crop_size=crop, **common)
            run = run_zero_shot
        else:
            conf = LegacyConfig(**common)
            run = run_legacy

        t0 = time.perf_counter()
        out1 = run(conf)
        cold = time.perf_counter() - t0

        t0 = time.perf_counter()
        out2 = run(conf)
        warm = time.perf_counter() - t0

        n_expect = args.dates if not args.debug else min(args.dates, 2 if args.engine == "zero_shot" else 1)
        if args.engine == "predict":
            written = list((out2 / "tif").glob("*.tif"))
        elif args.engine == "zero_shot":
            written = list(out2.glob("tif/*.tif")) or list(out2.glob("*mask*.tif"))
        else:
            written = list(out2.glob("WetDryLine_*.tif"))
        assert len(written) >= n_expect, f"expected >={n_expect} GeoTIFFs, got {len(written)}"
        timings = json.loads((out2 / "timings.json").read_text())
        n_tiles = timings["tiles"]

        print(json.dumps({
            "metric": f"e2e_{args.engine}_scene_wallclock_cold", "value": round(cold, 2),
            "unit": "s", "tiles": n_tiles,
        }))
        print(json.dumps({
            "metric": f"e2e_{args.engine}_scene_wallclock_warm", "value": round(warm, 2),
            "unit": "s", "tiles": n_tiles, "wallclock_tiles_per_sec": round(n_tiles / warm, 3),
            "setup_s": timings["setup_s"],
        }))
        print(json.dumps({
            "metric": f"e2e_{args.engine}_tiles_per_sec", "value": timings["stream_tiles_per_sec"],
            "unit": "tiles/s", "tiles": n_tiles,
            "batch": args.batch, **({"merge": args.merge} if args.engine == "predict" else {}), **{
                k: timings[k]
                for k in ("stream_s", "mosaic_wait_s", "dispatch_s", "fetch_s", "paste_s")
                if k in timings
            },
        }))
        if args.keep:
            print(f"outputs kept under {tmp}", file=sys.stderr)
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

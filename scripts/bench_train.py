"""End-to-end training benchmark: the REAL run_training loop on a synthetic
scene (host crop assembly → device fused train step → device-accumulated
metrics → eval epoch → Orbax checkpoint → prompt exports).

Usage: python scripts/bench_train.py [--batch 8] [--width-crops 40] [--debug]
Prints one JSON line per phase; headline = steady-state train tiles/s
(second run, jit cache warm, timed around run_training minus setup).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_e2e import build_big_scene  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width-crops", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()
    if args.debug:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from beach_seg_tpu.config import BeachSegConfig
    from beach_seg_tpu.data.dataset import create_scene
    from beach_seg_tpu.train.loop import run_training

    tmp = Path(tempfile.mkdtemp(prefix="bench_train_"))
    try:
        crop = 32 if args.debug else 112
        scene_dir = build_big_scene(tmp / "scene", args.width_crops, 1, crop_size=crop)
        conf = BeachSegConfig(
            data=scene_dir,
            model_training_root=tmp / "out",
            checkpoint="random",
            batch_size=args.batch,
            compute_dtype="bfloat16",
            remat=True,
            debug=args.debug,
            crop_size=crop,
            inpt_size=64 if args.debug else 448,
            epochs=args.epochs,
            num_viz_images=0,
            mesh_data=-1,
            mesh_model=1,
        )
        scene = create_scene(conf, train=True)
        n_tiles = len(scene.crops) * args.epochs

        t0 = time.perf_counter()
        run_training(conf, scene=scene)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_training(conf, scene=scene)
        warm = time.perf_counter() - t0

        print(json.dumps({
            "metric": "train_e2e_wallclock_cold", "value": round(cold, 2), "unit": "s",
            "tiles": n_tiles,
        }))
        print(json.dumps({
            "metric": "train_e2e_tiles_per_sec", "value": round(n_tiles / warm, 3),
            "unit": "tiles/s", "wallclock_warm_s": round(warm, 2),
            "tiles": n_tiles, "batch": args.batch,
            "note": "includes the full eval epoch + checkpoint/export I-O",
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

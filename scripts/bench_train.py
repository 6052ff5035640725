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
    ap.add_argument(
        "--steps", type=int, default=0,
        help="instead of the e2e loop, time N steady-state fused train_step "
        "calls (the VERDICT ms/step metric) — same tuner/shardings as "
        "run_training, salted batches, checksum-chained",
    )
    ap.add_argument("--sync", action="store_true", help="block on the full state every step")
    ap.add_argument(
        "--no-scan", action="store_true",
        help="chain N python-side train_step dispatches through the donated "
        "state with ONE device-scalar checksum fetch, instead of wrapping N "
        "steps in lax.scan. The scan-wrapped compile exceeds the compile "
        "service's ~30 min transport timeout (observed rounds 3-5, remat or "
        "not) while the bare train_step compiles in minutes (the e2e loop "
        "and the AOT topology check both prove it); the dispatch chain is "
        "still elision-proof — every step consumes the previous state and "
        "feeds a device-side loss accumulator fetched once at the end",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="rematerialize encoder blocks in backward (the memory-bound "
        "config for big batches). Default is OFF — the production config "
        "default — and measured FASTER at B=8: 478.1 vs 557.4 ms/step "
        "(2026-08-20, v5e, dispatch-chain method); B=8 activations fit "
        "HBM comfortably (~8 GB incl. params)",
    )
    args = ap.parse_args()
    if args.debug:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from beach_seg_tpu.config import BeachSegConfig
    from beach_seg_tpu.data.dataset import create_scene
    from beach_seg_tpu.train.loop import run_training
    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    # the fused train step is the LONGEST compile in the repo and the remote
    # compile service drops transport mid-way on bad days — arm the persistent
    # cache so a retry resumes from whatever compiled before the drop
    enable_compilation_cache()

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
            remat=args.remat,
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

        if args.steps:
            _bench_steps(conf, scene, args)
            return

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


def _bench_steps(conf, scene, args) -> None:
    """Steady-state fused train_step timing (aug → forward → loss → grad →
    AdamW → EMA → confusion), same tuner/mesh/shardings as run_training.
    Elision-proof: every step consumes the previous state and a salted batch,
    and the final loss is fetched."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from beach_seg_tpu.data.dataset import BeachSegDataset, materialize_prompts
    from beach_seg_tpu.parallel.mesh import make_mesh, param_sharding, replicated
    from beach_seg_tpu.train.loop import model_for_config
    from beach_seg_tpu.train.prompt_tuner import PromptTuner
    from beach_seg_tpu.models.seggpt.load import load_model_params

    prompts = materialize_prompts(scene, conf)
    dataset = BeachSegDataset(scene, conf)
    num_prompts = len(scene.crops)
    model, model_cfg = model_for_config(conf)
    params = load_model_params(conf.checkpoint, model, model_cfg)
    mesh = make_mesh(conf.mesh_data, conf.mesh_model)
    steps_per_epoch = max(1, math.ceil(len(dataset) / conf.batch_size))
    tuner = PromptTuner(model=model, conf=conf, num_prompts=num_prompts, steps_per_epoch=steps_per_epoch)

    b, h, w = conf.batch_size, conf.inpt_size, conf.inpt_size
    rng = np.random.default_rng(0)
    with jax.sharding.set_mesh(mesh):
        params = jax.device_put(params, param_sharding(mesh, params))
        pmasks = jax.device_put(jnp.asarray(prompts["masks"], jnp.int32), replicated(mesh))
        pnodata = jax.device_put(jnp.asarray(prompts["nodata"]), replicated(mesh))
        state = jax.device_put(tuner.init_state(prompts["pixels"]), replicated(mesh))

        def batch_for(i):
            return {
                "image": jnp.asarray(rng.random((b, h, w, 3)), jnp.float32),
                "mask": jnp.asarray(rng.integers(0, 4, (b, h, w)), jnp.int32),
                "nodata": jnp.zeros((b, h, w), bool),
                "crop_idx": jnp.asarray(rng.integers(0, num_prompts, (b,)), jnp.int32),
                "valid": jnp.ones((b,), bool),
            }

        # Scan-chained measurement: N steps inside ONE executable whose only
        # output is a scalar checksum through every step's loss AND the final
        # prompt pixels. Per-dispatch timing is untrustworthy through the
        # tunneled runtime here (donated-aliased state buffers report ready
        # before execution finishes — observed 71 "ms/step" for a program
        # whose forward alone is ~130 ms), and a full state fetch costs ~24 s
        # of tunnel bandwidth; a scalar leaves nothing to alias or fetch.
        one_batch = jax.block_until_ready(batch_for(0))

        def chain(state, key, batch, n):
            def body(carry, i):
                st, acc = carry
                k = jax.random.fold_in(key, i)
                # salt the batch per step: distinct computations, no CSE
                b2 = dict(batch, image=batch["image"] * (1.0 + i.astype(jnp.float32) * 1e-4))
                st, metrics = tuner.train_step(st, params, pmasks, pnodata, b2, k)
                return (st, acc + metrics["loss"]), None

            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(n))
            return acc + st.prompt_pixels.astype(jnp.float32).sum()

        if args.no_scan:
            # N chained DISPATCHES of the bare train_step: each step consumes
            # the previous state (real data dependency — the runtime cannot
            # reorder or elide), losses accumulate ON DEVICE, and the single
            # scalar fetch at the end forces every execution to completion
            # (fetching a derived scalar cannot return early; the round-3
            # trap was blocking on DONATED state buffers, which report ready
            # before execution finishes through this tunnel).
            @jax.jit
            def acc_loss(acc, loss, pixels):
                return acc + loss + pixels.astype(jnp.float32).sum() * 1e-12

            def run_n(n, key):
                # fresh buffers: train_step DONATES the state, so the chain
                # must start from a copy or the second run_n call would pass
                # already-donated (deleted) buffers
                st = jax.tree.map(jnp.copy, state)
                acc = jnp.float32(0)
                for i in range(n):
                    k = jax.random.fold_in(key, i)
                    b2 = dict(
                        one_batch,
                        image=one_batch["image"] * (1.0 + np.float32(i) * 1e-4),
                    )
                    st, metrics = tuner.train_step(st, params, pmasks, pnodata, b2, k)
                    acc = acc_loss(acc, metrics["loss"], st.prompt_pixels)
                return float(acc)  # ONE scalar device_get syncs everything

            run_n(1, jax.random.PRNGKey(1))  # compile both programs
            run_n(2, jax.random.PRNGKey(1))  # non-donated→donated steady shape
            t1 = tn = None
            for trial in range(2):  # min over trials
                t0 = time.perf_counter()
                run_n(1, jax.random.PRNGKey(2 + trial))
                t1 = min(t1 or 9e9, time.perf_counter() - t0)
                t0 = time.perf_counter()
                run_n(args.steps, jax.random.PRNGKey(2 + trial))
                tn = min(tn or 9e9, time.perf_counter() - t0)
            dt = (tn - t1) / (args.steps - 1) * args.steps
            ms = dt / args.steps * 1000
            print(json.dumps({
                "metric": "train_step_ms", "value": round(ms, 1), "unit": "ms/step",
                "batch": b, "tiles_per_sec_trained": round(b / (dt / args.steps), 2),
                "steps": args.steps, "remat": conf.remat,
                "method": "differential dispatch-chain (N vs 1), device loss accumulator, one scalar fetch",
            }))
            return

        chain1 = jax.jit(lambda s, k, b: chain(s, k, b, 1))
        chainn = jax.jit(lambda s, k, b: chain(s, k, b, args.steps))
        float(chain1(state, jax.random.PRNGKey(1), one_batch))  # compile
        float(chainn(state, jax.random.PRNGKey(1), one_batch))  # compile
        t1 = tn = None
        for _ in range(2):  # min over trials
            t0 = time.perf_counter()
            float(chain1(state, jax.random.PRNGKey(2), one_batch))
            t1 = min(t1 or 9e9, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(chainn(state, jax.random.PRNGKey(2), one_batch))
            tn = min(tn or 9e9, time.perf_counter() - t0)
        dt = (tn - t1) / (args.steps - 1) * args.steps  # differential, per full run
        metrics = {"loss": jnp.float32(-1)}
    ms = dt / args.steps * 1000
    print(json.dumps({
        "metric": "train_step_ms", "value": round(ms, 1), "unit": "ms/step",
        "batch": b, "tiles_per_sec_trained": round(b / (dt / args.steps), 2),
        "steps": args.steps, "remat": conf.remat,
        "method": "differential scan-chain (N-in-one-jit vs 1), scalar checksum",
    }))


if __name__ == "__main__":
    main()

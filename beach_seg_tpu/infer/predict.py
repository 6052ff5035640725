"""Prompt-tuned sliding-window inference (ref /root/reference/src/predict.py).

Pipeline: load the train run's conf + tuned prompt pixels (or rebuild untuned
prompts from the reference date), build the predict scene (all non-reference
dates), then fan the (date × crop) tiles through the jitted ``predict_step``
in device-sized batches — the reference runs B=1 on CPU; here the crop axis is
the batch axis and shards over the mesh's data dimension. Votes accumulate
host-side into per-date mosaics (overlay/mask/GeoTIFF outputs).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.config import BeachSegConfig, PredictionConfig, num_workers
from beach_seg_tpu.data.dataset import (
    BeachSegDataset,
    create_scene,
    iterate_batches,
    materialize_prompts,
)
from beach_seg_tpu.data.prefetch import MosaicPrefetcher
from beach_seg_tpu.geo.extent import group_images_by_date
from beach_seg_tpu.geo.mosaic import merge_tifs
from beach_seg_tpu.infer.accumulator import VoteAccumulator
from beach_seg_tpu.models.seggpt.load import load_model_params
from beach_seg_tpu.ops.resize import resize_matrix
from beach_seg_tpu.parallel.mesh import batch_sharding, make_mesh, param_sharding, replicated
from beach_seg_tpu.train.checkpoint import load_prompt_batch
from beach_seg_tpu.train.loop import model_for_config
from beach_seg_tpu.train.prompt_tuner import PromptTuner
from beach_seg_tpu.utils.confix import merge_yaml_into
from beach_seg_tpu.utils.logging import allocate_run_dir, setup_logger

logger = logging.getLogger(__name__)


def _resize_batch(x: np.ndarray, out_size: int, method: str) -> np.ndarray:
    """(B, S, S[, C]) → (B, out, out[, C]) via sampling matrices (cv2 parity:
    INTER_CUBIC for images / INTER_NEAREST for masks, ref predict.py:258-259)."""
    m = resize_matrix(x.shape[1], out_size, method)
    out = np.einsum("oh,bhw...->bow...", m, x.astype(np.float32), optimize=True)
    return np.einsum("pw,bhw...->bhp...", m, out, optimize=True)


def resolve_config(pred_conf: PredictionConfig) -> BeachSegConfig:
    """Overlay the train run's conf.yaml (ref predict.py:174-187)."""
    conf = BeachSegConfig()
    if pred_conf.train_run_dir is not None:
        conf = merge_yaml_into(conf, Path(pred_conf.train_run_dir) / "conf.yaml")
    updates = {
        "data": pred_conf.data,
        "batch_size": pred_conf.batch_size,
        "debug": pred_conf.debug,
        "workers": pred_conf.workers,
        "mesh_data": pred_conf.mesh_data,
        "mesh_model": pred_conf.mesh_model,
        "compute_dtype": pred_conf.compute_dtype,
        "platform": pred_conf.platform,
    }
    # keep the train run's checkpoint unless explicitly overridden on the CLI
    if pred_conf.checkpoint != BeachSegConfig().checkpoint:
        updates["checkpoint"] = pred_conf.checkpoint
    if pred_conf.model_training_root is not None:
        updates["model_training_root"] = pred_conf.model_training_root
    return dataclasses.replace(conf, **updates)


def run_predict(pred_conf: PredictionConfig) -> Path:
    import time

    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # cold jit is minutes through the remote service
    t_start = time.perf_counter()
    conf = resolve_config(pred_conf)
    root = Path(pred_conf.prediction_root or conf.model_training_root)
    predict_dir = allocate_run_dir(root, conf.project, "predict", jax.process_index())
    setup_logger(predict_dir)
    logger.info("saving results to %s", predict_dir)

    # one scene for crops/prompts/extent; predict dates stream through the
    # mosaic prefetcher (the reference merges every date upfront,
    # data.py:166-168 — minutes of serial host work and O(dates) memory)
    train_scene = create_scene(conf, train=True, crop_overlap=pred_conf.overlap)
    num_prompts = len(train_scene.crops)
    use_blend = pred_conf.merge == "blend"
    feather = None
    if use_blend:
        # Hann window, floored so zero-overlap regions still receive votes
        ramp = np.sin(np.pi * (np.arange(conf.crop_size) + 0.5) / conf.crop_size) ** 2
        feather = (np.outer(ramp, ramp) + 1e-3)[..., None].astype(np.float32)
    feather_dev = None

    if pred_conf.train_run_dir is not None:
        name = "prompt_batch_ema.npz" if pred_conf.use_ema else "prompt_batch_tuned.npz"
        pb = load_prompt_batch(Path(pred_conf.train_run_dir) / name)
        logger.info("loaded %s prompts from %s", "EMA" if pred_conf.use_ema else "tuned", pred_conf.train_run_dir)
    else:
        prompts = materialize_prompts(train_scene, conf)
        pb = {
            "image": prompts["pixels"],
            "mask": prompts["masks"],
            "nodata": prompts["nodata"],
        }
        logger.info("using untuned reference-date prompts")

    # kick off the first mosaic merges BEFORE model load/upload: the merge is
    # pure host work and the single biggest exposed stream stall when it
    # serializes after device setup (3.1 s of 6.4 s in round 2's timings.json)
    data_dir = Path(conf.data)
    groups = group_images_by_date(list((data_dir / "SatelliteImagery").glob("*/*.tif")))
    groups.pop(train_scene.mask_date, None)
    merger = MosaicPrefetcher(
        sorted(groups.items()),
        functools.partial(  # picklable for the subprocess-merge path
            merge_tifs, out_shape=train_scene.out_shape,
            out_transform=train_scene.out_transform, crs=train_scene.crs,
        ),
    )

    model, model_cfg = model_for_config(conf)
    params = load_model_params(conf.checkpoint, model, model_cfg)
    mesh = make_mesh(conf.mesh_data, conf.mesh_model)
    tuner = PromptTuner(model=model, conf=conf, num_prompts=num_prompts, steps_per_epoch=1)
    bs = batch_sharding(mesh)

    with jax.sharding.set_mesh(mesh):
        params = jax.device_put(params, param_sharding(mesh, params))
        if use_blend:
            feather_dev = jax.device_put(jnp.asarray(feather), replicated(mesh))
        pixels = jax.device_put(jnp.asarray(pb["image"], jnp.float32), replicated(mesh))
        pmasks = jax.device_put(jnp.asarray(pb["mask"], jnp.int32), replicated(mesh))
        pnodata = jax.device_put(jnp.asarray(pb["nodata"]), replicated(mesh))

        with VoteAccumulator(
            train_scene.out_shape, predict_dir, train_scene.out_transform,
            train_scene.crs, conf.classes,
            dtype=np.float32 if use_blend else np.int32,
        ) as acc:

            def paste(batch, result):
                """Host post-step: device→host (already back-resized on
                device — the axon tunnel moves fresh data at only a few MB/s,
                so only the small crop-resolution result crosses), vote paste.

                Runs in the drain loop after the per-date async copies land —
                on this 1-vCPU host, threading the pastes under the dispatch
                loop is negative-sum (measured round 2), so host paste work
                happens once the device queue is empty.

                Overlay note: the reference pastes the query image after a
                crop→448→crop resize round-trip (predict.py:258); with raw
                device-side preprocessing the host never materializes the 448
                image, so the overlay PNG uses the raw crop — cosmetically
                identical, masks/GeoTIFFs unaffected.
                """
                img_small = np.asarray(batch["image_u8"], np.uint8)
                if use_blend:
                    # feather already multiplied ON DEVICE inside the jitted
                    # step (predict_step_probs feather arg)
                    votes = np.asarray(result, np.float32)  # (B, crop, crop, C)
                else:
                    # class IDs paste via acc.update_ids — C boolean compares
                    # on the clipped region instead of an np.eye one-hot
                    # gather (~77 MB/batch of allocation at B=32)
                    pred_small = np.asarray(result).astype(np.int32)  # (B, crop, crop)
                for i in range(len(img_small)):
                    if not batch["valid"][i]:
                        continue
                    if batch["nodata"][i].all():  # ref predict.py:235
                        continue
                    crop = train_scene.crops[int(batch["crop_idx"][i])]
                    if use_blend:
                        acc.update(batch["date"][i], crop, votes[i], img_crop=img_small[i])
                    else:
                        acc.update_ids(batch["date"][i], crop, pred_small[i], img_crop=img_small[i])

            t_setup = time.perf_counter()
            n_tiles = 0
            t_dispatch = t_mosaic = 0.0
            pending: list[tuple[list, object]] = []  # (batches, device concat) per date
            date_batches: list = []
            date_results: list = []

            def seal_date():
                """Concatenate the date's results ON DEVICE and start their
                device→host copy immediately: the transfer (and the compute it
                waits on) overlaps the NEXT date's dispatches instead of
                draining as one exposed fetch after the last dispatch
                (round-2 timings.json: fetch 2.6 s of a 6.4 s stream). The
                uint8 results are a few KB/tile, so per-date copies keep the
                one-big-transfer economics while issuing concurrently — the
                tunnel serializes a LONE fetch behind every queued dispatch."""
                if not date_results:
                    return
                dcat = (
                    jnp.concatenate(date_results, axis=0)
                    if len(date_results) > 1 else date_results[0]
                )
                try:
                    dcat.copy_to_host_async()
                except Exception:  # interpret/CPU arrays may not support it
                    pass
                pending.append((list(date_batches), dcat))
                date_batches.clear()
                date_results.clear()

            t_mark = time.perf_counter()
            for date, (merged_img, merged_nodata) in merger:
                t_mosaic += time.perf_counter() - t_mark
                date_scene = dataclasses.replace(
                    train_scene, date_merged_imgs={date: (merged_img, merged_nodata)}, date_masks={}
                )
                dataset = BeachSegDataset(date_scene, conf, raw=True)
                for batch in iterate_batches(dataset, conf.batch_size, workers=num_workers(conf)):
                    if not batch["valid"].any():
                        continue
                    # upload ONLY the raw uint8 crops + indices (~1 MB per
                    # batch); mask/nodata stay host-side
                    dev_batch = {
                        k: jax.device_put(jnp.asarray(v), bs)
                        for k, v in batch.items()
                        if k in ("image_u8", "crop_idx")
                    }
                    t0 = time.perf_counter()
                    if use_blend:
                        # overlap-blend: feathered soft class probabilities
                        # (feather window applied on device)
                        result = tuner.predict_step_probs(
                            pixels, params, pmasks, pnodata, dev_batch, conf.crop_size,
                            feather_dev,
                        )
                    else:
                        result = tuner.predict_step(
                            pixels, params, pmasks, pnodata, dev_batch,
                            out_size=conf.crop_size,
                        )
                    t_dispatch += time.perf_counter() - t0
                    date_batches.append(batch)
                    date_results.append(result)
                    n_tiles += int(batch["valid"].sum())
                seal_date()
                t_mark = time.perf_counter()
            # drain: by now every date's copy is in flight (or done), so the
            # np.asarray calls mostly find host-resident buffers — only the
            # LAST date's compute tail is exposed here
            t_fetch = t_paste = 0.0
            for batches, dcat in pending:
                t0 = time.perf_counter()
                res = np.asarray(dcat)
                t_fetch += time.perf_counter() - t0
                t0 = time.perf_counter()
                ofs = 0
                for b in batches:
                    n = len(b["valid"])
                    paste(b, res[ofs : ofs + n])
                    ofs += n
                t_paste += time.perf_counter() - t0
            t_stream = time.perf_counter()

    # phase timings for benchmarking/observability (read by scripts/bench_e2e.py)
    import json

    stream_s = t_stream - t_setup
    (predict_dir / "timings.json").write_text(json.dumps({
        "setup_s": round(t_setup - t_start, 3),
        "stream_s": round(stream_s, 3),
        "mosaic_wait_s": round(t_mosaic, 3),
        "dispatch_s": round(t_dispatch, 3),
        "fetch_s": round(t_fetch, 3),
        "paste_s": round(t_paste, 3),
        "tiles": n_tiles,
        "stream_tiles_per_sec": round(n_tiles / stream_s, 3) if stream_s > 0 else None,
    }))
    logger.info("done: %d tiles in %.2fs streaming", n_tiles, stream_s)
    return predict_dir

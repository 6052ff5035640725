"""Legacy ensemble inference mode (ref /root/reference/src/old/beach_seg.py).

The reference's original pipeline, preserved as a first-class inference mode
(the in-repo script is stale — wrong call signature + stray ``break``,
SURVEY.md quirk #8 — so this implements its *intended* behavior):

  - 50 %-overlap shoreline crops (``overlap = crop_size // 2``,
    ref old/beach_seg.py:152);
  - every query runs against the full tuned-prompt ensemble with
    ``embedding_type="semantic"`` and ``feature_ensemble=True``, duplicated
    queries, first painted canvas taken (ref :53-70);
  - predictions are buffer-trimmed (default ``buffer = crop_size // 8``) and
    merged with ascending max instead of voting (ref :79-83);
  - outputs per class: 1-bit GeoTIFF + shoreline shapefile
    (``WetDryLine`` = water, ``VegLine`` = veg, ref :199-222).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.config import LegacyConfig
from beach_seg_tpu.data.dataset import create_scene
from beach_seg_tpu.data.prefetch import MosaicPrefetcher
from beach_seg_tpu.geo.contours import extract_linestring
from beach_seg_tpu.geo.masks import crop_tif, safe_assign_crop
from beach_seg_tpu.geo.mosaic import merge_tifs
from beach_seg_tpu.infer.accumulator import transform_line
from beach_seg_tpu.infer.processor import (
    normalize_device,
    post_process_semantic_device,
    preprocess_image_u8,
    preprocess_mask_u8,
)
from beach_seg_tpu.infer.zero_shot import zero_shot_model
from beach_seg_tpu.geo.shapefile import save_shapefile
from beach_seg_tpu.geo.tiff import write as write_tiff
from beach_seg_tpu.models.seggpt.load import load_model_params
from beach_seg_tpu.parallel.mesh import batch_sharding, make_mesh, param_sharding, replicated
from beach_seg_tpu.train.checkpoint import load_prompt_batch
from beach_seg_tpu.utils.logging import allocate_run_dir, setup_logger

logger = logging.getLogger(__name__)

CLASS_EXPORT_NAMES = {"water": "WetDryLine", "veg": "VegLine"}


@functools.lru_cache(maxsize=4)
def _legacy_batched(model, crop_size: int, num_classes: int, m_prompts: int):
    """Jitted Q-ensemble forward, cached per (model, geometry).

    uint8 in, uint8 out: normalize the staged prompts/queries and decode ON
    DEVICE — only uint8 crosses the slow tunnel in either direction. All Q
    ensembles run as ONE fused Q·P model batch (group-major) with the
    per-ensemble averaging grouped via ``ensemble_groups`` — the flat batch
    axis shards over the mesh data axis (a vmap over the kernels' shard_map
    islands is unpartitionable on a real mesh).

    Built at module level under lru_cache because a per-run ``@jax.jit``
    closure retraces AND recompiles on every engine invocation — measured
    2026-08-20: the warm bench_e2e legacy stream spent 63 s of a 66 s stream
    in dispatch, dominated by the rebuild (flax Modules hash by config, so
    identical runs hit this cache)."""

    @jax.jit
    def batched(params, queries_u8, pp_u8, pm_u8):
        nq = queries_u8.shape[0]
        pp = jnp.tile(normalize_device(pp_u8), (nq, 1, 1, 1))
        pm = jnp.tile(normalize_device(pm_u8), (nq, 1, 1, 1))
        queries = jnp.repeat(normalize_device(queries_u8), m_prompts, axis=0)
        out = model.apply(
            {"params": params}, queries, pp, pm,
            embedding_type="semantic", feature_ensemble=True,
            decode_query_only=True, ensemble_groups=nq,
        )
        pred = out["pred_masks"]
        canvases = pred.reshape((nq, m_prompts) + pred.shape[1:])[:, 0]  # first canvas (ref :68)
        return post_process_semantic_device(canvases, (crop_size, crop_size), num_classes - 1)

    return batched


def run_legacy(conf: LegacyConfig) -> Path:
    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # cold jit is minutes through the remote service
    t_start = time.perf_counter()
    root = Path(conf.prediction_root or conf.model_training_root)
    out_dir = allocate_run_dir(root, conf.project, "legacy", jax.process_index())
    setup_logger(out_dir)
    logger.info("saving results to %s", out_dir)

    buffer_px = int(conf.crop_size * conf.buffer_factor)
    overlap = conf.crop_size // 2
    scene_conf = dataclasses.replace(conf)
    scene = create_scene(scene_conf, train=True, crop_overlap=overlap)
    num_classes = len(conf.classes)
    size = 448

    # prompts: tuned export if given, else reference-date crops. A train-run
    # DIRECTORY prefers the EMA export — the reference's legacy trainer saves
    # EMA-smoothed prompt pixels (src/old/train.py:168,255-258).
    if conf.prompt_ckpt is not None:
        ckpt = Path(conf.prompt_ckpt)
        if ckpt.is_dir():
            ema = ckpt / "prompt_batch_ema.npz"
            ckpt = ema if ema.exists() else ckpt / "prompt_batch_tuned.npz"
        pb = load_prompt_batch(ckpt)
        prompt_pixels = np.asarray(
            (np.clip(pb["image"], 0, 1) * 255).astype(np.uint8), np.uint8
        )
        prompt_masks_ids = pb["mask"]
        n = min(conf.n_prompts, len(prompt_pixels))
        p_pixels = np.stack([preprocess_image_u8(p, size) for p in prompt_pixels[:n]])
        p_masks = np.stack([preprocess_mask_u8(m, num_classes - 1, size) for m in prompt_masks_ids[:n]])
    else:
        img, nodata = scene.date_merged_imgs[scene.mask_date]
        label = scene.date_masks[scene.mask_date]
        p_pixels, p_masks = [], []
        for crop in scene.crops[: conf.n_prompts]:
            ci, _, cl = crop_tif(crop, img, nodata, label, conf.crop_size)
            p_pixels.append(preprocess_image_u8(ci, size))
            p_masks.append(preprocess_mask_u8(cl, num_classes - 1, size))
        p_pixels, p_masks = np.stack(p_pixels), np.stack(p_masks)

    model, model_cfg = zero_shot_model(conf)
    params = load_model_params(conf.checkpoint, model, model_cfg)
    mesh = make_mesh(conf.mesh_data, conf.mesh_model)

    m_prompts = len(p_pixels)
    batched = _legacy_batched(model, conf.crop_size, num_classes, m_prompts)

    from beach_seg_tpu.geo.extent import group_images_by_date

    groups = group_images_by_date(list((Path(conf.data) / "SatelliteImagery").glob("*/*.tif")))
    groups.pop(scene.mask_date, None)
    to_run = sorted(groups.items())
    if conf.debug:
        to_run = to_run[:1]

    with jax.sharding.set_mesh(mesh):
        params = jax.device_put(params, param_sharding(mesh, params))
        pp_dev = jax.device_put(jnp.asarray(p_pixels), replicated(mesh))
        pm_dev = jax.device_put(jnp.asarray(p_masks), replicated(mesh))
        bs = batch_sharding(mesh)

        merger = MosaicPrefetcher(
            to_run,
            functools.partial(  # picklable for the subprocess-merge path
                merge_tifs, out_shape=scene.out_shape,
                out_transform=scene.out_transform, crs=scene.crs,
            ),
        )
        timers = {"mosaic": 0.0, "dispatch": 0.0, "fetch": 0.0, "paste": 0.0}
        n_tiles = 0
        t_setup = time.perf_counter()

        def drain(sealed) -> None:
            """Fetch a sealed date's ids and paste/export its outputs.

            Called AFTER the next date's dispatches are queued (one-date
            double buffer, same shape as infer/zero_shot.py) — the round-4
            formulation fetched synchronously per 32-tile chunk, paying the
            tunnel's seconds-of-fixed-latency sync inside the dispatch loop
            (measured: 63 s of a 66 s stream)."""
            date, merged_nodata_d, metas_d, dcat = sealed
            t0 = time.perf_counter()
            preds = np.asarray(dcat).astype(np.uint8)
            timers["fetch"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            output = np.zeros(scene.out_shape, np.uint8)
            for (crop, cn), pred in zip(metas_d, preds):
                pred = pred.copy()
                pred[cn.astype(bool)] = 0
                inner = pred[buffer_px:-buffer_px, buffer_px:-buffer_px]
                xmin, ymin, xmax, ymax = crop
                safe_assign_crop(
                    output, inner, ymin + buffer_px, ymax - buffer_px,
                    xmin + buffer_px, xmax - buffer_px, logic="ascending",
                )
            timers["paste"] += time.perf_counter() - t0
            # per-class 1-bit GeoTIFF + shoreline shapefile (ref :199-222)
            for idx, cls in enumerate(conf.classes):
                name = CLASS_EXPORT_NAMES.get(cls)
                if name is None:
                    continue
                cls_mask = (output == idx).astype(np.uint8)
                write_tiff(
                    out_dir / f"{name}_{date}.tif", cls_mask, scene.out_transform,
                    scene.crs, compress="lzw",
                )
                line = extract_linestring(cls_mask.astype(bool), merged_nodata_d)
                if line is not None:
                    save_shapefile(
                        transform_line(line, scene.out_transform),
                        out_dir / f"{name}_{date}.shp", scene.crs,
                    )
            logger.info("date %s done", date)

        sealed_prev = None
        merger_it = iter(merger)
        while True:
            t0 = time.perf_counter()
            nxt = next(merger_it, None)
            timers["mosaic"] += time.perf_counter() - t0
            if nxt is None:
                break
            date, (merged_img, merged_nodata) = nxt

            queries, metas = [], []
            for crop in scene.crops:
                ci, cn, _ = crop_tif(crop, merged_img, merged_nodata, None, conf.crop_size)
                if np.all(cn):
                    continue
                queries.append(preprocess_image_u8(ci, size))
                metas.append((crop, cn))
            if not queries:
                continue
            b = max(1, conf.batch_size)
            n_tiles += len(queries)
            results: list = []
            for start in range(0, len(queries), b):
                chunk = queries[start : start + b]
                pad = b - len(chunk)
                batch_q = np.stack(chunk + [chunk[-1]] * pad)
                t0 = time.perf_counter()
                results.append(  # async — no host sync in the dispatch loop
                    batched(params, jax.device_put(jnp.asarray(batch_q), bs), pp_dev, pm_dev)[: len(chunk)]
                )
                timers["dispatch"] += time.perf_counter() - t0
            dcat = jnp.concatenate(results, axis=0) if len(results) > 1 else results[0]
            try:
                dcat.copy_to_host_async()
            except Exception:  # interpret/CPU arrays may not support it
                pass
            # this date's work is queued — NOW pay the previous date's fetch
            if sealed_prev is not None:
                drain(sealed_prev)
            sealed_prev = (date, merged_nodata, metas, dcat)
        if sealed_prev is not None:
            drain(sealed_prev)
        t_stream = time.perf_counter()

    # phase timings for benchmarking/observability (read by scripts/bench_e2e.py)
    stream_s = t_stream - t_setup
    (out_dir / "timings.json").write_text(json.dumps({
        "setup_s": round(t_setup - t_start, 3),
        "stream_s": round(stream_s, 3),
        "mosaic_wait_s": round(timers["mosaic"], 3),
        "dispatch_s": round(timers["dispatch"], 3),
        "fetch_s": round(timers["fetch"], 3),
        "paste_s": round(timers["paste"], 3),
        "tiles": n_tiles,
        "stream_tiles_per_sec": round(n_tiles / stream_s, 3) if stream_s > 0 else None,
    }))
    logger.info("done: %d tiles in %.2fs streaming", n_tiles, stream_s)
    return out_dir

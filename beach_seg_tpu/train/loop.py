"""Training runtime: the ``trainer.fit`` equivalent (ref /root/reference/src/train.py:27-132).

Run-dir allocation, config/classes snapshots, scene setup, prompt
materialization, the epoch loop over the fused ``PromptTuner.train_step``,
per-epoch validation (val dataset == train dataset, reproducing the
reference's setup at data.py:245-251), TB/CSV logging, image grids, Orbax
checkpoints each epoch, and prompt-batch exports before AND after training
(ref train.py:76-77,121-122).

Known intentional divergence (SURVEY.md quirk #1): the reference multiplies
``max_epochs`` by ``len(prompt_batch)`` — the number of DICT KEYS (5), an
accident of ``len()`` on a dict. We train the configured ``epochs``.
"""

from __future__ import annotations

import logging
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.config import BeachSegConfig, num_workers
from beach_seg_tpu.data.dataset import BeachSegDataset, create_scene, iterate_batches, materialize_prompts
from beach_seg_tpu.data.prefetch import prefetch_iterator
from beach_seg_tpu.models.seggpt.config import SegGPTConfig
from beach_seg_tpu.models.seggpt.load import load_model_params
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.parallel.distributed import host_batch_slice
from beach_seg_tpu.parallel.mesh import make_mesh, param_sharding, put_batch, replicated
from beach_seg_tpu.train.checkpoint import latest_checkpoint, restore_state, save_prompt_batch, save_state
from beach_seg_tpu.train.loggers import MetricsLogger, example_grid
from beach_seg_tpu.train.metrics import f1_from_confusion
from beach_seg_tpu.train.prompt_tuner import PromptTuner, lr_schedule
from beach_seg_tpu.utils.confix import save_yaml
from beach_seg_tpu.utils.logging import allocate_run_dir, setup_logger
from beach_seg_tpu.utils.profiling import StepTimer, maybe_trace

logger = logging.getLogger(__name__)


def model_for_config(conf: BeachSegConfig) -> tuple[SegGPT, SegGPTConfig]:
    dtype = jnp.bfloat16 if conf.compute_dtype == "bfloat16" else jnp.float32
    ckpt = Path(str(conf.checkpoint))
    if ckpt.suffix == ".npz" and ckpt.exists():
        from beach_seg_tpu.models.seggpt.convert import load_config

        stored = load_config(ckpt)
        if stored is not None:
            # a converted-checkpoint npz carries its own topology — it
            # describes the weights, so it wins over the conf presets (same
            # rule as infer/zero_shot.py zero_shot_model)
            return SegGPT(stored, dtype=dtype, remat=conf.remat), stored
    if conf.debug:
        # miniature topology for smoke runs / CI — same control flow
        cfg = SegGPTConfig(
            hidden_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            image_size=(2 * conf.inpt_size, conf.inpt_size),
            pretrain_image_size=64,
            decoder_hidden_size=16,
            merge_index=1,
            intermediate_hidden_state_indices=(1, 3),
        )
    elif conf.backbone == "huge":
        # ViT-H-class backbone for the SuperDove configuration
        # (BASELINE.json config #5); TP-shard via mesh_model > 1
        from beach_seg_tpu.models.seggpt.config import huge_config

        cfg = huge_config(image_size=(2 * conf.inpt_size, conf.inpt_size))
    else:
        cfg = SegGPTConfig(image_size=(2 * conf.inpt_size, conf.inpt_size))
    return SegGPT(cfg, dtype=dtype, remat=conf.remat), cfg


def run_training(conf: BeachSegConfig, scene=None) -> Path:
    if conf.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if conf.precision != "32-true":
        logger.warning(
            "precision=%r is a Lightning-compat no-op here; set compute_dtype "
            "(currently %r) to control the TPU matmul dtype", conf.precision, conf.compute_dtype,
        )
    if conf.deterministic:
        logger.warning(
            "deterministic=true is a no-op: XLA/TPU programs are already "
            "deterministic for a fixed seed, data order, and compilation"
        )
    run_dir = allocate_run_dir(Path(conf.model_training_root), conf.project, "train", jax.process_index())
    setup_logger(run_dir, rank=jax.process_index())
    logger.info("run dir: %s", run_dir)
    save_yaml(conf, run_dir / "conf.yaml")
    (run_dir / "classes.txt").write_text("\n".join(conf.classes))

    if scene is None:
        scene = create_scene(conf, train=True)
    prompts = materialize_prompts(scene, conf)
    dataset = BeachSegDataset(scene, conf)
    num_prompts = len(scene.crops)
    logger.info("%d crops / %d train items", num_prompts, len(dataset))

    model, model_cfg = model_for_config(conf)
    params = load_model_params(conf.checkpoint, model, model_cfg)

    mesh = make_mesh(conf.mesh_data, conf.mesh_model)
    data_size = mesh.devices.shape[0]
    if conf.batch_size % data_size:
        raise ValueError(f"batch_size={conf.batch_size} must divide data axis ({data_size})")

    steps_per_epoch = max(1, math.ceil(len(dataset) / conf.batch_size))
    tuner = PromptTuner(model=model, conf=conf, num_prompts=num_prompts, steps_per_epoch=steps_per_epoch)
    sched = lr_schedule(conf, steps_per_epoch)

    with jax.sharding.set_mesh(mesh):
        params = jax.device_put(params, param_sharding(mesh, params))
        pmasks = jax.device_put(jnp.asarray(prompts["masks"], jnp.int32), replicated(mesh))
        pnodata = jax.device_put(jnp.asarray(prompts["nodata"]), replicated(mesh))
        state = jax.device_put(tuner.init_state(prompts["pixels"]), replicated(mesh))
        start_epoch = 0
        if conf.resume_from is not None:
            ckpt = latest_checkpoint(Path(conf.resume_from))
            if ckpt is None:
                raise FileNotFoundError(f"no checkpoint under {conf.resume_from}")
            state = jax.device_put(restore_state(ckpt, jax.device_get(state)), replicated(mesh))
            start_epoch = int(state.step) // steps_per_epoch
            logger.info("resumed from %s (step %d, epoch %d)", ckpt, int(state.step), start_epoch)

        save_prompt_batch(
            run_dir / "prompt_batch.npz",
            prompts["pixels"], prompts["masks"], prompts["nodata"], prompts["crop_idx"],
            [scene.mask_date] * num_prompts,
        )

        mlog = MetricsLogger(run_dir)
        key = jax.random.PRNGKey(conf.seed)
        global_step = 0

        # multi-host: each process builds + stages only its own batch rows
        # (consistent shuffle order via the shared seed), put_batch assembles
        # the global array shard-by-shard
        row_slice = None
        if jax.process_count() > 1:
            row_slice = host_batch_slice(conf.batch_size)

        def put(batch):
            # "valid" rides along so train/eval steps can zero padded rows
            return put_batch(mesh, {k: v for k, v in batch.items() if k != "date"})

        timer = StepTimer()
        global_step = start_epoch * steps_per_epoch
        best_metric = None
        # epochs_compat: the reference's Trainer trains epochs × 5 (len() of
        # the prompt_batch DICT, src/train.py:98) while the cosine period
        # stays conf.epochs — lr_schedule already uses conf.epochs.
        total_epochs = conf.epochs * 5 if conf.epochs_compat else conf.epochs
        for epoch in range(start_epoch, total_epochs):
            # confusion accumulates ON DEVICE; device→host fetches through the
            # axon tunnel carry ~1 s of fixed latency each, so per-step metric
            # fetches would dominate the step time — fetch once per epoch
            train_cm_dev = jnp.zeros((len(conf.classes),) * 2, jnp.int32)
            with maybe_trace(conf.profile and epoch == 0, run_dir):
                batches = prefetch_iterator(
                    iterate_batches(
                        dataset, conf.batch_size, shuffle=True, seed=conf.seed + epoch,
                        workers=num_workers(conf), row_slice=row_slice,
                    )
                )
                for batch in batches:
                    key, sub = jax.random.split(key)
                    state, metrics = tuner.train_step(state, params, pmasks, pnodata, put(batch), sub)
                    train_cm_dev = train_cm_dev + metrics["confusion"]
                    timer.tick()
                    if global_step % conf.log_every_n_steps == 0:
                        scalars = {"train/loss": float(metrics["loss"]), "lr": float(sched(global_step))}
                        if timer.steps_per_sec:
                            scalars["perf/steps_per_sec"] = timer.steps_per_sec
                        mlog.log_scalars(scalars, global_step)
                    global_step += 1
            train_cm = np.asarray(train_cm_dev).astype(np.int64)  # single fetch per epoch
            mlog.log_scalars({"train/f1": float(f1_from_confusion(jnp.asarray(train_cm)))}, global_step)

            # validation — same dataset as train (reference quirk #2);
            # loss/confusion accumulate on device, one fetch at epoch end
            val_cm_dev = jnp.zeros_like(train_cm_dev)
            val_loss_dev = jnp.zeros((), jnp.float32)
            n_val = 0
            viz = None
            viz_src = None
            for batch in iterate_batches(
                dataset, conf.batch_size, workers=num_workers(conf), row_slice=row_slice
            ):
                key, sub = jax.random.split(key)
                out = tuner.eval_step(state.prompt_pixels, params, pmasks, pnodata, put(batch), sub)
                val_cm_dev = val_cm_dev + out["confusion"]
                val_loss_dev = val_loss_dev + out["loss"]
                n_val += 1
                if viz_src is None and conf.num_viz_images > 0:
                    viz_src = (batch, out["pred"])  # fetched after the loop
            val_cm = np.asarray(val_cm_dev).astype(np.int64)
            val_losses = [float(val_loss_dev) / max(n_val, 1)]
            if viz_src is not None:
                batch, pred_dev = viz_src
                n = min(conf.num_viz_images, len(batch["image"]))
                prompt_imgs = np.asarray(state.prompt_pixels)[batch["crop_idx"][:n] % num_prompts]
                viz = example_grid(
                    batch["image"][:n],
                    batch["mask"][:n],
                    np.asarray(pred_dev)[:n],
                    prompt_imgs,
                    conf.classes,
                    conf.viz_size,
                )
            mlog.log_scalars(
                {"val/f1": float(f1_from_confusion(jnp.asarray(val_cm))), "val/loss": float(np.mean(val_losses))},
                global_step,
            )
            if viz is not None:
                mlog.log_image("val_images", viz, epoch)
            save_state(run_dir, jax.device_get(state))
            # best-checkpoint tracking (the reference's commented-out
            # ModelCheckpoint on monitor_metric, ref train.py:82-89)
            val_f1 = float(f1_from_confusion(jnp.asarray(val_cm)))
            val_loss_mean = float(np.mean(val_losses))
            monitored = {"val/f1": val_f1, "val/loss": val_loss_mean}.get(conf.monitor_metric, val_f1)
            better = best_metric is None or (
                monitored > best_metric if conf.monitor_mode == "max" else monitored < best_metric
            )
            if better:
                best_metric = monitored
                save_prompt_batch(
                    run_dir / "prompt_batch_best.npz",
                    np.asarray(state.prompt_pixels), prompts["masks"], prompts["nodata"],
                    prompts["crop_idx"], [scene.mask_date] * num_prompts,
                )
                import json

                (run_dir / "best.json").write_text(
                    json.dumps({"epoch": epoch, conf.monitor_metric: monitored})
                )
            logger.info(
                "epoch %d: val/f1=%.4f val/loss=%.4f",
                epoch,
                float(f1_from_confusion(jnp.asarray(val_cm))),
                float(np.mean(val_losses)),
            )

        # post-fit prompt export: the tuned pixels (ref train.py:121-122)
        save_prompt_batch(
            run_dir / "prompt_batch_tuned.npz",
            np.asarray(state.prompt_pixels), prompts["masks"], prompts["nodata"],
            prompts["crop_idx"], [scene.mask_date] * num_prompts,
        )
        # EMA-smoothed export — what the reference's legacy trainer saves
        # (src/old/train.py:168,255-258); consumed by predict use_ema=true
        save_prompt_batch(
            run_dir / "prompt_batch_ema.npz",
            np.asarray(state.ema_pixels), prompts["masks"], prompts["nodata"],
            prompts["crop_idx"], [scene.mask_date] * num_prompts,
        )
        mlog.close()
    return run_dir

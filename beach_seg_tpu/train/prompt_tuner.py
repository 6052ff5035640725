"""Prompt tuning: the only trainable weights are prompt-image pixels.

TPU-native rebuild of the reference's ``PromptModel`` training logic
(ref /root/reference/src/model.py:67-438). Design:

  - All prompt crops live in ONE array ``prompt_pixels`` (P, S, S, 3) in [0,1];
    per-step prompt selection is a device-side ``jnp.take`` instead of the
    reference's host-side ParameterList indexing (src/model.py:115-130,189-195).
  - One jitted ``train_step`` fuses: palette sampling → query+prompt
    augmentation (differentiable, gradients flow into the prompt pixels through
    the augmentation exactly as kornia's did) → colorize → SegGPT forward →
    nodata-masked smooth-L1 → grad wrt prompt pixels only → AdamW update →
    EMA → palette-distance decode → confusion-matrix update. Zero host syncs
    inside an epoch.
  - Under a data-sharded mesh the batch axis is split across chips and XLA
    emits the psums for the scalar loss/grads/confusion sums — the TPU
    analogue of DDP+sync_dist.

Behavioral notes vs the reference (quirk ledger, SURVEY.md §7):
  - The custom loss reproduces the *intended* semantics of src/model.py:40-64
    (the torch broadcast at :61 is only shape-correct at B=1).
  - Drop-path is active during training (Lightning flips the frozen backbone
    back to train mode, so the reference trains with stochastic depth too).
  - ``predict_step`` defaults to the deterministic Painter palette; the
    reference samples a random palette even at predict time (src/model.py:134)
    — class-space outputs are equivalent, set ``painter_palette=False`` to
    mimic the reference exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.train.metrics import confusion_update
from beach_seg_tpu.transforms import (
    apply_palette,
    build_palette,
    decode_by_palette,
    eval_augment,
    normalize_imagenet,
    normalize_palette,
    random_palette,
    train_augment,
)
from beach_seg_tpu.transforms.augment import AugmentParams


class PromptState(struct.PyTreeNode):
    """Optimizer-visible training state — prompt pixels are the only params."""

    prompt_pixels: jnp.ndarray  # (P, S, S, 3) float32 in [0, 1]
    ema_pixels: jnp.ndarray  # EMA of the above (ref src/old/train.py:168)
    opt_state: Any
    step: jnp.ndarray  # () int32


def prompt_tune_loss(
    pred_masks: jnp.ndarray, labels: jnp.ndarray, yesdata: jnp.ndarray, beta: float
) -> jnp.ndarray:
    """Nodata-masked smooth-L1 on the query half (ref src/model.py:40-64,
    intended B>1 semantics). NHWC: pred (B,2H,W,3), labels (B,H,W,3)."""
    h = pred_masks.shape[1] // 2
    query = pred_masks[:, h:].astype(jnp.float32)
    diff = query - labels.astype(jnp.float32)
    l1 = jnp.abs(diff)
    loss = jnp.where(l1 < beta, 0.5 * diff * diff / beta, l1 - 0.5 * beta)
    keep = yesdata.astype(jnp.float32)[..., None]
    denom = keep.sum() * pred_masks.shape[-1]
    return (loss * keep).sum() / jnp.maximum(denom, 1.0)


def prompt_tune_loss_ref_compat(
    pred_masks: jnp.ndarray,
    labels: jnp.ndarray,
    yesdata: jnp.ndarray,
    beta: float,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bug-for-bug port of the reference's SegGptLoss INCLUDING the
    ``unsqueeze(1)`` broadcast at src/model.py:61: at B>1 the (B,…) loss and
    (B,1,…) keep mask broadcast to (B,B,…), summing every (sample_i loss ×
    sample_j keep) pair before dividing by keep.sum(). Identical to
    :func:`prompt_tune_loss` at B=1 — the only batch size the reference runs.
    ``sample_weight`` zeroes padded rows on BOTH sides of the pair product.
    """
    h = pred_masks.shape[1] // 2
    query = pred_masks[:, h:].astype(jnp.float32)
    diff = query - labels.astype(jnp.float32)
    l1 = jnp.abs(diff)
    loss = jnp.where(l1 < beta, 0.5 * diff * diff / beta, l1 - 0.5 * beta)
    keep = jnp.broadcast_to(yesdata.astype(jnp.float32)[..., None], loss.shape)
    if sample_weight is not None:
        w = sample_weight.astype(jnp.float32)[:, None, None, None]
        loss = loss * w
        keep = keep * w
    # pairwise sum: Σ_ij Σ_hwc loss[i]·keep[j]  (the torch broadcast, fused)
    pair = jnp.einsum("ihwc,jhwc->", loss, keep)
    return pair / jnp.maximum(keep.sum(), 1.0)


def soft_class_probs(pred_masks: jnp.ndarray, palette_norm: jnp.ndarray, tau: float = 0.05) -> jnp.ndarray:
    """Differentiable class probabilities from the painted query half:
    softmax over negative squared palette distances (the soft version of the
    distance-argmin decode). pred (B, 2H, W, 3) → (B, H, W, C)."""
    h = pred_masks.shape[1] // 2
    query = pred_masks[:, h:].astype(jnp.float32)  # (B, H, W, 3)
    p = palette_norm.astype(jnp.float32)  # (B, C, 3)
    d2 = (
        jnp.sum(query * query, axis=-1)[..., None]
        - 2.0 * jnp.einsum("bhwc,bnc->bhwn", query, p)
        + jnp.sum(p * p, axis=-1)[:, None, None, :]
    )
    return jax.nn.softmax(-d2 / tau, axis=-1)


def dice_bce_loss(
    pred_masks: jnp.ndarray,
    palette_norm: jnp.ndarray,
    labels: jnp.ndarray,
    yesdata: jnp.ndarray,
    num_classes: int,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dice + BCE on soft class probabilities (the segmentation-standard
    objective named in BASELINE.json; the reference itself trains smooth-L1).
    labels: (B, H, W) int ids; masked to yesdata pixels. ``sample_weight``
    (B,) zeroes padded rows from both terms (incl. the per-sample dice mean)."""
    probs = soft_class_probs(pred_masks, palette_norm)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    keep = yesdata.astype(jnp.float32)[..., None]
    if sample_weight is not None:
        keep = keep * sample_weight.astype(jnp.float32)[:, None, None, None]
    eps = 1e-6
    probs_c = jnp.clip(probs, eps, 1 - eps)
    bce = -(onehot * jnp.log(probs_c) + (1 - onehot) * jnp.log(1 - probs_c))
    bce = (bce * keep).sum() / jnp.maximum(keep.sum() * num_classes, 1.0)
    inter = (probs * onehot * keep).sum(axis=(1, 2))
    denom = ((probs + onehot) * keep).sum(axis=(1, 2))
    dice = 1.0 - (2 * inter + eps) / (denom + eps)
    if sample_weight is not None:
        w = sample_weight.astype(jnp.float32)
        return bce + (dice.mean(axis=-1) * w).sum() / jnp.maximum(w.sum(), 1.0)
    return bce + dice.mean()


def lr_schedule(conf: BeachSegConfig, steps_per_epoch: int):
    """sqrt-batch-scaled warmup + per-epoch cosine (ref src/model.py:385-428).

    The reference steps its SequentialLR once per *epoch*; we express the same
    piecewise curve as a function of the optax update count.
    """
    gbs = conf.batch_size * conf.world_size * conf.grad_accum_steps
    ratio = (gbs / conf.base_lr_batch_size) ** 0.5
    lr, init_lr, min_lr = conf.lr * ratio, conf.init_lr * ratio, conf.min_lr * ratio
    warmup, total = conf.warmup_epochs, max(conf.epochs, 1)

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        warm = init_lr + (lr - init_lr) * epoch / max(warmup, 1)
        e = jnp.maximum(epoch - warmup, 0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * e / total))
        return jnp.where(epoch < warmup, warm, cos)

    return schedule


def make_optimizer(conf: BeachSegConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    if conf.optimizer != "adamw":
        raise ValueError(f"Unexpected optimizer {conf.optimizer}")
    if conf.scheduler != "cosine":
        raise ValueError(f"Unexpected scheduler {conf.scheduler}")
    tx = optax.adamw(lr_schedule(conf, steps_per_epoch))
    if conf.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, conf.grad_accum_steps)
    return tx


@dataclasses.dataclass(frozen=True)
class PromptTuner:
    """Builds the jitted train/eval/predict steps for one run.

    ``prompt_masks``/``prompt_nodata`` (P, S, S) are the label/nodata rasters
    of the prompt crops — static per-run, passed through every step so the
    jitted program does not bake them in as constants.
    """

    model: SegGPT
    conf: BeachSegConfig
    num_prompts: int
    steps_per_epoch: int

    @property
    def num_classes(self) -> int:
        return len(self.conf.classes)

    @property
    def aug(self) -> AugmentParams:
        return AugmentParams.from_config(self.conf)

    def optimizer(self) -> optax.GradientTransformation:
        return make_optimizer(self.conf, self.steps_per_epoch)

    def init_state(self, prompt_pixels: jnp.ndarray) -> PromptState:
        # fresh buffers (not aliases of the caller's array or of each other):
        # the state is donated per-step, and donating an aliased buffer is an
        # XLA error / deletes the caller's array
        pixels = jnp.array(jnp.asarray(prompt_pixels, jnp.float32), copy=True)
        return PromptState(
            prompt_pixels=pixels,
            ema_pixels=pixels + 0.0,
            opt_state=self.optimizer().init(pixels),
            step=jnp.zeros((), jnp.int32),
        )

    # ---------------------------------------------------------------- train

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: PromptState, model_params, prompt_masks, prompt_nodata, batch, key):
        """One fused prompt-tuning step (ref src/model.py:233-269)."""
        conf = self.conf
        b = batch["image"].shape[0]
        valid = batch.get("valid")  # (B,) bool — absent means all rows real
        k_pal, k_idx, k_aug_q, k_aug_p, k_dp, k_pdrop = jax.random.split(key, 6)

        palette = random_palette(k_pal, self.num_classes, b)
        palette_norm = normalize_palette(palette)

        # query-side augmentation (the reference's on_after_batch_transfer hook)
        q_img, q_mask, q_nodata = train_augment(
            k_aug_q, batch["image"], batch["mask"], batch["nodata"], self.aug
        )
        if valid is not None:
            # padded batch rows: force the whole row to nodata (class 0) so it
            # drops out of the loss numerator+denominator AND the confusion
            # update (ignore_index=0) — padding must not pollute gradients or
            # metrics (per-sample semantics, ref src/model.py:233-308)
            q_mask = jnp.where(valid[:, None, None], q_mask, 0)
        labels_color = normalize_imagenet(apply_palette(palette, q_mask))
        prompt_idx = jax.random.randint(k_idx, (b,), 0, self.num_prompts)

        def loss_fn(prompt_pixels):
            p_img = jnp.take(prompt_pixels, prompt_idx, axis=0)
            if conf.prompt_dropout > 0.0:
                # legacy trainer's prompt dropout (ref src/old/train.py:141-143)
                drop = jax.random.bernoulli(k_pdrop, float(conf.prompt_dropout), (b, 1, 1, 1))
                p_img = jnp.where(drop, 0.0, p_img)
            p_mask = jnp.take(prompt_masks, prompt_idx, axis=0)
            p_nod = jnp.take(prompt_nodata, prompt_idx, axis=0)
            p_img_aug, p_mask_aug, _ = train_augment(k_aug_p, p_img, p_mask, p_nod, self.aug)
            p_color = normalize_imagenet(apply_palette(palette, p_mask_aug))
            out = self.model.apply(
                {"params": model_params},
                pixel_values=q_img,
                prompt_pixel_values=p_img_aug,
                prompt_masks=p_color,
                labels=labels_color,
                embedding_type="instance",
                deterministic=False,
                rngs={"droppath": k_dp},
                decode_query_only=True,
            )
            if conf.loss_variant == "hf":
                if valid is None:
                    loss = out["loss"]  # SegGPT internal loss (legacy trainer)
                else:
                    from beach_seg_tpu.models.seggpt.model import (
                        default_bool_masked_pos,
                        seggpt_loss,
                    )

                    loss = seggpt_loss(
                        self.model.config, p_color, out["pred_masks"], labels_color,
                        default_bool_masked_pos(self.model.config, b), sample_weight=valid,
                    )
            elif conf.loss_variant == "dice_bce":
                loss = dice_bce_loss(
                    out["pred_masks"], palette_norm, q_mask, q_mask != 0,
                    self.num_classes, sample_weight=valid,
                )
            elif conf.loss_variant == "nodata_ref":
                loss = prompt_tune_loss_ref_compat(
                    out["pred_masks"], labels_color, q_mask != 0, conf.loss_beta,
                    sample_weight=valid,
                )
            else:
                loss = prompt_tune_loss(out["pred_masks"], labels_color, q_mask != 0, conf.loss_beta)
            return loss, out["pred_masks"]

        (loss, pred_masks), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.prompt_pixels)
        updates, opt_state = self.optimizer().update(grads, state.opt_state, state.prompt_pixels)
        new_pixels = optax.apply_updates(state.prompt_pixels, updates)
        ema = conf.ema_alpha * state.ema_pixels + (1.0 - conf.ema_alpha) * new_pixels
        new_state = PromptState(new_pixels, ema, opt_state, state.step + 1)

        h = pred_masks.shape[1] // 2
        pred_ids = decode_by_palette(pred_masks[:, h:], palette_norm)
        cm = confusion_update(pred_ids, q_mask, self.num_classes)
        return new_state, {"loss": loss, "confusion": cm}

    # ----------------------------------------------------------------- eval

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, prompt_pixels, model_params, prompt_masks, prompt_nodata, batch, key):
        """Validation: eval aug, prompt = the sample's own crop, random palette
        (ref src/model.py:271-308)."""
        conf = self.conf
        b = batch["image"].shape[0]
        valid = batch.get("valid")
        palette = random_palette(key, self.num_classes, b)
        palette_norm = normalize_palette(palette)

        q_img, q_mask, _ = eval_augment(batch["image"], batch["mask"], batch["nodata"], conf.inpt_size)
        if valid is not None:
            # padded rows → all-nodata: excluded from loss and confusion
            q_mask = jnp.where(valid[:, None, None], q_mask, 0)
        labels_color = normalize_imagenet(apply_palette(palette, q_mask))

        idx = batch["crop_idx"].astype(jnp.int32)
        p_img = jnp.take(prompt_pixels, idx, axis=0)
        p_mask = jnp.take(prompt_masks, idx, axis=0)
        p_nod = jnp.take(prompt_nodata, idx, axis=0)
        p_img_aug, p_mask_aug, _ = eval_augment(p_img, p_mask, p_nod, conf.inpt_size)
        p_color = normalize_imagenet(apply_palette(palette, p_mask_aug))

        out = self.model.apply(
            {"params": model_params},
            pixel_values=q_img,
            prompt_pixel_values=p_img_aug,
            prompt_masks=p_color,
            labels=labels_color,
            embedding_type="instance",
            decode_query_only=True,
        )
        loss = prompt_tune_loss(out["pred_masks"], labels_color, q_mask != 0, conf.loss_beta)
        h = out["pred_masks"].shape[1] // 2
        pred_ids = decode_by_palette(out["pred_masks"][:, h:], palette_norm)
        cm = confusion_update(pred_ids, q_mask, self.num_classes)
        return {"loss": loss, "confusion": cm, "pred": pred_ids}

    # -------------------------------------------------------------- predict

    def _query_pixels(self, batch):
        """Normalized query canvas from either batch flavor.

        ``image_u8`` (B, S, S, 3) uint8 raw crops → PIL-parity resize ON
        DEVICE + normalize (the raw-upload inference path: ~60× fewer bytes
        over the slow host→device link). ``image`` (B, inpt, inpt, 3) float
        → the classic eval path (center-crop identity + normalize)."""
        conf = self.conf
        if "image_u8" in batch:
            q = batch["image_u8"]
            if q.shape[1] != conf.inpt_size:
                from beach_seg_tpu.ops.resize import resize_pil_uint8_device

                q = resize_pil_uint8_device(q, (conf.inpt_size, conf.inpt_size))
            else:
                q = q.astype(jnp.float32)
            return normalize_imagenet(q / 255.0)
        q_img, _, _ = eval_augment(batch["image"], batch["mask"], batch["nodata"], conf.inpt_size)
        return q_img

    @partial(jax.jit, static_argnums=(0, 7, 8))
    def predict_step(
        self,
        prompt_pixels,
        model_params,
        prompt_masks,
        prompt_nodata,
        batch,
        key: Optional[jax.Array] = None,
        painter_palette: bool = True,
        out_size: Optional[int] = None,
    ):
        """Inference forward (ref src/model.py:132-147): prompt = own crop
        index, no labels, palette-distance decode. Returns (B, S, S) ids —
        or, with ``out_size``, (B, out, out) uint8 ids back-resized ON DEVICE
        with the cv2-NEAREST selection gather (the host download of a full
        int32 canvas is ~25 MB/batch at ~6 MB/s through the axon tunnel and
        dominates end-to-end inference otherwise)."""
        conf = self.conf
        b = batch.get("image", batch.get("image_u8")).shape[0]
        if painter_palette:
            palette = jnp.broadcast_to(
                jnp.asarray(build_palette(self.num_classes - 1))[None], (b, self.num_classes, 3)
            )
        else:
            palette = random_palette(key, self.num_classes, b)
        palette_norm = normalize_palette(palette)

        q_img = self._query_pixels(batch)
        idx = batch["crop_idx"].astype(jnp.int32)
        p_img = jnp.take(prompt_pixels, idx, axis=0)
        p_mask = jnp.take(prompt_masks, idx, axis=0)
        p_nod = jnp.take(prompt_nodata, idx, axis=0)
        p_img_aug, p_mask_aug, _ = eval_augment(p_img, p_mask, p_nod, conf.inpt_size)
        p_color = normalize_imagenet(apply_palette(palette, p_mask_aug))

        out = self.model.apply(
            {"params": model_params},
            pixel_values=q_img,
            prompt_pixel_values=p_img_aug,
            prompt_masks=p_color,
            embedding_type="instance",
            decode_query_only=True,
        )
        h = out["pred_masks"].shape[1] // 2
        ids = decode_by_palette(out["pred_masks"][:, h:], palette_norm)
        if out_size is not None and out_size != ids.shape[1]:
            from beach_seg_tpu.ops.resize import resize_matrix

            idx = jnp.asarray(resize_matrix(ids.shape[1], out_size, "nearest_cv2").argmax(1))
            ids = jnp.take(jnp.take(ids, idx, axis=1), idx, axis=2)
        return ids.astype(jnp.uint8) if out_size is not None else ids

    # ------------------------------------------------------- predict (soft)

    @partial(jax.jit, static_argnums=(0, 6))
    def predict_step_probs(
        self, prompt_pixels, model_params, prompt_masks, prompt_nodata, batch,
        out_size: Optional[int] = None, feather=None,
    ):
        """Like predict_step but returns soft class probabilities
        (B, S, S, C) — the overlap-blend inference mode's input (softmax over
        negative palette distances instead of the hard argmin). ``out_size``
        back-resizes on device (cv2-INTER_CUBIC matrices, clipped ≥0) so the
        host downloads the small probability grid. ``feather``: optional
        (out, out, 1) blend window multiplied on device — the host-side
        (B, out, out, C) float multiply it replaces was pure paste-phase cost
        on a 1-vCPU host (VERDICT r04 weak #3)."""
        conf = self.conf
        b = batch.get("image", batch.get("image_u8")).shape[0]
        palette = jnp.broadcast_to(
            jnp.asarray(build_palette(self.num_classes - 1))[None], (b, self.num_classes, 3)
        )
        palette_norm = normalize_palette(palette)

        q_img = self._query_pixels(batch)
        idx = batch["crop_idx"].astype(jnp.int32)
        p_img = jnp.take(prompt_pixels, idx, axis=0)
        p_mask = jnp.take(prompt_masks, idx, axis=0)
        p_nod = jnp.take(prompt_nodata, idx, axis=0)
        p_img_aug, p_mask_aug, _ = eval_augment(p_img, p_mask, p_nod, conf.inpt_size)
        p_color = normalize_imagenet(apply_palette(palette, p_mask_aug))

        out = self.model.apply(
            {"params": model_params},
            pixel_values=q_img,
            prompt_pixel_values=p_img_aug,
            prompt_masks=p_color,
            embedding_type="instance",
            decode_query_only=True,
        )
        probs = soft_class_probs(out["pred_masks"], palette_norm)
        if out_size is not None and out_size != probs.shape[1]:
            from beach_seg_tpu.ops.resize import resize_matrix

            m = jnp.asarray(resize_matrix(probs.shape[1], out_size, "bicubic_cv2"), jnp.float32)
            probs = jnp.einsum("oh,bhwc->bowc", m, probs, precision=jax.lax.Precision.HIGHEST)
            probs = jnp.einsum("pw,bhwc->bhpc", m, probs, precision=jax.lax.Precision.HIGHEST)
            probs = jnp.clip(probs, 0, None)
        if feather is not None:
            probs = probs * feather[None]
        return probs

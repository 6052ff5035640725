"""Scene-level golden parity: our run_zero_shot vs the reference's own
zero-shot mask-assembly chain (BASELINE.md IoU>=0.999 north star).

The reference's geo stack (rasterio/shapely/geopandas) is not installed in
this image, so /root/reference/src cannot be imported as a module. What CAN
run — and is run here, verbatim in behavior — is the entire inference chain
of predict_no_prompt.py:228-315 on top of the real HF torch SegGpt +
SegGptImageProcessor (both installed): prompt preprocessing, the (tied)
prompt ranking, per-crop prompt selection, feature-ensemble forward, the
pred_masks.mean(dim=0) ensemble, post_process_semantic_segmentation, nodata
zeroing, the Accumulator's clipped one-hot vote paste, and the final argmax.
Scene inputs (mosaics, crops, nodata, labels) are computed once with this
framework's geo layer and fed identically to both sides; the geo ops carry
their own unit-level parity tests (tests/test_geo*.py).

Writes PARITY.md with per-date, per-class IoU. Run on CPU (fp32, exact).
"""

from __future__ import annotations

import dataclasses
import json
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402

from tests.synthetic_scene import MASK_DATE, build_scene  # noqa: E402
from tests.test_seggpt_parity import make_torch_model  # noqa: E402

from beach_seg_tpu.config import PredConfig  # noqa: E402
from beach_seg_tpu.data.dataset import create_scene  # noqa: E402
from beach_seg_tpu.geo.extent import group_images_by_date  # noqa: E402
from beach_seg_tpu.geo.masks import crop_tif  # noqa: E402
from beach_seg_tpu.geo.mosaic import merge_tifs  # noqa: E402
from beach_seg_tpu.geo.tiff import read as read_tiff  # noqa: E402
from beach_seg_tpu.models.seggpt.config import tiny_config  # noqa: E402
from beach_seg_tpu.models.seggpt.convert import (  # noqa: E402
    config_from_hf,
    convert_torch_state_dict,
    save_params,
)

CROP_SIZE = 48
N_PROMPTS = 2


def reference_zero_shot(tmodel, processor, conf: PredConfig, scene) -> dict[str, np.ndarray]:
    """Faithful re-execution of /root/reference/src/predict_no_prompt.py:
    create_prompt_dataset greens the nodata (:94-95), prompts are preprocessed
    per crop (:235-247), ranking ties to crop order (:250), and each query
    crop votes through the Accumulator (:255-315)."""
    num_classes = len(conf.classes)
    prompt_img, prompt_nodata = scene.date_merged_imgs[scene.mask_date]
    prompt_img = prompt_img.copy()
    prompt_img[prompt_nodata, 1] = 255
    prompt_label = scene.date_masks[scene.mask_date]
    crops = scene.crops

    crop_prompts, crop_labels = [], []
    for crop in crops:
        ci, _, cl = crop_tif(crop, prompt_img, prompt_nodata, prompt_label, CROP_SIZE)
        inputs = processor.preprocess(
            prompt_images=[ci], prompt_masks=[cl], num_labels=num_classes - 1,
            return_tensors="pt", data_format="channels_first",
        )
        crop_prompts.append(inputs)
        crop_labels.append(cl)
    # (cl != "sand") collapses to a scalar → all keys tie → crop order
    best_crop_idxes = np.argsort([True for _ in crop_labels])

    groups = group_images_by_date(list((Path(conf.data) / "SatelliteImagery").glob("*/*.tif")))
    groups.pop(scene.mask_date, None)
    ref_masks: dict[str, np.ndarray] = {}
    with torch.no_grad():
        for date, img_paths in sorted(groups.items()):
            merged_img, merged_nodata = merge_tifs(
                img_paths, scene.out_shape, scene.out_transform, scene.crs
            )
            merged_img = merged_img.copy()
            merged_img[merged_nodata, 1] = 255
            pred_counter = np.zeros((*scene.out_shape, num_classes), np.uint8)
            for crop_idx, crop in enumerate(crops):
                crop_img, crop_nodata, _ = crop_tif(crop, merged_img, merged_nodata, None, CROP_SIZE)
                if np.all(crop_nodata):
                    continue
                if crop_idx in best_crop_idxes[:N_PROMPTS]:
                    crop_idxes = best_crop_idxes[:N_PROMPTS]
                else:
                    crop_idxes = [crop_idx] + best_crop_idxes[: N_PROMPTS - 1].tolist()
                prompts = [crop_prompts[i] for i in crop_idxes]
                inputs = processor.preprocess(
                    images=[crop_img] * len(prompts), num_labels=num_classes - 1,
                    return_tensors="pt", data_format="channels_first",
                )
                batch_out = tmodel(
                    pixel_values=inputs["pixel_values"],
                    prompt_pixel_values=torch.concat([p["prompt_pixel_values"] for p in prompts]),
                    prompt_masks=torch.concat([p["prompt_masks"] for p in prompts]),
                    embedding_type="instance",
                    feature_ensemble=True,
                )
                batch_out.pred_masks = batch_out.pred_masks.mean(dim=0).unsqueeze(0)
                pred = processor.post_process_semantic_segmentation(
                    batch_out, [(CROP_SIZE, CROP_SIZE)], num_labels=num_classes - 1
                )[0].numpy()
                pred[crop_nodata.astype(bool)] = 0
                one_hot = np.eye(num_classes, dtype=np.uint8)[pred]
                # Accumulator.update clip-paste (predict_no_prompt.py:163-186)
                h, w = scene.out_shape
                xmin, ymin, xmax, ymax = crop
                dy0, dy1 = max(ymin, 0), min(ymax, h)
                dx0, dx1 = max(xmin, 0), min(xmax, w)
                sy0, sx0 = dy0 - ymin, dx0 - xmin
                pred_counter[dy0:dy1, dx0:dx1] += one_hot[
                    sy0 : sy0 + (dy1 - dy0), sx0 : sx0 + (dx1 - dx0)
                ]
            ref_masks[date] = np.argmax(pred_counter, axis=2).astype(np.uint8)
    return ref_masks


def per_class_iou(a: np.ndarray, b: np.ndarray, num_classes: int) -> list[float]:
    out = []
    for c in range(num_classes):
        inter = int(((a == c) & (b == c)).sum())
        union = int(((a == c) | (b == c)).sum())
        out.append(inter / union if union else 1.0)
    return out


def main() -> None:
    from transformers.models.seggpt.image_processing_seggpt import SegGptImageProcessor

    from beach_seg_tpu.infer.zero_shot import run_zero_shot

    tmp = Path(tempfile.mkdtemp(prefix="golden_"))
    try:
        scene_dir = build_scene(tmp / "scene")

        # shared random weights: tiny topology on the REAL 448 canvas
        tcfg = tiny_config(
            image_size=(896, 448), patch_size=16, pretrain_image_size=448, drop_path_rate=0.0
        )
        tmodel, hf_cfg = make_torch_model(tcfg)
        cfg = config_from_hf(hf_cfg)
        ckpt = tmp / "weights.npz"
        save_params(convert_torch_state_dict(tmodel.state_dict(), cfg), ckpt, config=cfg)

        conf = PredConfig(
            data=scene_dir,
            model_training_root=tmp / "out",
            prediction_root=tmp / "out",
            checkpoint=str(ckpt),
            zero_shot_crop_size=CROP_SIZE,
            n_prompts=N_PROMPTS,
            batch_size=4,
            rank_compat=True,
            compute_dtype="float32",
            mesh_data=1,
            mesh_model=1,
        )

        scene = create_scene(
            dataclasses.replace(conf, crop_size=CROP_SIZE), train=True
        )
        processor = SegGptImageProcessor()
        ref_masks = reference_zero_shot(tmodel, processor, conf, scene)

        out_dir = run_zero_shot(conf)

        num_classes = len(conf.classes)
        rows, worst = [], 1.0
        for date, ref in sorted(ref_masks.items()):
            got = read_tiff(out_dir / "tif" / f"{date}.tif").data[0]
            agree = float((got == ref).mean())
            ious = per_class_iou(got, ref, num_classes)
            worst = min(worst, *ious)
            rows.append((date, agree, ious))
            print(json.dumps({
                "date": date, "pixel_agreement": round(agree, 6),
                "iou": {c: round(i, 6) for c, i in zip(conf.classes, ious)},
            }))

        lines = [
            "# PARITY — scene-level golden parity vs the reference zero-shot chain",
            "",
            "Our `run_zero_shot` (rank_compat=true) vs the reference's own",
            "predict_no_prompt.py mask-assembly chain (real HF torch SegGpt +",
            "SegGptImageProcessor + the Accumulator's clipped vote/argmax),",
            "identical random weights (tiny topology, real 448 canvas), identical",
            "scene inputs, fp32 CPU. Produced by `python scripts/golden_parity.py`.",
            "",
            "| date | pixel agreement | " + " | ".join(f"IoU {c}" for c in conf.classes) + " |",
            "|---|---|" + "---|" * num_classes,
        ]
        for date, agree, ious in rows:
            lines.append(
                f"| {date} | {agree:.6f} | " + " | ".join(f"{i:.6f}" for i in ious) + " |"
            )
        lines += [
            "",
            f"Worst per-class IoU: **{worst:.6f}** (target ≥ 0.999).",
            "",
            "The prompt-tuned predict path has no runnable reference oracle in this",
            "image (src/model.py imports lightning+kornia, not installed); its",
            "components are covered by tests/test_seggpt_parity.py (forward ≤2e-4),",
            "tests/test_e2e_parity.py (HF processor chain), and",
            "tests/test_inference.py (vote accumulator semantics).",
        ]
        Path(__file__).resolve().parents[1].joinpath("PARITY.md").write_text("\n".join(lines) + "\n")
        print(f"worst per-class IoU: {worst:.6f}")
        assert worst >= 0.999, f"parity below target: {worst}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

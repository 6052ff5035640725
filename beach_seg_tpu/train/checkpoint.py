"""Checkpoint / resume: Orbax for training state, npz for prompt exports.

The reference persists ``prompt_batch.pt`` before AND after fit plus
``conf.yaml``/``classes.txt`` (ref /root/reference/src/train.py:76-77,109-122)
and has no mid-training resume. Here (SURVEY.md §5):

  - ``save_state``/``restore_state``: full PromptState (prompt pixels, EMA,
    optimizer state, step) via Orbax — preemption-tolerant resume, an
    operational necessity on TPU that the reference lacks.
  - ``save_prompt_batch``/``load_prompt_batch``: pickle-free npz export with
    the same logical fields as the reference's prompt_batch.pt
    (crop_idx / date / image / mask / nodata), consumed by predict.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from beach_seg_tpu.train.prompt_tuner import PromptState


def save_state(run_dir: Path, state: PromptState, step: int | None = None) -> Path:
    import orbax.checkpoint as ocp

    path = Path(run_dir) / "checkpoints" / f"step_{int(state.step) if step is None else step}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.absolute(), state)
    return path


def latest_checkpoint(run_dir: Path) -> Path | None:
    base = Path(run_dir) / "checkpoints"
    if not base.exists():
        return None
    steps = sorted(
        (int(p.name.split("_")[1]), p) for p in base.iterdir() if p.name.startswith("step_")
    )
    return steps[-1][1] if steps else None


def restore_state(path: Path, template: PromptState) -> PromptState:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), template)


def save_prompt_batch(
    path: Path,
    pixels: np.ndarray,
    masks: np.ndarray,
    nodata: np.ndarray,
    crop_idx: np.ndarray,
    dates: list[str],
) -> None:
    np.savez_compressed(
        path,
        image=np.asarray(pixels, np.float32),
        mask=np.asarray(masks, np.int32),
        nodata=np.asarray(nodata, bool),
        crop_idx=np.asarray(crop_idx, np.int32),
        date=np.asarray(dates),
    )


def load_prompt_batch(path: Path) -> dict[str, np.ndarray]:
    data = np.load(path, allow_pickle=False)
    return {k: data[k] for k in data.files}

from beach_seg_tpu.train.checkpoint import (
    latest_checkpoint,
    load_prompt_batch,
    restore_state,
    save_prompt_batch,
    save_state,
)
from beach_seg_tpu.train.loop import model_for_config, run_training
from beach_seg_tpu.train.metrics import confusion_update, f1_from_confusion, iou_from_confusion
from beach_seg_tpu.train.prompt_tuner import PromptState, PromptTuner, lr_schedule, make_optimizer

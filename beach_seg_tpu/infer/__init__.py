from beach_seg_tpu.infer.accumulator import VoteAccumulator, transform_line
from beach_seg_tpu.infer.legacy import run_legacy
from beach_seg_tpu.infer.predict import run_predict
from beach_seg_tpu.infer.zero_shot import run_zero_shot

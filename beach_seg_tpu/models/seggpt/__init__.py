from beach_seg_tpu.models.seggpt.config import SegGPTConfig, tiny_config
from beach_seg_tpu.models.seggpt.convert import (
    config_from_hf,
    convert_torch_state_dict,
    load_params,
    save_params,
)
from beach_seg_tpu.models.seggpt.load import init_random, load_model_params
from beach_seg_tpu.models.seggpt.model import SegGPT, default_bool_masked_pos, seggpt_loss

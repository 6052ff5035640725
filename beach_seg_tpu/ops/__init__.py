from beach_seg_tpu.ops.attention import attention_reference, get_rel_pos, rel_pos_terms
from beach_seg_tpu.ops.pallas_attn import fused_attention
from beach_seg_tpu.ops.resize import resize_1d, resize_2d, resize_matrix, resize_pil_uint8

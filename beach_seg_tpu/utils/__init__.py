from beach_seg_tpu.utils.confix import load_yaml, merge_dotlist, parse_cli, save_yaml
from beach_seg_tpu.utils.env import find_dotenv, load_dotenv
from beach_seg_tpu.utils.logging import allocate_run_dir, setup_logger
from beach_seg_tpu.utils.profiling import StepTimer, maybe_trace

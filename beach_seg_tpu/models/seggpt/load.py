"""Model parameter loading (ref /root/reference/src/util/ml_util.py:7-13).

Resolution order for ``checkpoint``:
  1. a ``.npz`` file written by ``convert.save_params`` (the framework's
     native format);
  2. a local directory containing an HF torch SegGPT checkpoint
     (``model.safetensors`` or ``pytorch_model.bin``) — converted on the fly;
  3. an HF hub id — downloaded via transformers when network is available;
  4. ``random`` → fresh init (benchmarks / tests).
"""

from __future__ import annotations

import functools as _functools
import logging
from pathlib import Path

import jax
import jax.numpy as jnp

from beach_seg_tpu.models.seggpt.config import SegGPTConfig
from beach_seg_tpu.models.seggpt.convert import convert_torch_state_dict, load_params
from beach_seg_tpu.models.seggpt.model import SegGPT

logger = logging.getLogger(__name__)


@_functools.lru_cache(maxsize=8)
def _jitted_init(model: SegGPT):
    # flax Modules are frozen dataclasses (hashable): equal models share one
    # jit wrapper, so repeated init_random calls hit the compile cache instead
    # of re-tracing (a fresh jax.jit(model.init) per call re-compiles every
    # time — ~10 s per run_predict invocation)
    return jax.jit(model.init)


def init_random(model: SegGPT, cfg: SegGPTConfig, seed: int = 0):
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    zeros = jnp.zeros((1, h, w, 3), jnp.float32)
    return _jitted_init(model)(jax.random.PRNGKey(seed), zeros, zeros, zeros)["params"]


def _torch_state_dict(local_dir: Path) -> dict:
    st = local_dir / "model.safetensors"
    if st.exists():
        from safetensors.torch import load_file

        return load_file(str(st))
    bin_path = local_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        return torch.load(str(bin_path), map_location="cpu", weights_only=True)
    raise FileNotFoundError(f"no torch checkpoint under {local_dir}")


def load_model_params(checkpoint: str | Path, model: SegGPT, cfg: SegGPTConfig):
    """→ flax params tree for ``model`` (all frozen — the reference never
    trains the backbone, ml_util.py:9-10)."""
    ckpt = str(checkpoint)
    if ckpt == "random":
        logger.warning("using RANDOM SegGPT weights (checkpoint='random')")
        return init_random(model, cfg)
    path = Path(ckpt)
    if path.suffix == ".npz" and path.exists():
        return jax.tree.map(jnp.asarray, load_params(path))
    if path.is_dir():
        sd = _torch_state_dict(path)
        return jax.tree.map(jnp.asarray, convert_torch_state_dict(sd, cfg))
    # HF hub id (requires network)
    try:
        from transformers.models.seggpt.modeling_seggpt import SegGptForImageSegmentation

        tmodel = SegGptForImageSegmentation.from_pretrained(ckpt)
        return jax.tree.map(jnp.asarray, convert_torch_state_dict(tmodel.state_dict(), cfg))
    except Exception as e:  # offline or bad id
        raise FileNotFoundError(
            f"cannot resolve checkpoint {ckpt!r}: not an npz, not a local dir, "
            f"and hub fetch failed ({e}). Use checkpoint=random for random init."
        ) from e

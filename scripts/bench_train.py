"""Training-step throughput benchmark (secondary metric; the driver's
headline is bench.py). Prints one JSON line:

    {"metric": "train_tiles_per_sec_per_chip", ...}

Measures the fully fused prompt-tuning step (augment → forward → loss →
flash-backward → AdamW → EMA → confusion) on ViT-L 448 tiles, bf16 + remat.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.config import SegGPTConfig
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.train.prompt_tuner import PromptTuner

B, P, ITERS = 8, 8, 10


def main() -> None:
    conf = BeachSegConfig(
        epochs=1, crop_size=112, inpt_size=448, batch_size=B,
        compute_dtype="bfloat16", remat=True, checkpoint="random",
    )
    model = SegGPT(SegGPTConfig(), dtype=jnp.bfloat16, remat=True)
    h = w = 448
    zeros = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros, zeros)["params"]
    rng = np.random.default_rng(0)
    tuner = PromptTuner(model=model, conf=conf, num_prompts=P, steps_per_epoch=10)
    state = tuner.init_state(jnp.asarray(rng.random((P, h, w, 3)), jnp.float32))
    pm = jnp.asarray(rng.integers(0, 4, (P, h, w)), jnp.int32)
    pn = jnp.zeros((P, h, w), bool)
    batch = {
        "image": jnp.asarray(rng.random((B, h, w, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 4, (B, h, w)), jnp.int32),
        "nodata": jnp.zeros((B, h, w), bool),
        "crop_idx": jnp.zeros((B,), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state, _ = tuner.train_step(state, params, pm, pn, batch, key)  # compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        # state threads through every step — lazy runtimes cannot elide
        state, metrics = tuner.train_step(state, params, pm, pn, batch, sub)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "train_tiles_per_sec_per_chip",
                "value": round(B * ITERS / dt, 3),
                "unit": "tiles/s",
                "ms_per_step": round(dt / ITERS * 1e3, 1),
                "batch": B,
            }
        )
    )


if __name__ == "__main__":
    main()

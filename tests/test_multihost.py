"""Multi-host training: 2 jax.distributed CPU processes, each feeding ONLY its
own batch rows (host_batch_slice + put_batch), must reproduce the
single-process result (VERDICT r1 weak #4 / next-step #9).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "__REPO__")
from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.models.seggpt.config import tiny_config
from beach_seg_tpu.models.seggpt.model import SegGPT
from beach_seg_tpu.parallel.distributed import host_batch_slice
from beach_seg_tpu.parallel.mesh import make_mesh, param_sharding, put_batch, replicated
from beach_seg_tpu.train.prompt_tuner import PromptTuner

assert jax.process_count() == 2 and jax.device_count() == 8

cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
model = SegGPT(cfg)
h, w = cfg.image_size[0] // 2, cfg.image_size[1]
conf = BeachSegConfig(epochs=1, crop_size=h, inpt_size=h, batch_size=8, warmup_epochs=0)
rng = np.random.default_rng(0)
params = model.init(
    jax.random.PRNGKey(0),
    jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
)["params"]
pixels = jnp.asarray(rng.random((3, h, w, 3)), jnp.float32)
pmasks = jnp.asarray(rng.integers(0, 4, (3, h, w)), jnp.int32)
pnodata = jnp.zeros((3, h, w), bool)
full = {
    "image": rng.random((8, h, w, 3)).astype(np.float32),
    "mask": rng.integers(1, 4, (8, h, w)).astype(np.int32),
    "nodata": np.zeros((8, h, w), bool),
    "crop_idx": rng.integers(0, 3, (8,)).astype(np.int32),
}
lo, sz = host_batch_slice(conf.batch_size)
local = {k: v[lo : lo + sz] for k, v in full.items()}

mesh = make_mesh(data=8, model=1)
tuner = PromptTuner(model=model, conf=conf, num_prompts=3, steps_per_epoch=2)
with jax.sharding.set_mesh(mesh):
    params = jax.device_put(params, param_sharding(mesh, params))
    state = jax.device_put(tuner.init_state(pixels), replicated(mesh))
    pm = jax.device_put(pmasks, replicated(mesh))
    pn = jax.device_put(pnodata, replicated(mesh))
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        batch = put_batch(mesh, local)
        state, metrics = tuner.train_step(state, params, pm, pn, batch, key)
print(json.dumps({
    "process": jax.process_index(),
    "loss": float(metrics["loss"]),
    "confusion_sum": int(np.asarray(metrics["confusion"]).sum()),
    "pixels_sum": float(np.abs(np.asarray(state.prompt_pixels)).sum()),
}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    worker = WORKER.replace("__REPO__", str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, f"localhost:{port}", str(i)],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes see identical (replicated) results
    assert outs[0]["loss"] == outs[1]["loss"]
    assert outs[0]["confusion_sum"] == outs[1]["confusion_sum"]
    assert outs[0]["pixels_sum"] == outs[1]["pixels_sum"]

    # and they match the same computation run single-process on 8 devices
    import jax
    import jax.numpy as jnp

    from beach_seg_tpu.config import BeachSegConfig
    from beach_seg_tpu.models.seggpt.config import tiny_config
    from beach_seg_tpu.models.seggpt.model import SegGPT
    from beach_seg_tpu.parallel.mesh import make_mesh, param_sharding, put_batch, replicated
    from beach_seg_tpu.train.prompt_tuner import PromptTuner

    cfg = tiny_config(drop_path_rate=0.0, initializer_range=0.2)
    model = SegGPT(cfg)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    conf = BeachSegConfig(epochs=1, crop_size=h, inpt_size=h, batch_size=8, warmup_epochs=0)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
    )["params"]
    pixels = jnp.asarray(rng.random((3, h, w, 3)), jnp.float32)
    pmasks = jnp.asarray(rng.integers(0, 4, (3, h, w)), jnp.int32)
    pnodata = jnp.zeros((3, h, w), bool)
    full = {
        "image": rng.random((8, h, w, 3)).astype(np.float32),
        "mask": rng.integers(1, 4, (8, h, w)).astype(np.int32),
        "nodata": np.zeros((8, h, w), bool),
        "crop_idx": rng.integers(0, 3, (8,)).astype(np.int32),
    }
    mesh = make_mesh(data=8, model=1)
    tuner = PromptTuner(model=model, conf=conf, num_prompts=3, steps_per_epoch=2)
    with jax.sharding.set_mesh(mesh):
        params = jax.device_put(params, param_sharding(mesh, params))
        state = jax.device_put(tuner.init_state(pixels), replicated(mesh))
        pm = jax.device_put(pmasks, replicated(mesh))
        pn = jax.device_put(pnodata, replicated(mesh))
        key = jax.random.PRNGKey(7)
        for _ in range(2):
            batch = put_batch(mesh, full)
            state, metrics = tuner.train_step(state, params, pm, pn, batch, key)

    assert outs[0]["loss"] == pytest.approx(float(metrics["loss"]), rel=1e-5)
    assert outs[0]["confusion_sum"] == int(np.asarray(metrics["confusion"]).sum())
    assert outs[0]["pixels_sum"] == pytest.approx(
        float(np.abs(np.asarray(state.prompt_pixels)).sum()), rel=1e-6
    )

"""Multi-host initialization (SURVEY.md §2.13 — replaces torch.distributed).

On TPU pods each host process sees its local chips; ``maybe_initialize``
brings up the jax.distributed runtime when pod env vars are present (or when
forced via ``world_size > 1``), after which ``jax.devices()`` spans the slice
and the (data, model) mesh covers all chips. Data loading stays host-local:
``host_batch_slice`` gives each process its shard of the global batch
(the framework's analogue of the reference's NODE_RANK/num-workers split,
ref src/config.py:81-91, src/train.py:39-53).
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)

_POD_ENV_VARS = ("COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")


def maybe_initialize(world_size: int = 1, platform: str = "") -> None:
    """Initialize jax.distributed when running multi-process."""
    # every CLI funnels through here before touching devices — the right spot
    # to pin the platform (conf.platform: JAX_PLATFORMS is force-overridden
    # by sitecustomize on some hosts, so only jax.config works) and to arm
    # the persistent XLA compilation cache (cold ViT-L jit: minutes; cached:
    # ~20 ms). Must run before the first backend touch below.
    if platform:
        jax.config.update("jax_platforms", platform)
    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    if jax.process_count() > 1:
        return  # already initialized
    want = world_size > 1 or any(v in os.environ for v in _POD_ENV_VARS)
    if not want:
        return
    try:
        jax.distributed.initialize()
        logger.info(
            "jax.distributed up: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    except Exception as e:  # single-host fallback
        logger.warning("jax.distributed.initialize failed (%s); continuing single-host", e)


def host_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's rows in a globally-sharded batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return jax.process_index() * per, per

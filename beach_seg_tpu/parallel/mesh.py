"""Device mesh and sharding layout — the framework's parallelism substrate.

Replaces the reference's Lightning/torch.distributed plumbing (ref
/root/reference/src/train.py:97-107, SURVEY.md §2.13) with a
``jax.sharding.Mesh`` over two axes:

  - ``data``: shards the batch of shoreline crops/dates — the reference's
    natural scaling unit (thousands of independent 448×448 tiles). Gradient
    and metric reductions become XLA ``psum`` over this axis, riding ICI.
  - ``model``: reserved for tensor-parallel / FSDP sharding of the frozen
    307M-param backbone; size 1 for the flagship single-model runs.

Everything is expressed as NamedShardings handed to ``jax.jit`` — XLA inserts
the collectives; there is no hand-written NCCL/MPI analogue anywhere.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` → all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}×{model} needs more than the {n} available devices")
    # explicit sizes may use a prefix of the devices (debug/smoke meshes)
    return Mesh(devices.reshape(-1)[: data * model].reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over ``data`` — for crop/tile batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a host batch pytree with the leading axis on ``data``."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def put_batch(mesh: Mesh, tree: Any) -> Any:
    """Stage a batch pytree onto the mesh's data axis, multi-host aware.

    Single process: a plain sharded device_put of the full batch. Multi-host
    (TPU pods): each process passes ONLY ITS OWN rows (see
    ``distributed.host_batch_slice`` /  ``iterate_batches(row_slice=…)``) and
    the global array is assembled per-shard via
    ``jax.make_array_from_process_local_data`` — no host ever materializes or
    transfers rows it doesn't own (replaces the reference's DDP sampler split,
    ref /root/reference/src/train.py:97-107).
    """
    import numpy as np

    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        import jax.numpy as jnp

        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), s), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), tree
    )


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of ``k`` ≥ ``n`` (batches must divide the data axis)."""
    return -(-n // k) * k


_TP_RULES: tuple[tuple[str, ...], ...] = (
    # (param-path substring, partition spec) — first match wins. Column-parallel
    # qkv/lin1, row-parallel proj/lin2: the classic Megatron split, expressed as
    # sharding annotations only (XLA inserts the all-reduces).
    # qkv is stored (C, 3, C) with head-major output channels: sharding the
    # LAST dim gives each shard whole head blocks of q, k and v (the kernel
    # islands consume exactly that slice — ops/pallas_attn.fused_attention_qkv_rel)
    ("qkv_kernel", (None, None, MODEL_AXIS)),
    ("qkv_bias", (None, MODEL_AXIS)),
    ("lin1_kernel", (None, MODEL_AXIS)),
    ("lin1_bias", (MODEL_AXIS,)),
    ("proj_kernel", (MODEL_AXIS, None)),
    ("lin2_kernel", (MODEL_AXIS, None)),
    # decoder embed is the single largest matmul (4096 → p²·64); column-split
    ("embed_kernel", (None, MODEL_AXIS)),
    ("embed_bias", (MODEL_AXIS,)),
)


def param_sharding(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for the SegGPT params: TP over the ``model`` axis
    for the big encoder matmuls, replicated elsewhere.

    With ``model=1`` every spec degenerates to replication, so this is safe to
    apply unconditionally.
    """

    def spec_for(path: tuple) -> NamedSharding:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for needle, spec in _TP_RULES:
            if needle in name:
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(lambda p, _: spec_for(p), params)

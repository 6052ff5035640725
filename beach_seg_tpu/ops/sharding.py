"""Mesh-aware execution of Pallas kernels under multi-chip GSPMD programs.

GSPMD cannot partition Mosaic custom calls: any jit whose operands are sharded
over a real multi-device TPU mesh fails to compile with "Mosaic kernels cannot
be automatically partitioned" (verified by AOT-compiling the flagship forward
for a v5e:2x4 topology — the CPU-device test meshes never see this because
interpret-mode kernels lower to plain partitionable HLO). The fix is a
shard_map island around each kernel: the batch dimension is manually sharded
over the mesh's ``data`` axis, everything else is replicated, and the
surrounding program stays under GSPMD (which inserts any reshard needed at
the island boundary).

``data_sharded_call`` wraps a kernel-invoking function with that island when
a multi-device mesh is active (``jax.sharding.set_mesh`` — the engines enter
one); on a single device or with no mesh it is a straight call. If the batch
does not divide the data axis the wrapper pads it up to the next multiple
INSIDE the wrapper and slices the outputs back — emitting the kernel call
unwrapped would be exactly the unpartitionable program this module exists to
avoid. Padding happens in whole-batch units (``batch_unit``): callers whose
operands carry a fused ``batch*heads`` leading dim pass ``batch_unit=heads``
so a shard boundary never cuts through one batch element's heads (the packed
kernels reshape dim 0 by ``num_heads`` internally and would fail to trace on
a ragged shard).

TP note: islands can run tensor-parallel via ``model_dims``/``out_model_dim``
— the flagship attention island head-shards its grid over the ``model`` axis
(the (C, 3, C) qkv layout keeps whole q/k/v head blocks per shard) and the
MLP island runs the Megatron column/row split with an in-island psum; see
``fused_attention_qkv_rel`` / ``fused_ln_mlp``. Kernels that don't pass
``model_dims`` compute replicated under a model axis (an all-gather at the
island boundary). The pure-XLA reference paths (``attn_impl="reference"``,
fp32 modules) remain fully GSPMD-TP-partitionable.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _active_mesh():
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or mesh.size <= 1 or DATA_AXIS not in mesh.axis_names:
        return None
    return mesh


def _axis_size(mesh, name: str) -> int:
    if name not in mesh.axis_names:
        return 1
    return mesh.axis_sizes[mesh.axis_names.index(name)]


def model_axis_size() -> int:
    """Size of the active mesh's ``model`` axis — 1 when no mesh is set or
    the mesh would not be entered by ``data_sharded_call`` (callers use this
    to decide whether their island runs tensor-parallel)."""
    mesh = _active_mesh()
    if mesh is None:
        return 1
    return _axis_size(mesh, MODEL_AXIS)


def data_sharded_call(
    fn: Callable,
    args: Sequence,
    batched: Sequence[bool],
    out_batched: bool = True,
    batch_unit: int = 1,
    model_dims: Sequence[int | None] | None = None,
    out_model_dim: int | None = None,
):
    """Run ``fn(*args)`` inside a full-manual shard_map over the active mesh.

    ``batched[i]`` marks operands whose dim 0 is ``batch * unit_i`` (sharded
    over the ``data`` axis); the rest are replicated. Every batched operand
    must share the same logical batch; ``batch_unit`` is the unit of the
    SMALLEST batched dim 0 (e.g. ``num_heads`` when operands are (B·H, …)).
    Outputs' dim 0 must also be a multiple of the logical batch when
    ``out_batched``. Batches that do not divide the data axis are zero-padded
    up to the next multiple (whole batch elements) and the outputs sliced
    back — the kernels treat dim-0 rows independently, so padding rows are
    inert.

    Tensor parallelism: ``model_dims[i]`` (when the mesh has a ``model`` axis
    of size > 1) shards operand ``i``'s given dimension over that axis —
    ``fn`` sees the LOCAL slice and must produce either a model-sharded
    output (``out_model_dim`` names its sharded dim) or a model-invariant one
    (``out_model_dim=None`` — e.g. after an internal ``psum`` over
    ``MODEL_AXIS``). With model=1 (the flagship) every model spec degenerates
    to replication and ``fn`` sees full operands.
    """
    mesh = _active_mesh()
    if mesh is None:
        return fn(*args)
    n = _axis_size(mesh, DATA_AXIS)
    mp = _axis_size(mesh, MODEL_AXIS)
    if model_dims is None or mp <= 1:
        model_dims = (None,) * len(args)
        out_mdim = None
    else:
        out_mdim = out_model_dim
    sizes = sorted({a.shape[0] for a, b in zip(args, batched) if b})
    if not sizes:
        return fn(*args)
    b = sizes[0] // batch_unit  # logical batch
    assert b * batch_unit == sizes[0] and all(s % b == 0 for s in sizes), (
        f"batched dim0s {sizes} are not multiples of one logical batch "
        f"(batch_unit={batch_unit})"
    )
    pb = -(-b // n) * n  # padded logical batch

    def pad(a, is_b):
        if not is_b or pb == b:
            return a
        unit = a.shape[0] // b
        widths = [(0, (pb - b) * unit)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    def spec(isb, mdim, ndim):
        parts = [None] * ndim
        if isb:
            parts[0] = DATA_AXIS
        if mdim is not None:
            assert mdim != 0 or not isb, "dim 0 cannot carry both axes"
            parts[mdim] = MODEL_AXIS
        return P(*parts)

    padded = tuple(pad(a, isb) for a, isb in zip(args, batched))
    in_specs = tuple(
        spec(isb, mdim, a.ndim) for a, isb, mdim in zip(padded, batched, model_dims)
    )
    # prefix spec: dims past the last named one stay unsharded on every leaf
    out_specs = spec(out_batched, out_mdim, (out_mdim or 0) + 1)
    wrapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names=set(mesh.axis_names),
        check_vma=False,
    )
    out = wrapped(*padded)
    if pb != b and out_batched:
        # the sliced size no longer divides the data axis — pin the result to
        # replicated so GSPMD has a representable layout (rare path: only for
        # final ragged batches)
        out = jax.tree.map(
            lambda o: jax.lax.with_sharding_constraint(o[: (o.shape[0] // pb) * b], P()),
            out,
        )
    return out

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
does not divide the data axis the wrapper also falls back to the straight
call, preserving the (unsupported) status quo rather than miscomputing.

TP note: under a ``model`` axis the kernels compute replicated — entering the
island forces an all-gather of any model-sharded operand. The pure-XLA
reference paths (``attn_impl="reference"``, fp32 modules) remain fully
GSPMD-TP-partitionable.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"


def _active_mesh():
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or mesh.size <= 1 or DATA_AXIS not in mesh.axis_names:
        return None
    return mesh


def data_sharded_call(
    fn: Callable,
    args: Sequence,
    batched: Sequence[bool],
    out_batched: bool = True,
):
    """Run ``fn(*args)`` inside a full-manual shard_map over the active mesh.

    ``batched[i]`` marks operands whose dim 0 is the batch (sharded over the
    ``data`` axis); the rest are replicated. The output's dim 0 is batched
    when ``out_batched``.
    """
    mesh = _active_mesh()
    if mesh is None:
        return fn(*args)
    n = mesh.axis_sizes[mesh.axis_names.index(DATA_AXIS)]
    sizes = {a.shape[0] for a, b in zip(args, batched) if b}
    if any(s % n for s in sizes):
        return fn(*args)  # uneven batch: keep the pre-wrapper behavior
    in_specs = tuple(P(DATA_AXIS) if b else P() for b in batched)
    out_specs = P(DATA_AXIS) if out_batched else P()
    wrapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names=set(mesh.axis_names),
        check_vma=False,
    )
    return wrapped(*args)

"""On-device vote accumulation (SURVEY.md §3.2: "vote accumulation becomes an
on-device scatter-add").

The reference adds each crop's one-hot votes into a host numpy canvas
(predict.py:120-157), forcing a device→host transfer per crop. Here a whole
batch of crops scatter-adds into a scene-sized (H, W, C) int32 counter that
lives on the device; the canvas crosses to host once per date. Out-of-bounds
vote positions are dropped by the scatter (the accumulator's clipping
semantics), and int32 counters fix the reference's uint8 wraparound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, donate_argnums=0)
def scatter_votes(
    counter: jnp.ndarray,  # (H, W, C) int32
    one_hot: jnp.ndarray,  # (B, cs, cs, C) int
    xmins: jnp.ndarray,  # (B,) int32 — crop left edges (may be negative)
    ymins: jnp.ndarray,  # (B,) int32 — crop top edges
    valid: jnp.ndarray,  # (B,) bool — padded/skipped rows contribute nothing
) -> jnp.ndarray:
    b, cs, _, c = one_hot.shape
    iy = ymins[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (b, cs, cs), 1)
    ix = xmins[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (b, cs, cs), 2)
    votes = jnp.where(valid[:, None, None, None], one_hot.astype(jnp.int32), 0)
    # NEGATIVE indices wrap Python-style under jnp indexing — push them past
    # the array bound so mode="drop" discards them like positive overflow
    oob = (iy < 0) | (ix < 0)
    iy = jnp.where(oob, counter.shape[0], iy)
    ix = jnp.where(oob, counter.shape[1], ix)
    # out-of-bounds indices are dropped — the host accumulator's clipped paste
    return counter.at[iy, ix].add(votes, mode="drop")


def zero_counter(out_shape: tuple[int, int], num_classes: int) -> jnp.ndarray:
    return jnp.zeros((*out_shape, num_classes), jnp.int32)

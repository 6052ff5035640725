"""Device scatter-add votes ≡ the host accumulator's clipped pastes."""

import jax.numpy as jnp
import numpy as np

from beach_seg_tpu.infer.device_votes import scatter_votes, zero_counter


def _host_reference(out_shape, crops, one_hots, valid, num_classes):
    counter = np.zeros((*out_shape, num_classes), np.int32)
    h, w = out_shape
    for (xmin, ymin, xmax, ymax), oh, ok in zip(crops, one_hots, valid):
        if not ok:
            continue
        dy0, dy1 = max(ymin, 0), min(ymax, h)
        dx0, dx1 = max(xmin, 0), min(xmax, w)
        sy0, sx0 = dy0 - ymin, dx0 - xmin
        counter[dy0:dy1, dx0:dx1] += oh[sy0 : sy0 + (dy1 - dy0), sx0 : sx0 + (dx1 - dx0)]
    return counter


def test_scatter_votes_matches_host_clipped_paste():
    rng = np.random.default_rng(0)
    out_shape, cs, nc = (20, 30), 8, 4
    crops = [(-3, -2, 5, 6), (10, 5, 18, 13), (25, 15, 33, 23), (4, 4, 12, 12)]
    one_hots = rng.integers(0, 2, (len(crops), cs, cs, nc)).astype(np.int32)
    valid = np.array([True, True, True, False])

    expect = _host_reference(out_shape, crops, one_hots, valid, nc)
    counter = zero_counter(out_shape, nc)
    counter = scatter_votes(
        counter,
        jnp.asarray(one_hots),
        jnp.asarray([c[0] for c in crops], jnp.int32),
        jnp.asarray([c[1] for c in crops], jnp.int32),
        jnp.asarray(valid),
    )
    assert np.array_equal(np.asarray(counter), expect)


def test_scatter_votes_accumulates_overlaps():
    counter = zero_counter((10, 10), 4)
    oh = np.zeros((1, 6, 6, 4), np.int32)
    oh[..., 2] = 1
    for _ in range(3):
        counter = scatter_votes(
            counter, jnp.asarray(oh), jnp.asarray([2]), jnp.asarray([2]), jnp.asarray([True])
        )
    c = np.asarray(counter)
    assert c[4, 4, 2] == 3 and c[0, 0].sum() == 0

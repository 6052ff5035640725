"""Bug-for-bug compat switches vs the reference's actual behavior.

Each quirk the framework intentionally fixes also has a compat mode that
reproduces the reference exactly (needed for mask-level parity):
  - loss_variant="nodata_ref": the unsqueeze(1) broadcast in SegGptLoss
    (ref src/model.py:55-61) — validated here against a literal torch port;
  - rank_compat: the array-vs-string sort key in prompt ranking
    (ref src/predict_no_prompt.py:250);
  - epochs_compat: Trainer max_epochs = epochs × len(prompt_batch dict) = ×5
    (ref src/train.py:98).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from beach_seg_tpu.infer.zero_shot import rank_prompt_crops
from beach_seg_tpu.train.prompt_tuner import prompt_tune_loss, prompt_tune_loss_ref_compat


def _torch_ref_loss(pred_nchw, labels_nchw, yesdata, beta):
    """Literal port of the reference SegGptLoss.forward (src/model.py:45-64),
    including the unsqueeze(1) broadcast bug."""
    pred = torch.from_numpy(pred_nchw)
    labels = torch.from_numpy(labels_nchw)
    yes = torch.from_numpy(yesdata[:, None])  # (B,1,H,W) as the reference feeds it
    B, C, H2, W = pred.shape
    H = H2 // 2
    blank = torch.zeros((B, C, H, W), dtype=pred.dtype)
    label_mask = torch.concat([blank, labels], dim=2)
    keep_mask = torch.concat([blank, yes.expand((-1, C, -1, -1)).to(pred.dtype)], dim=2)
    loss = F.smooth_l1_loss(pred, label_mask, reduction="none", beta=beta)
    loss = loss * keep_mask.unsqueeze(1).to(loss.dtype)
    return float(loss.sum() / keep_mask.sum())


@pytest.mark.parametrize("b", [1, 3])
def test_ref_compat_loss_matches_torch_broadcast(b):
    rng = np.random.default_rng(0)
    h, w = 6, 4
    pred = rng.standard_normal((b, 2 * h, w, 3)).astype(np.float32)
    labels = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    yes = rng.random((b, h, w)) > 0.3
    ours = float(prompt_tune_loss_ref_compat(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(yes), beta=0.01
    ))
    ref = _torch_ref_loss(
        pred.transpose(0, 3, 1, 2), labels.transpose(0, 3, 1, 2), yes, beta=0.01
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_ref_compat_equals_intended_at_b1():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((1, 8, 4, 3)), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
    yes = jnp.asarray(rng.random((1, 4, 4)) > 0.3)
    a = float(prompt_tune_loss(pred, labels, yes, 0.01))
    b = float(prompt_tune_loss_ref_compat(pred, labels, yes, 0.01))
    assert a == pytest.approx(b, rel=1e-6)


def test_ref_compat_diverges_at_b2():
    """At B>1 the reference's broadcast mixes samples — the two losses must
    genuinely differ (this is WHY the compat switch exists)."""
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.standard_normal((2, 8, 4, 3)), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    yes = jnp.asarray(rng.random((2, 4, 4)) > 0.3)
    a = float(prompt_tune_loss(pred, labels, yes, 0.01))
    b = float(prompt_tune_loss_ref_compat(pred, labels, yes, 0.01))
    assert abs(a - b) > 1e-4


def test_ref_compat_loss_padding_invariance():
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((3, 8, 4, 3)).astype(np.float32)
    labels = rng.standard_normal((3, 4, 4, 3)).astype(np.float32)
    yes = rng.random((3, 4, 4)) > 0.3
    w = np.array([True, True, False])
    base = float(prompt_tune_loss_ref_compat(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(yes), 0.01, jnp.asarray(w)
    ))
    pred2, labels2 = pred.copy(), labels.copy()
    pred2[2] = 99.0
    labels2[2] = -7.0
    other = float(prompt_tune_loss_ref_compat(
        jnp.asarray(pred2), jnp.asarray(labels2), jnp.asarray(yes), 0.01, jnp.asarray(w)
    ))
    assert base == other


def test_rank_prompt_crops_intent_vs_compat():
    labels = [
        np.full((4, 4), 2, np.uint8),              # all non-sand → worst
        np.ones((4, 4), np.uint8),                 # all sand → best
        np.asarray([[1, 1], [2, 1]], np.uint8),    # one non-sand pixel
    ]
    intent = rank_prompt_crops(labels, rank_compat=False)
    assert list(intent) == [1, 2, 0]
    compat = rank_prompt_crops(labels, rank_compat=True)
    assert list(compat) == [0, 1, 2]  # the reference's tied sort = crop order


def test_rank_compat_reproduces_reference_expression():
    """The reference expression itself, evaluated: numpy collapses the
    array-vs-string compare to one scalar → all keys tie → argsort is the
    identity. Guard against numpy changing this semantic underneath us."""
    classes = ("nodata", "sand", "water", "veg")
    rng = np.random.default_rng(0)
    crop_labels = [rng.integers(0, 4, (4, 4)).astype(np.uint8) for _ in range(5)]
    with np.errstate(all="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            keys = [(cl != classes[1]).sum() for cl in crop_labels]
    ref_order = np.argsort(keys)
    assert list(ref_order) == list(rank_prompt_crops(crop_labels, rank_compat=True))

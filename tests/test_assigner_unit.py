"""Unit tests for task-aligned assignment edge cases (the golden test in
test_loss_parity pins aggregate behavior; these pin the tricky branches:
multi-GT conflicts, padded rows, empty images)."""
import numpy as np

import jax.numpy as jnp

from tpu_yolo.train.loss import build_padded_targets, task_aligned_assigner


def _assign(gt_boxes, gt_labels, scores_bias=None, a_grid=8, px=8.0):
    """Tiny synthetic problem: a_grid x a_grid anchors at stride `px`."""
    n = gt_boxes.shape[0]
    xs = (np.arange(a_grid) + 0.5) * px
    anchors = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    a = anchors.shape[0]
    nc = 4

    pd_scores = np.full((1, a, nc), 0.5, np.float32)
    if scores_bias is not None:
        pd_scores += scores_bias
    # predictions: every anchor predicts a box centered on itself
    wh = np.full((a, 2), px * 2, np.float32)
    pd_boxes = np.concatenate([anchors - wh / 2, anchors + wh / 2], -1)[None]

    tb, ts, fg = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes),
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(gt_labels.reshape(1, n, 1), jnp.float32),
        jnp.asarray(gt_boxes.reshape(1, n, 4), jnp.float32),
        jnp.asarray((gt_boxes.sum(-1) > 0).reshape(1, n, 1), jnp.float32),
        num_classes=nc)
    return np.asarray(tb)[0], np.asarray(ts)[0], np.asarray(fg)[0], anchors


def test_anchor_claimed_by_two_gts_goes_to_higher_iou():
    # two overlapping GTs; anchors in the overlap must take the larger-IoU GT
    gt = np.array([[8, 8, 40, 40], [24, 24, 56, 56]], np.float32)
    labels = np.array([0, 1], np.float32)
    tb, ts, fg, anchors = _assign(gt, labels)
    assert fg.any()
    for i in np.nonzero(fg)[0]:
        box = tb[i]
        assert any(np.allclose(box, g) for g in gt), box
        # the assigned GT must contain the anchor center
        ax, ay = anchors[i]
        assert box[0] < ax < box[2] and box[1] < ay < box[3]


def test_padded_rows_never_assigned():
    gt = np.array([[8, 8, 40, 40], [0, 0, 0, 0], [0, 0, 0, 0]], np.float32)
    labels = np.array([2, 0, 0], np.float32)
    tb, ts, fg, _ = _assign(gt, labels)
    assert fg.any()
    # every foreground target is the single real box, class 2
    for i in np.nonzero(fg)[0]:
        np.testing.assert_allclose(tb[i], gt[0])
        assert ts[i].argmax() == 2
    # background anchors get zero target scores
    assert (ts[~fg] == 0).all()


def test_empty_image_all_background():
    gt = np.zeros((2, 4), np.float32)
    labels = np.zeros(2, np.float32)
    _, ts, fg, _ = _assign(gt, labels)
    assert not fg.any()
    assert (ts == 0).all()


def test_build_padded_targets_layout():
    targets = {
        "cls": np.array([[1.0], [3.0], [2.0]], np.float32),
        "box": np.array([[0.5, 0.5, 0.25, 0.25],
                         [0.25, 0.25, 0.1, 0.1],
                         [0.75, 0.75, 0.2, 0.2]], np.float32),
        "idx": np.array([0, 0, 2], np.float32),
    }
    out = build_padded_targets(targets, batch_size=3, max_gt=4,
                               input_hw=(100, 200))
    assert out.shape == (3, 4, 5)
    # image 0: two boxes in pixel xyxy (w=200, h=100)
    np.testing.assert_allclose(out[0, 0], [1, 75, 37.5, 125, 62.5])
    np.testing.assert_allclose(out[0, 1], [3, 40, 20, 60, 30])
    assert (out[0, 2:] == 0).all()
    assert (out[1] == 0).all()        # image 1 empty
    np.testing.assert_allclose(out[2, 0, 0], 2)

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


def test_build_padded_targets_truncates_overflow():
    """The --gt-bucket overflow contract (train/trainer.py): an image
    with more boxes than the fixed bucket keeps its FIRST max_gt rows
    (dataset order) and silently drops the rest; other images are
    unaffected."""
    n = 6
    targets = {
        "cls": np.arange(n, dtype=np.float32).reshape(-1, 1),
        "box": np.tile(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
                       (n, 1)),
        "idx": np.array([0, 0, 0, 0, 0, 1], np.float32),
    }
    out = build_padded_targets(targets, batch_size=2, max_gt=3,
                               input_hw=(100, 100))
    assert out.shape == (2, 3, 5)
    np.testing.assert_allclose(out[0, :, 0], [0, 1, 2])   # first 3 kept
    assert (out[0, :, 3:] > 0).all()                       # real boxes
    np.testing.assert_allclose(out[1, 0, 0], 5)            # image 1 intact
    assert (out[1, 1:] == 0).all()


def test_chunked_assignment_identical():
    """Above the element budget the assigner lax.maps over image chunks
    (train/loss.py ASSIGN_ELEM_BUDGET); results must be bit-identical to
    the unchunked path. Exercised here by forcing a tiny budget on a
    multi-image problem, including an empty image and padded rows."""
    rng = np.random.default_rng(0)
    b, n, a_grid, nc = 6, 8, 8, 4
    px = 8.0
    xs = (np.arange(a_grid) + 0.5) * px
    anchors = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    a = anchors.shape[0]

    pd_scores = rng.uniform(0, 1, (b, a, nc)).astype(np.float32)
    centers = rng.uniform(8, 56, (b, a, 2)).astype(np.float32)
    wh = rng.uniform(8, 32, (b, a, 2)).astype(np.float32)
    pd_boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)

    gt = np.zeros((b, n, 5), np.float32)
    for i in range(b - 1):  # last image stays empty
        cnt = int(rng.integers(1, n + 1))
        xy1 = rng.uniform(0, 40, (cnt, 2))
        sz = rng.uniform(8, 24, (cnt, 2))
        gt[i, :cnt, 0] = rng.integers(0, nc, cnt)
        gt[i, :cnt, 1:3] = xy1
        gt[i, :cnt, 3:5] = xy1 + sz
    args = (jnp.asarray(pd_scores), jnp.asarray(pd_boxes),
            jnp.asarray(anchors, jnp.float32),
            jnp.asarray(gt[..., :1]), jnp.asarray(gt[..., 1:5]),
            jnp.asarray((gt[..., 1:5].sum(-1, keepdims=True) > 0),
                        jnp.float32))

    ref_tb, ref_ts, ref_fg = task_aligned_assigner(*args, num_classes=nc)
    # budget of one image's elements -> chunk size 1; also try chunk 2/3
    for budget in (n * a, 2 * n * a, 3 * n * a):
        tb, ts, fg = task_aligned_assigner(*args, num_classes=nc,
                                           elem_budget=budget)
        # assignment decisions are exact; target_scores may differ by
        # fusion-order rounding in the norm product (~1e-7 relative)
        np.testing.assert_array_equal(np.asarray(ref_tb), np.asarray(tb))
        np.testing.assert_array_equal(np.asarray(ref_fg), np.asarray(fg))
        np.testing.assert_allclose(np.asarray(ref_ts), np.asarray(ts),
                                   rtol=1e-4, atol=1e-8)


def test_512_gt_bucket_runs():
    """The round-1 memory cliff case compiles and runs chunked (tiny
    anchor grid here; the chunking logic is what's under test — the
    element budget is forced below one image's plane)."""
    b, n = 4, 512
    gt = np.zeros((b, n, 5), np.float32)
    gt[:, 0] = [1, 8, 8, 40, 40]
    xs = (np.arange(8) + 0.5) * 8.0
    anchors = np.stack(np.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    a = anchors.shape[0]
    pd_scores = np.full((b, a, 4), 0.5, np.float32)
    wh = np.full((a, 2), 16.0, np.float32)
    pd_boxes = np.concatenate([anchors - wh / 2, anchors + wh / 2],
                              -1)[None].repeat(b, 0)
    tb, ts, fg = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes),
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(gt[..., :1]), jnp.asarray(gt[..., 1:5]),
        jnp.asarray((gt[..., 1:5].sum(-1, keepdims=True) > 0), jnp.float32),
        num_classes=4, elem_budget=n * a)
    assert fg.shape == (b, a) and bool(np.asarray(fg).any())

"""Golden parity: task-aligned assigner and full detection loss."""
import numpy as np
import pytest

from conftest import load_golden


def test_assigner_golden():
    import jax.numpy as jnp

    from tpu_yolo.train.loss import task_aligned_assigner

    g = load_golden("assigner.npz")
    tb, ts, fg = task_aligned_assigner(
        jnp.asarray(g["pd_scores"]), jnp.asarray(g["pd_boxes"]),
        jnp.asarray(g["anc"]), jnp.asarray(g["gt_labels"]),
        jnp.asarray(g["gt_boxes"]), jnp.asarray(g["mask_gt"]),
        num_classes=80)

    assert (np.asarray(fg) == g["fg_mask"].astype(bool)).all()
    # target boxes only matter at foreground anchors
    fg_ref = g["fg_mask"].astype(bool)
    assert np.abs(np.asarray(tb)[fg_ref] - g["target_bboxes"][fg_ref]).max() < 1e-4
    assert np.abs(np.asarray(ts) - g["target_scores"]).max() < 1e-5


@pytest.mark.slow
def test_full_loss_golden():
    """End-to-end loss on reference train maps + synthetic targets."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.train.loss import build_padded_targets, detection_loss

    g = load_golden("model_n.npz")
    gl = load_golden("loss.npz")
    cfg = get_model_config("n")

    maps = [jnp.asarray(np.transpose(g[f"train_out_{i}"], (0, 2, 3, 1)))
            for i in range(3)]
    targets = {"idx": gl["idx"], "cls": gl["cls"], "box": gl["box"]}
    gt = build_padded_targets(targets, batch_size=2, max_gt=8, input_hw=(256, 256))

    hyp = {"box": 7.5, "cls": 0.5, "dfl": 1.5}
    lb, lc, ld = detection_loss(maps, jnp.asarray(gt), hyp, cfg)

    assert abs(float(lb) - float(gl["loss_box"])) < 2e-3 * max(1, float(gl["loss_box"]))
    assert abs(float(lc) - float(gl["loss_cls"])) < 2e-3 * max(1, float(gl["loss_cls"]))
    assert abs(float(ld) - float(gl["loss_dfl"])) < 2e-3 * max(1, float(gl["loss_dfl"]))

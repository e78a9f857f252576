"""Golden parity for post-processing ops: CIoU, NMS, TP matching, mAP."""
import numpy as np

from conftest import load_golden


def test_ciou():
    import jax.numpy as jnp

    from tpu_yolo.ops.boxes import ciou

    g = load_golden("ciou.npz")
    mine = np.asarray(ciou(jnp.asarray(g["b1"]), jnp.asarray(g["b2"])))
    assert np.abs(mine - g["ciou"]).max() < 1e-5


def test_nms_synthetic_exact():
    """Candidate budget covers every candidate -> selection must equal the
    reference's torchvision-semantics NMS box for box."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms, nms_to_numpy

    g = load_golden("nms.npz")
    synth = g["synth"]                      # (1, 84, A) reference layout
    preds = jnp.asarray(np.transpose(synth, (0, 2, 1)))  # (1, A, 84)
    res = batched_nms(preds, max_nms=synth.shape[2] * 80)
    res = {k: np.asarray(v) for k, v in res.items()}
    mine = nms_to_numpy(res, 0)
    ref = g["synth_det"]

    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    assert np.abs(mine[:, :4] - ref[:, :4]).max() < 1e-3   # boxes
    assert np.abs(mine[:, 4] - ref[:, 4]).max() < 1e-6     # scores
    assert (mine[:, 5] == ref[:, 5]).all()                  # classes


def test_pregated_ranking_matches_flat():
    """The per-anchor candidate pre-gate (ops/nms.py
    _rank_candidates_pregated) is bit-identical to the flat top-k
    ranking — including under dense exact score ties across anchors and
    classes (scores quantized to 12 levels), the case the tie-breaking
    theorem in its docstring covers."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms

    rng = np.random.default_rng(7)
    b, a, nc = 3, 512, 16
    cxy = rng.uniform(40, 600, (b, a, 2))
    wh = rng.uniform(8, 120, (b, a, 2))
    # 12 score levels over 512 anchors x 16 classes: every level ties
    # hundreds of candidates, many straddling the K=128 cut
    scores = rng.integers(0, 12, (b, a, nc)).astype(np.float32) / 12.0
    preds = jnp.asarray(np.concatenate([cxy, wh, scores], -1),
                        jnp.float32)

    for ranking in ("exact", "approx"):  # approx == exact off-TPU
        res_p = batched_nms(preds, max_nms=128, ranking=ranking,
                            pregate=True)
        res_f = batched_nms(preds, max_nms=128, ranking=ranking,
                            pregate=False)
        for key in ("boxes", "scores", "classes", "valid", "count"):
            np.testing.assert_array_equal(
                np.asarray(res_p[key]), np.asarray(res_f[key]),
                err_msg=f"{ranking}/{key}")


def test_single_label_nms_matches_zeroed_multilabel():
    """multi_label=False (one candidate per anchor, its argmax class —
    ops/nms.py::_rank_candidates_singlelabel) is equivalent to running
    the multi-label path on predictions whose non-argmax class scores
    are zeroed: with K = A every positive argmax entry outranks every
    zeroed entry, and cross-anchor ties order by flat index a*nc + c,
    which restricted to one candidate per anchor is exactly the
    single-label (score desc, anchor asc) order."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms

    rng = np.random.default_rng(11)
    b, a, nc = 3, 256, 16
    cxy = rng.uniform(40, 600, (b, a, 2))
    wh = rng.uniform(8, 120, (b, a, 2))
    # quantized scores: dense cross-anchor ties (the tie-break clause)
    scores = rng.integers(1, 12, (b, a, nc)).astype(np.float32) / 12.0

    zeroed = np.zeros_like(scores)
    am = scores.argmax(-1)
    ix = np.indices(am.shape)
    zeroed[ix[0], ix[1], am] = scores[ix[0], ix[1], am]

    preds = jnp.asarray(np.concatenate([cxy, wh, scores], -1), jnp.float32)
    preds_z = jnp.asarray(np.concatenate([cxy, wh, zeroed], -1),
                          jnp.float32)

    res_s = batched_nms(preds, max_nms=a, multi_label=False)
    res_o = batched_nms(preds_z, max_nms=a, multi_label=True,
                        pregate=False)
    for key in ("boxes", "scores", "classes", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(res_s[key]), np.asarray(res_o[key]), err_msg=key)


def test_single_label_fused_matches_two_stage():
    """nms_from_raw(multi_label=False) — ranking raw bf16 logits — picks
    the same detections as batched_nms(decode_predictions(raw),
    multi_label=False): sigmoid is strictly increasing and bf16 -> f32
    a monotone injection, so argmax class and anchor ranking agree."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.models import yolov11
    from tpu_yolo.ops.nms import batched_nms, nms_from_raw

    cfg = get_model_config("n")
    params = yolov11.init_params(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 128, 128, 3))
    raw = yolov11.forward_raw(params, x, cfg)
    hw = (128, 128)

    res_f = nms_from_raw(raw, cfg, hw, max_nms=256, multi_label=False)
    preds = yolov11.decode_predictions(raw, cfg, hw)
    res_t = batched_nms(preds, max_nms=256, multi_label=False)

    np.testing.assert_array_equal(np.asarray(res_f["count"]),
                                  np.asarray(res_t["count"]))
    v = np.asarray(res_f["valid"])
    np.testing.assert_array_equal(v, np.asarray(res_t["valid"]))
    np.testing.assert_array_equal(np.asarray(res_f["classes"])[v],
                                  np.asarray(res_t["classes"])[v])
    np.testing.assert_allclose(np.asarray(res_f["boxes"])[v],
                               np.asarray(res_t["boxes"])[v],
                               rtol=1e-5, atol=1e-3)


def test_nms_model_outputs():
    """NMS on real (random-weight) model outputs matches the reference
    pipeline output."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms, nms_to_numpy

    g = load_golden("nms.npz")
    outputs = g["outputs"]                  # (2, 84, A)
    preds = jnp.asarray(np.transpose(outputs, (0, 2, 1)))
    res = batched_nms(preds, max_nms=outputs.shape[2] * 80)
    res = {k: np.asarray(v) for k, v in res.items()}
    for i in range(outputs.shape[0]):
        ref = g[f"det_{i}"]
        mine = nms_to_numpy(res, i)
        assert mine.shape == ref.shape, (i, mine.shape, ref.shape)
        if len(ref):
            assert np.abs(mine[:, :4] - ref[:, :4]).max() < 1e-2
            assert np.abs(mine[:, 4] - ref[:, 4]).max() < 1e-5
            assert (mine[:, 5] == ref[:, 5]).all()


def test_match_predictions():
    from tpu_yolo.eval.metrics import match_predictions

    g = load_golden("metrics.npz")
    mine = match_predictions(g["output"][:, :6], g["target"], g["iou_v"])
    assert (mine == g["correct"]).all()


def test_average_precision():
    from tpu_yolo.eval.metrics import average_precision

    g = load_golden("metrics.npz")
    res = average_precision(g["correct"].copy(), g["conf"].copy(),
                            g["pred_cls"].copy(), g["target_cls"].copy())
    assert abs(res["precision"] - g["m_pre"]) < 1e-9
    assert abs(res["recall"] - g["m_rec"]) < 1e-9
    assert abs(res["map50"] - g["map50"]) < 1e-9
    assert abs(res["map"] - g["mean_ap"]) < 1e-9


def test_fused_nms_matches_two_stage():
    """forward_nms (fused decode+NMS) == batched_nms(decode_predictions)."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import ModelConfig
    from tpu_yolo.models import yolov11
    from tpu_yolo.ops.nms import batched_nms

    cfg = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                      csp=(False, True), num_classes=8)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))

    two = batched_nms(yolov11.forward(params, x, cfg, train=False),
                      conf_thres=1e-6)
    fused = yolov11.forward_nms(params, x, cfg, conf_thres=1e-6)

    assert (np.asarray(two["count"]) == np.asarray(fused["count"])).all()
    n = int(two["count"][0])
    for key, tol in (("boxes", 1e-3), ("scores", 1e-5)):
        a, b = np.asarray(two[key]), np.asarray(fused[key])
        assert np.abs(a - b).max() < tol, key
    assert (np.asarray(two["classes"]) == np.asarray(fused["classes"])).all()


def test_nms_from_raw_matches_two_stage():
    """The decode-after-top-k variant (nms_from_raw) == decode-all +
    batched_nms on the same raw maps."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import ModelConfig
    from tpu_yolo.models import yolov11
    from tpu_yolo.ops.nms import batched_nms, nms_from_raw
    from tpu_yolo.ops.nn import Context

    cfg = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                      csp=(False, True), num_classes=8)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))
    raw = yolov11.forward_raw(params, x, cfg, Context(train=False))

    two = batched_nms(yolov11.decode_predictions(raw, cfg, (96, 96)),
                      conf_thres=1e-6)
    fused = nms_from_raw(raw, cfg, (96, 96), conf_thres=1e-6)

    assert (np.asarray(two["count"]) == np.asarray(fused["count"])).all()
    np.testing.assert_allclose(np.asarray(two["boxes"]),
                               np.asarray(fused["boxes"]), rtol=1e-4, atol=1e-3)
    assert (np.asarray(two["classes"]) == np.asarray(fused["classes"])).all()

    # the pregated from_raw path (k < A forces the pre-gate; ranks bf16
    # logits directly) selects identically to the flat f32 ranking
    gated = nms_from_raw(raw, cfg, (96, 96), conf_thres=1e-6,
                         max_nms=64, pregate=True)
    flat = nms_from_raw(raw, cfg, (96, 96), conf_thres=1e-6,
                        max_nms=64, pregate=False)
    for key in ("boxes", "scores", "classes", "valid", "count"):
        np.testing.assert_array_equal(np.asarray(gated[key]),
                                      np.asarray(flat[key]), err_msg=key)


def test_tiled_greedy_keep_matches_single_block():
    """Block-decomposed suppression (tiles=2) is bit-identical to the
    one-block triangular fixpoint at serving-scale K, on scenes with
    dense same-class overlap clusters (the regime where suppression
    chains actually cross the tile boundary)."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import _greedy_keep

    rng = np.random.default_rng(7)
    for k in (1024, 2048):
        n_clusters = k // 8
        centers = rng.uniform(40, 600, (2, n_clusters, 2))
        reps = np.repeat(centers, 8, axis=1)          # (2, k, 2)
        jitter = rng.normal(0, 4.0, reps.shape)
        wh = rng.uniform(20, 60, (2, k, 2))
        xy = reps + jitter
        boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        cls_idx = rng.integers(0, 3, (2, k))
        valid = rng.uniform(size=(2, k)) > 0.05

        b = jnp.asarray(boxes, jnp.float32)
        c = jnp.asarray(cls_idx, jnp.int32)
        v = jnp.asarray(valid)
        tiled = np.asarray(_greedy_keep(b, c, v, iou_thres=0.45, tiles=2))
        single = np.asarray(_greedy_keep(b, c, v, iou_thres=0.45, tiles=1))
        assert (tiled == single).all(), k

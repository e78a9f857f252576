"""COCO-protocol evaluator (eval/coco_eval.py): hand-computed protocol
cases (pycocotools is not available in this image — the protocol itself
is the oracle) plus the original-space geometry inversion."""
import numpy as np

from tpu_yolo.eval.coco_eval import AREA_RNG, CocoEvaluator, summarize


def _det(x1, y1, x2, y2, conf, cls):
    return [x1, y1, x2, y2, conf, cls]


def _gt(cls, x1, y1, x2, y2):
    return [cls, x1, y1, x2, y2]


class TestProtocol:
    def test_perfect_match(self):
        ev = CocoEvaluator()
        ev.add_image([_det(10, 10, 60, 60, 0.9, 0)],
                     [_gt(0, 10, 10, 60, 60)])
        r = ev.accumulate()
        assert r["AP"] == 1.0 and r["AP50"] == 1.0 and r["AP75"] == 1.0
        assert r["AR@100"] == 1.0 and r["AR@1"] == 1.0
        # 50x50 = 2500 px^2 -> medium bucket only
        assert r["AP_medium"] == 1.0
        assert r["AP_small"] == -1.0 and r["AP_large"] == -1.0

    def test_iou_060_passes_three_thresholds(self):
        # inter 6000 / union 10000 = IoU 0.6 exactly: TP at 0.50/0.55/0.60
        ev = CocoEvaluator()
        ev.add_image([_det(0, 0, 100, 60, 0.9, 0)],
                     [_gt(0, 0, 0, 100, 100)])
        r = ev.accumulate()
        np.testing.assert_allclose(r["AP"], 0.3)
        np.testing.assert_allclose(r["AR@100"], 0.3)
        assert r["AP50"] == 1.0 and r["AP75"] == 0.0

    def test_max_dets_truncation(self):
        # high-score FP + low-score TP: AR@1 sees only the FP
        ev = CocoEvaluator()
        ev.add_image(
            [_det(500, 500, 600, 600, 0.9, 0),   # FP (no gt there)
             _det(0, 0, 100, 100, 0.5, 0)],      # TP (IoU 1)
            [_gt(0, 0, 0, 100, 100)])
        r = ev.accumulate()
        assert r["AR@1"] == 0.0
        assert r["AR@10"] == 1.0 and r["AR@100"] == 1.0
        np.testing.assert_allclose(r["AP"], 0.5)

    def test_out_of_range_det_is_ignored_not_fp(self):
        # Small bucket: the unmatched LARGE detection must be ignored
        # (not an FP), so AP_small stays 1.0.
        ev = CocoEvaluator()
        ev.add_image(
            [_det(300, 300, 500, 500, 0.95, 0),  # 200x200, unmatched
             _det(0, 0, 20, 20, 0.5, 0)],        # small TP
            [_gt(0, 0, 0, 20, 20)])
        r = ev.accumulate()
        assert r["AP_small"] == 1.0 and r["AR_small"] == 1.0
        # in the "all" bucket that same detection IS an FP ranked first
        np.testing.assert_allclose(r["AP"], 0.5)

    def test_ignored_gt_match_costs_nothing(self):
        # In the small bucket the large GT is IGNORE: a det matched to
        # it is neither TP nor FP there, while the small pair still
        # scores 1.0.
        ev = CocoEvaluator()
        ev.add_image(
            [_det(300, 300, 500, 500, 0.95, 0),  # matches large gt
             _det(0, 0, 20, 20, 0.5, 0)],
            [_gt(0, 300, 300, 500, 500), _gt(0, 0, 0, 20, 20)])
        r = ev.accumulate()
        assert r["AP_small"] == 1.0
        assert r["AP_large"] == 1.0
        assert r["AP"] == 1.0

    def test_class_averaging_and_separation(self):
        # class 0 perfect, class 1 detected with the wrong class -> 0;
        # AP averages the two
        ev = CocoEvaluator()
        ev.add_image([_det(0, 0, 50, 50, 0.9, 0),
                      _det(100, 100, 150, 150, 0.9, 3)],
                     [_gt(0, 0, 0, 50, 50), _gt(1, 100, 100, 150, 150)])
        r = ev.accumulate()
        # protocol: a class with no GT anywhere has undefined AP and is
        # EXCLUDED from the mean (pycocotools precision=-1), so the FP
        # of class 3 does not drag the average — only class 1's miss
        np.testing.assert_allclose(r["AP"], (1.0 + 0.0) / 2)
        assert r["ap_per_class"][0] == 1.0
        assert r["ap_per_class"][1] == 0.0   # missed
        assert r["ap_per_class"][3] == -1.0  # no GT: undefined

    def test_greedy_prefers_higher_iou_gt(self):
        # one det overlapping two gts: must claim the higher-IoU one,
        # leaving the other unmatched
        ev = CocoEvaluator()
        # IoUs 0.91 / 0.6 — off the 0.90 threshold boundary, which in
        # the protocol is linspace-derived (0.9000000000000002: an
        # exactly-0.9 overlap does NOT match there, in pycocotools too)
        ev.add_image([_det(0, 0, 100, 100, 0.9, 0)],
                     [_gt(0, 0, 0, 100, 91),
                      _gt(0, 0, 0, 100, 60)])
        r = ev.accumulate()
        # claims the 0.91 gt at thresholds 0.50..0.90 (9 of 10), the
        # other gt stays unmatched: AR = (9 * 0.5 + 0) / 10
        np.testing.assert_allclose(r["AR@100"], 0.45)

    def test_score_order_across_images(self):
        # global ranking: image-2 FP at 0.8 ranks between image-1's TPs
        # (0.9) and image-2's TP (0.7): PR curve [1, 1/2, 2/3]
        ev = CocoEvaluator()
        ev.add_image([_det(0, 0, 50, 50, 0.9, 0)], [_gt(0, 0, 0, 50, 50)])
        ev.add_image([_det(500, 0, 550, 50, 0.8, 0),
                      _det(0, 0, 50, 50, 0.7, 0)],
                     [_gt(0, 0, 0, 50, 50)])
        r = ev.accumulate()
        # envelope: recalls [.5, .5, 1.0], precisions [1, .5, 2/3]
        # -> monotone [1, 2/3, 2/3]; AP = mean over 101 recall points:
        # rt <= 0.5 -> 1.0 (51 pts), rt > 0.5 -> 2/3 (50 pts)
        want = (51 * 1.0 + 50 * 2 / 3) / 101
        np.testing.assert_allclose(r["AP"], want, rtol=1e-9)

    def test_empty_images(self):
        ev = CocoEvaluator()
        ev.add_image(np.zeros((0, 6)), [_gt(0, 0, 0, 50, 50)])
        ev.add_image([_det(0, 0, 50, 50, 0.9, 0)], np.zeros((0, 5)))
        r = ev.accumulate()
        assert r["AP"] == 0.0 and r["AR@100"] == 0.0

    def test_summarize_format(self):
        ev = CocoEvaluator()
        ev.add_image([_det(10, 10, 60, 60, 0.9, 0)],
                     [_gt(0, 10, 10, 60, 60)])
        text = summarize(ev.accumulate())
        lines = text.splitlines()
        assert len(lines) == 12
        assert "IoU=0.50:0.95 | area=   all | maxDets=100 ] = 1.000" in lines[0]
        assert lines[6].startswith(" Average Recall")

    def test_area_rng_constants(self):
        assert AREA_RNG["small"][1] == 32.0 ** 2
        assert AREA_RNG["medium"] == (32.0 ** 2, 96.0 ** 2)


class TestGeometry:
    def test_eval_geometry_matches_dataset_mapping(self):
        """eval_geometry must reproduce the dataset's GT letterbox
        mapping (load_image prescale + letterbox + denorm) exactly."""
        from tpu_yolo.data.augment import denorm_corners
        from tpu_yolo.data.image import eval_geometry, letterbox

        rng = np.random.default_rng(0)
        for oh, ow in [(480, 640), (800, 500), (1024, 1024), (300, 900),
                       (211, 377)]:
            size = 640
            img = rng.integers(0, 256, (oh, ow, 3), np.uint8)
            # the dataset path: prescale long side to `size`, letterbox
            r1 = size / max(oh, ow)
            if r1 != 1:
                import cv2
                img = cv2.resize(img, (int(ow * r1), int(oh * r1)),
                                 interpolation=cv2.INTER_LINEAR)
            h1, w1 = img.shape[:2]
            _, ratio, pad = letterbox(img, size, augment=False)

            norm = rng.random((5, 4)) * [0.5, 0.5, 0.4, 0.4] + \
                [0.25, 0.25, 0.05, 0.05]
            lb = denorm_corners(norm.astype(np.float32), ratio[0] * w1,
                                ratio[1] * h1, pad[0], pad[1])

            (gx, gy), (pw, ph) = eval_geometry((oh, ow), size)
            px = norm * [ow, oh, ow, oh]
            orig = np.concatenate([px[:, :2] - px[:, 2:] / 2,
                                   px[:, :2] + px[:, 2:] / 2], axis=1)
            lb2 = orig * [gx, gy, gx, gy] + [pw, ph, pw, ph]
            np.testing.assert_allclose(lb2, lb, atol=1e-3)

            # and the inverse un-letterboxes detections back
            back = (lb2 - [pw, ph, pw, ph]) / [gx, gy, gx, gy]
            np.testing.assert_allclose(back, orig, atol=1e-3)

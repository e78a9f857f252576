"""The roofline's conv records are exact, not estimates: every conv in
the traced graph is captured with its real shapes (Context.note_conv),
and the FLOP formula reproduces hand-computed values for known layers
(VERDICT r3 item 1 instrumentation; reference backbone nets/nn.py:151-189)."""
import numpy as np

from tools.roofline import conv_cost, stage_of, trace_convs


def test_stem_flops_exact():
    recs = trace_convs("n", 640, 8)
    stem = [r for r in recs if r["path"] == "net/p1/0"]
    assert len(stem) == 1
    f, by = conv_cost(stem[0], train=False)
    # 3x3 s2 conv 3->16 @ 640: 2 * B * 320*320 * 16 * 3*3*3
    assert f == 2 * 8 * 320 * 320 * 16 * 27
    # bf16 in + out + w
    assert by == 2 * (8 * 640 * 640 * 3 + 8 * 320 * 320 * 16 + 27 * 16)


def test_every_stage_covered_and_hbm_bound():
    recs = trace_convs("n", 640, 128)
    stages = {stage_of(r["path"]) for r in recs}
    for s in ["net/p1", "net/p2", "net/p3", "net/p4", "net/p5",
              "fpn/h1", "fpn/h2", "fpn/h3", "fpn/h4", "fpn/h5", "fpn/h6",
              "head/P3", "head/P4", "head/P5"]:
        assert s in stages, s
    tot_f = tot_b = 0
    for r in recs:
        f, by = conv_cost(r, train=False)
        assert f > 0 and by > 0
        tot_f += f
        tot_b += by
    # v11-n is ~6.5 GFLOP/img at 640 (reference profile table); conv-only
    # analytic lands just below
    per_img = tot_f / 128 / 1e9
    assert 5.5 < per_img < 7.5, per_img
    # the documented architectural property: intensity below the v5e
    # ridge point (197e12 / 819e9 ~ 241 FLOP/B) -> HBM-bound
    assert tot_f / tot_b < 241


def test_train_cost_exceeds_inference():
    recs = trace_convs("n", 640, 8)
    f_inf = sum(conv_cost(r, False)[0] for r in recs)
    f_tr = sum(conv_cost(r, True)[0] for r in recs)
    b_inf = sum(conv_cost(r, False)[1] for r in recs)
    b_tr = sum(conv_cost(r, True)[1] for r in recs)
    assert f_tr == 3 * f_inf          # dx + dw passes
    assert b_tr > 2.5 * b_inf         # unfolded BN + backward traffic


def test_dot_records_attention():
    recs = trace_convs("n", 640, 8)
    dots = [r for r in recs if r["kind"] == "dot"]
    assert len(dots) == 1             # one PSA attention at P5
    assert dots[0]["path"] == "net/p5/3/m/0/attn/attn"
    assert dots[0]["flops"] > 0

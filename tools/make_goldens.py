"""Generate golden-parity fixtures from the reference implementation.

Runs the PyTorch reference at /root/reference (read-only) on seeded
random weights/inputs and saves inputs + outputs as .npz files under
tests/golden/. The JAX framework's tests compare against these fixtures
only — they never import the reference — so the test suite is
self-contained once the fixtures are committed.

torchvision is not installed in this image; reference utils/util.py
imports it for ops.nms, so we register an equivalent-semantics stub
(greedy IoU NMS, keep while IoU <= threshold) before importing.

Usage: python tools/make_goldens.py [outdir]
"""
import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden")


def _nms_stub(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics: greedy by score, suppress IoU > thr."""
    boxes = boxes.detach().cpu().numpy()
    scores = scores.detach().cpu().numpy()
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter + 1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.int64)


def install_stubs():
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = _nms_stub
    tv.ops = tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, REF)


def save(name, **arrays):
    path = os.path.join(OUT, name)
    np.savez_compressed(path, **arrays)
    size = os.path.getsize(path) / 1e6
    print(f"wrote {path} ({size:.2f} MB, {len(arrays)} arrays)")


def quantize16(leaves, base=None):
    """Per-leaf symmetric int16 quantization for bulky golden sections.

    Float leaves become int16 codes plus one f32 scale per leaf
    (scale = max|value|/32767; values are deltas vs `base` when given —
    state-dict snapshots quantize their UPDATE, whose magnitude is
    orders below the weights', so the per-leaf error bound
    max|delta|/65534 sits >=45x under every trajectory-test tolerance:
    measured worst leaf deltas are 0.062 for the one-step snapshot vs
    its 1e-4 gate and 0.23 for the 4-step snapshots vs their 1e-2
    gates). Integer leaves (num_batches_tracked) pass through raw.
    Deterministic, so golden regeneration stays bit-identical.
    Returns (codes, scales) dicts; decode with dequantize16 (mirrored
    in tests/test_train_trajectory.py)."""
    codes, scales = {}, {}
    for k, v in leaves.items():
        v = np.asarray(v)
        if v.dtype.kind in "iu":
            codes[k] = v
            continue
        d = v.astype(np.float64)
        if base is not None:
            d = d - np.asarray(base[k], np.float64)
        scale = max(float(np.abs(d).max()), 1e-30) / 32767.0
        codes[k] = np.round(d / scale).astype(np.int16)
        scales[k] = np.float32(scale)
    return codes, scales


def golden_model():
    from nets import nn

    torch.manual_seed(0)
    model = nn.yolo_v11_n(80)
    model.eval()

    torch.manual_seed(1)
    x = torch.rand(2, 3, 256, 256)

    with torch.no_grad():
        eval_out = model(x)

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    model.train()
    with torch.no_grad():
        train_out = model(x.clone())

    # intermediate backbone/fpn features for debugging parity failures
    model.eval()
    with torch.no_grad():
        feats = model.net(x)
        fpn_feats = model.fpn(feats)

    save("model_n.npz",
         input=x.numpy(),
         eval_out=eval_out.numpy(),
         train_out_0=train_out[0].numpy(),
         train_out_1=train_out[1].numpy(),
         train_out_2=train_out[2].numpy(),
         p3=feats[0].numpy(), p4=feats[1].numpy(), p5=feats[2].numpy(),
         f3=fpn_feats[0].numpy(), f4=fpn_feats[1].numpy(), f5=fpn_feats[2].numpy(),
         **{"sd." + k: v for k, v in state.items()})
    return model, x


def golden_nms(model, x):
    from utils import util

    model.eval()
    with torch.no_grad():
        outputs = model(x)
    # raise scores so some boxes clear the multi-label threshold interestingly
    dets = util.non_max_suppression(outputs.float())
    arrays = {"outputs": outputs.numpy()}
    for i, d in enumerate(dets):
        arrays[f"det_{i}"] = d.numpy()

    # controlled synthetic case: known overlaps, scores, classes
    rng = np.random.RandomState(7)
    a = 64
    cx = rng.uniform(40, 600, a)
    cy = rng.uniform(40, 600, a)
    w = rng.uniform(20, 120, a)
    h = rng.uniform(20, 120, a)
    cls_scores = rng.uniform(0, 1, (80, a)) ** 4  # sparse-ish high scores
    synth = np.concatenate([np.stack([cx, cy, w, h]), cls_scores], 0)[None].astype(np.float32)
    sdets = util.non_max_suppression(torch.from_numpy(synth))
    arrays["synth"] = synth
    arrays["synth_det"] = sdets[0].numpy()
    save("nms.npz", **arrays)


def golden_assigner():
    from utils import util

    torch.manual_seed(3)
    b, a, nc, n_max = 2, 336, 80, 8
    pd_scores = torch.rand(b, a, nc)
    anc = torch.rand(a, 2) * 256
    # predicted boxes around anchors
    half = torch.rand(a, 4) * 30 + 2
    pd_boxes = torch.cat([anc - half[:, :2], anc + half[:, 2:]], 1).unsqueeze(0).repeat(b, 1, 1)
    pd_boxes += torch.rand(b, a, 4) * 4
    gt_cx = torch.rand(b, n_max, 1) * 220 + 18
    gt_cy = torch.rand(b, n_max, 1) * 220 + 18
    gt_w = torch.rand(b, n_max, 1) * 100 + 10
    gt_h = torch.rand(b, n_max, 1) * 100 + 10
    gt_boxes = torch.cat([gt_cx - gt_w / 2, gt_cy - gt_h / 2,
                          gt_cx + gt_w / 2, gt_cy + gt_h / 2], -1)
    gt_labels = torch.randint(0, nc, (b, n_max, 1)).float()
    mask_gt = torch.ones(b, n_max, 1)
    mask_gt[0, 5:] = 0  # image 0 has only 5 real boxes
    gt_boxes = gt_boxes * mask_gt

    assigner = util.Assigner(nc=nc, top_k=10, alpha=0.5, beta=6.0)
    tb, ts, fg = assigner(pd_scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt)
    save("assigner.npz",
         pd_scores=pd_scores.numpy(), pd_boxes=pd_boxes.numpy(), anc=anc.numpy(),
         gt_labels=gt_labels.numpy(), gt_boxes=gt_boxes.numpy(), mask_gt=mask_gt.numpy(),
         target_bboxes=tb.numpy(), target_scores=ts.numpy(), fg_mask=fg.numpy())


def golden_loss(model, x):
    from utils import util

    params = {"box": 7.5, "cls": 0.5, "dfl": 1.5}
    criterion = util.ComputeLoss(model, params)
    model.train()
    with torch.no_grad():
        outputs = model(x)

    torch.manual_seed(5)
    n0, n1 = 6, 4
    idx = torch.cat([torch.zeros(n0), torch.ones(n1)])
    cls = torch.randint(0, 80, (n0 + n1,)).float()
    box = torch.rand(n0 + n1, 4) * 0.4 + 0.05  # normalized xywh, in-bounds
    targets = {"idx": idx, "cls": cls, "box": box}
    lb, lc, ld = criterion(outputs, targets)
    save("loss.npz",
         idx=idx.numpy(), cls=cls.numpy(), box=box.numpy(),
         loss_box=lb.detach().numpy(), loss_cls=lc.detach().numpy(),
         loss_dfl=ld.detach().numpy())


def golden_train_trajectory():
    """4 full reference training steps — forward (train-mode BN) →
    ComputeLoss → backward → SGD(nesterov, set_params groups) → EMA —
    at a fixed lr, recording per-step losses and the final model + EMA
    state dicts. Pins gradients through the whole architecture, BN
    running-stat updates, optimizer param-group behavior and the EMA
    ramp JOINTLY against the reference training loop
    (main.py:95-170, util.py:519-534, util.py:599-627).
    Also records the step-0 gradients (exact backward parity, free of
    trajectory chaos) and the post-step-0 state dict (one-update
    optimizer parity). lr is kept small: at training-scale rates the
    TAL assigner's discrete selections amplify f32 noise chaotically
    within a few steps on random init, which would pin nothing.
    Fixed config: bs=2 @128px, lr=0.002, momentum=0.937, wd=5e-4,
    nesterov, accumulate=1 (step+EMA every iteration)."""
    from nets import nn
    from utils import util

    torch.set_grad_enabled(True)   # main() disables globally for the
    torch.manual_seed(0)           # inference goldens; backward needs it
    model = nn.yolo_v11_n(80)
    model.train()
    criterion = util.ComputeLoss(model, {"box": 7.5, "cls": 0.5, "dfl": 1.5})
    bs, size, steps = 2, 128, 4
    lr, momentum, wd = 0.002, 0.937, 5e-4
    optimizer = torch.optim.SGD(util.set_params(model, wd), lr, momentum,
                                nesterov=True)
    ema = util.EMA(model)

    init_sd = {k: v.detach().clone().numpy()
               for k, v in model.state_dict().items()}

    rng = np.random.default_rng(7)
    arrays, losses = {}, []
    for s in range(steps):
        img = rng.integers(0, 256, (bs, 3, size, size)).astype(np.uint8)
        n0, n1 = 5, 3
        idx = np.concatenate([np.zeros(n0), np.ones(n1)]).astype(np.float32)
        cls = rng.integers(0, 80, n0 + n1).astype(np.float32)
        box = (rng.random((n0 + n1, 4)) * 0.4 + 0.05).astype(np.float32)
        arrays[f"img_{s}"] = img
        arrays[f"idx_{s}"] = idx
        arrays[f"cls_{s}"] = cls
        arrays[f"box_{s}"] = box

        samples = torch.from_numpy(img).float() / 255
        targets = {"idx": torch.from_numpy(idx),
                   "cls": torch.from_numpy(cls),
                   "box": torch.from_numpy(box)}
        optimizer.zero_grad()
        outputs = model(samples)
        lb, lc, ld = criterion(outputs, targets)
        losses.append([lb.item(), lc.item(), ld.item()])
        # reference backward scaling: loss *= batch_size (main.py:142-144)
        ((lb + lc + ld) * bs).backward()
        if s == 0:
            # step-0 gradients, keyed like the full state dict (buffers
            # get zeros so the converter's coverage contract holds)
            grads = {k: np.zeros_like(v.detach().numpy())
                     for k, v in model.state_dict().items()}
            for k, p in model.named_parameters():
                if p.grad is not None:
                    grads[k] = p.grad.detach().numpy().copy()
        optimizer.step()
        ema.update(model)
        if s == 0:
            sd1 = {k: v.detach().clone().numpy()
                   for k, v in model.state_dict().items()}

    # int16-compress the five full-model sections (the file was 48.6 MB
    # as raw f32 — ADVICE r3): sd0 stays exact f32 (the trajectory's
    # anchor), gradients quantize their values, snapshots their deltas
    # vs sd0. Error bounds in the quantize16 docstring.
    sdf = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sde = {k: v.detach().numpy() for k, v in ema.ema.state_dict().items()}
    sections = {}
    for tag, leaves, base in (("gr", grads, None), ("sd1", sd1, init_sd),
                              ("sdf", sdf, init_sd), ("sde", sde, init_sd)):
        codes, scales = quantize16(leaves, base)
        sections.update({f"{tag}q.{k}": v for k, v in codes.items()})
        sections.update({f"{tag}s.{k}": v for k, v in scales.items()})

    save("train_traj.npz",
         losses=np.asarray(losses, np.float64),
         **arrays,
         **{"sd0." + k: v for k, v in init_sd.items()},
         **sections)


def golden_train_trajectory_long():
    """Long-horizon (112-step) reference training run with the FULL
    production schedule semantics — the coverage the 4-step golden
    cannot give (VERDICT r4 item 3):

      * the reference LinearLR warmup -> linear-decay transition
        (util.py:581-596): num_steps=14/epochs=8 puts the crossing at
        step 100 (warmup = max(3*14, 100) = 100), so both regimes and
        the boundary are in-trajectory; total_lr is stored so the JAX
        schedule (train/optim.py::linear_lr) is pinned array-for-array;
      * gradient accumulation at the production rule
        accumulate = max(round(64/bs), 1) = 16 (main.py:44): updates
        fire at global steps 0, 16, ..., 96 (step % accumulate == 0,
        main.py:158) with EMA coupled to update count, AND the
        reference's epoch-start optimizer.zero_grad() (main.py:119)
        which DISCARDS tail accumulated grads whenever
        num_steps % accumulate != 0 — a quirk this golden pins (with
        14-step epochs, the step-16 update sees only 3 batches);
      * weight-decay/EMA/schedule coupling over 7 real updates at
        ramping lr (wd = 5e-4 * bs * accumulate / 64 = 5e-4).

    The mosaic-cutoff epoch boundary (main.py:109-110) is a host
    data-pipeline toggle with no step-numerics content — inputs here
    are a fixed 8-batch pool cycled per step (keeps the fixture small);
    the cutoff's control path is covered by trainer/e2e tests.

    Fixed config: bs=4 @96px, v11-n(80), momentum 0.937, nesterov.
    The model init is the SAME torch.manual_seed(0) state as
    golden_train_trajectory — sd0 is NOT duplicated here; the test
    loads it from train_traj.npz (both fixtures regenerate together)."""
    from nets import nn
    from utils import util

    torch.set_grad_enabled(True)   # main() disables globally for the
    torch.manual_seed(0)           # inference goldens
    model = nn.yolo_v11_n(80)
    model.train()
    criterion = util.ComputeLoss(model, {"box": 7.5, "cls": 0.5,
                                         "dfl": 1.5})
    bs, size = 4, 96
    num_steps, epochs = 14, 8
    momentum = 0.937
    accumulate = max(round(64 / bs), 1)          # 16 (main.py:44)
    wd = 5e-4 * bs * accumulate / 64             # main.py:45
    # reference LinearLR arrays (util.py:581-592). lrs are the default
    # hyp scaled by 0.1 (max 1e-3, min 1e-5): at the stock max_lr=1e-2
    # the REFERENCE itself diverges on this tiny synthetic config (cls
    # loss explodes to ~3000 after the step-80/96 updates — measured
    # 2026-08-20), and a diverged trajectory pins chaos, not parity.
    # The schedule SHAPE (warmup -> decay crossing at step 100,
    # min:max ratio, endpoint conventions) is unchanged.
    warmup = int(max(3.0 * num_steps, 100))
    decay = int(epochs * num_steps - warmup)
    total_lr = np.concatenate([
        np.linspace(1e-5, 1e-3, warmup, endpoint=False),
        np.linspace(1e-3, 1e-5, decay)])
    optimizer = torch.optim.SGD(util.set_params(model, wd), 1e-5,
                                momentum, nesterov=True)
    ema = util.EMA(model)

    init_sd = {k: v.detach().clone().numpy()
               for k, v in model.state_dict().items()}

    rng = np.random.default_rng(11)
    pool = []
    arrays = {}
    for b in range(8):
        img = rng.integers(0, 256, (bs, 3, size, size)).astype(np.uint8)
        counts = rng.integers(1, 7, bs)
        idx = np.concatenate([np.full(c, i) for i, c in
                              enumerate(counts)]).astype(np.float32)
        n = int(counts.sum())
        cls = rng.integers(0, 80, n).astype(np.float32)
        box = (rng.random((n, 4)) * 0.4 + 0.05).astype(np.float32)
        pool.append((img, idx, cls, box))
        arrays[f"pimg_{b}"] = img
        arrays[f"pidx_{b}"] = idx
        arrays[f"pcls_{b}"] = cls
        arrays[f"pbox_{b}"] = box

    # Chaos note (measured 2026-08-20): f32 drift through the TAL
    # assigner's discrete selections amplifies ~30x per applied update
    # (window max-rel 1e-5 -> 3e-5 -> 4.6e-4 -> 1.5e-2 -> 0.23 ...), so
    # a single 112-step run cannot be pinned tightly end-to-end. The
    # fixture therefore also stores a MID-RUN ANCHOR — the full
    # reference state at the start of epoch 4 (model + EMA + momentum
    # buffers; the epoch-start zero_grad quirk guarantees no pending
    # accumulation there) — and the test re-anchors on it, stitching
    # two tightly-bounded halves (VERDICT r4 item 3's "stitched"
    # trajectory).
    anchor_epoch = epochs // 2                   # 4
    anchor = {}
    losses = []
    for epoch in range(epochs):
        if epoch == anchor_epoch:
            anchor["sdm"] = {k: v.detach().clone().numpy()
                             for k, v in model.state_dict().items()}
            anchor["sme"] = {k: v.detach().clone().numpy()
                             for k, v in ema.ema.state_dict().items()}
            mom = {k: np.zeros_like(v.detach().numpy())
                   for k, v in model.state_dict().items()}
            for k, p in model.named_parameters():
                st = optimizer.state.get(p, {})
                if st.get("momentum_buffer") is not None:
                    mom[k] = st["momentum_buffer"].detach().clone().numpy()
            anchor["smo"] = mom
            anchor["ema_updates_mid"] = ema.updates
        optimizer.zero_grad()                    # main.py:119 (quirk)
        for i in range(num_steps):
            step = epoch * num_steps + i
            for grp in optimizer.param_groups:   # scheduler.step
                grp["lr"] = total_lr[step]
            img, idx, cls, box = pool[step % 8]
            samples = torch.from_numpy(img).float() / 255
            targets = {"idx": torch.from_numpy(idx),
                       "cls": torch.from_numpy(cls),
                       "box": torch.from_numpy(box)}
            outputs = model(samples)
            lb, lc, ld = criterion(outputs, targets)
            losses.append([lb.item(), lc.item(), ld.item()])
            ((lb + lc + ld) * bs).backward()
            if step % accumulate == 0:           # main.py:158
                optimizer.step()
                optimizer.zero_grad()
                ema.update(model)

    sdf = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sde = {k: v.detach().numpy()
           for k, v in ema.ema.state_dict().items()}
    sections = {}
    for tag, leaves, base in (("sdf", sdf, anchor["sdm"]),
                              ("sde", sde, anchor["sdm"]),
                              ("sdm", anchor["sdm"], init_sd),
                              ("sme", anchor["sme"], init_sd),
                              ("smo", anchor["smo"], None)):
        codes, scales = quantize16(leaves, base)
        sections.update({f"{tag}q.{k}": v for k, v in codes.items()})
        sections.update({f"{tag}s.{k}": v for k, v in scales.items()})

    save("train_traj_long.npz",
         losses=np.asarray(losses, np.float64),
         total_lr=total_lr.astype(np.float64),
         ema_updates=np.int64(ema.updates),
         ema_updates_mid=np.int64(anchor["ema_updates_mid"]),
         **arrays, **sections)


def golden_ciou():
    from utils import util

    torch.manual_seed(11)
    b1 = torch.rand(64, 4) * 200
    b1 = torch.cat([b1[:, :2], b1[:, :2] + torch.rand(64, 2) * 120 + 1], 1)
    b2 = torch.rand(64, 4) * 200
    b2 = torch.cat([b2[:, :2], b2[:, :2] + torch.rand(64, 2) * 120 + 1], 1)
    v = util.compute_iou(b1, b2)
    save("ciou.npz", b1=b1.numpy(), b2=b2.numpy(), ciou=v.numpy())


def golden_metrics():
    from utils import util

    rng = np.random.RandomState(13)
    iou_v = torch.linspace(0.5, 0.95, 10)

    n_det, n_gt = 40, 25
    gt_boxes = rng.uniform(0, 500, (n_gt, 2))
    gt_boxes = np.concatenate([gt_boxes, gt_boxes + rng.uniform(20, 120, (n_gt, 2))], 1)
    gt_cls = rng.randint(0, 10, (n_gt, 1)).astype(np.float32)
    target = torch.from_numpy(np.concatenate([gt_cls, gt_boxes], 1).astype(np.float32))

    jitter = rng.uniform(-12, 12, (n_det, 4))
    det_boxes = np.concatenate([gt_boxes, gt_boxes[:15]], 0) + jitter
    det_conf = rng.uniform(0.05, 1.0, (n_det, 1))
    det_cls = np.concatenate([gt_cls, gt_cls[:15]], 0).copy()
    det_cls[::7] = (det_cls[::7] + 1) % 10  # some wrong classes
    output = torch.from_numpy(
        np.concatenate([det_boxes, det_conf, det_cls], 1).astype(np.float32))

    correct = util.compute_metric(output, target, iou_v)

    tp = correct.numpy()
    conf = det_conf[:, 0]
    pred_cls = det_cls[:, 0]
    target_cls = gt_cls[:, 0]
    res = util.compute_ap(tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy())
    tp_o, fp_o, m_pre, m_rec, map50, mean_ap = res
    save("metrics.npz",
         output=output.numpy(), target=target.numpy(), iou_v=iou_v.numpy(),
         correct=tp,
         conf=conf, pred_cls=pred_cls, target_cls=target_cls,
         m_pre=np.float64(m_pre), m_rec=np.float64(m_rec),
         map50=np.float64(map50), mean_ap=np.float64(mean_ap))


def golden_letterbox():
    from utils import dataset as ds

    rng = np.random.RandomState(17)
    for name, (h, w) in {"tall": (800, 500), "wide": (300, 700), "small": (200, 300)}.items():
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        out, ratio, pad = ds.resize(img.copy(), 640, augment=False)
        save(f"letterbox_{name}.npz", image=img, out=out,
             ratio=np.array(ratio), pad=np.array(pad))


def main():
    os.makedirs(OUT, exist_ok=True)
    install_stubs()
    torch.set_grad_enabled(False)
    model, x = golden_model()
    golden_nms(model, x)
    golden_assigner()
    golden_loss(model, x)
    golden_ciou()
    golden_metrics()
    golden_letterbox()
    golden_train_trajectory()
    golden_train_trajectory_long()
    print("done")


if __name__ == "__main__":
    main()

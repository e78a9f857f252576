"""Host data-pipeline tests: letterbox golden parity + loader mechanics."""
import numpy as np

from conftest import load_golden


def test_letterbox_golden():
    from tpu_yolo.data.image import letterbox

    for case in ("tall", "wide", "small"):
        g = load_golden(f"letterbox_{case}.npz")
        out, ratio, pad = letterbox(g["image"].copy(), 640, augment=False)
        assert out.shape == g["out"].shape, (case, out.shape, g["out"].shape)
        assert (out == g["out"]).all(), case
        assert np.allclose(ratio, g["ratio"]), case
        assert np.allclose(pad, g["pad"]), case


def test_box_roundtrip():
    from tpu_yolo.data.augment import corners_to_norm, denorm_corners

    rng = np.random.RandomState(0)
    norm = rng.uniform(0.2, 0.4, (20, 4)).astype(np.float32)
    px = denorm_corners(norm, 640, 480)
    back = corners_to_norm(px.copy(), 640, 480)
    assert np.abs(back - norm).max() < 1e-5


def test_collate_and_loader():
    from tpu_yolo.data.dataset import collate
    from tpu_yolo.data.loader import DataLoader, ShardSampler

    class Fake:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            n = i % 3
            return (np.full((8, 8, 3), i, np.uint8),
                    np.full((n, 1), i, np.float32),
                    np.zeros((n, 4), np.float32))

    images, targets = collate([Fake()[0], Fake()[1], Fake()[2]])
    assert images.shape == (3, 8, 8, 3)
    assert (targets["idx"] == np.array([1., 2., 2.])).all()

    loader = DataLoader(Fake(), batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert sum(b[0].shape[0] for b in batches) == 10

    # epoch reshuffle changes order
    loader.set_epoch(1)
    b0 = next(iter(loader))[0][:, 0, 0, 0]
    loader.set_epoch(2)
    b1 = next(iter(loader))[0][:, 0, 0, 0]
    assert not (b0 == b1).all()

    # shard sampler partitions without overlap per epoch
    s0 = ShardSampler(10, 2, 0).indices(0)
    s1 = ShardSampler(10, 2, 1).indices(0)
    assert len(s0) == len(s1) == 5
    assert len(set(s0.tolist()) | set(s1.tolist())) == 10

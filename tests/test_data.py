"""Data pipeline tests: synthetic dataset generation, both augmentation
pipelines, fixed-shape batching, loader determinism and host sharding."""

import numpy as np
import pytest

from podtpu.data import Loader, YoloTxtDataset
from podtpu.data.augment import letterbox, random_affine
from podtpu.data.loader import pad_annotations
from podtpu.data.synthetic import generate


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    info = generate(str(out), n_train=12, n_val=6, size=160, num_classes=3,
                    seed=1)
    return info


def test_letterbox_geometry():
    im = np.zeros((100, 200, 3), np.uint8)
    out, ratio, (dw, dh) = letterbox(im, 160, scaleup=True)
    assert out.shape == (160, 160, 3)
    assert ratio[0] == pytest.approx(0.8)
    assert dh == pytest.approx((160 - 80) / 2)
    # gray padding above/below
    assert (out[0] == 114).all() and (out[-1] == 114).all()


def test_letterbox_no_scaleup():
    im = np.zeros((100, 100, 3), np.uint8)
    out, ratio, _ = letterbox(im, 160, scaleup=False)
    assert ratio[0] == 1.0  # eval never upscales
    assert out.shape == (160, 160, 3)


def test_random_affine_identity_boxes():
    rng = np.random.default_rng(0)
    im = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[0.0, 20, 20, 60, 60]], np.float32)
    im2, boxes2 = random_affine(im, boxes.copy(), rng, translate=0.0, scale=0.0)
    assert im2.shape == im.shape
    np.testing.assert_allclose(boxes2, boxes, atol=1e-3)


def test_random_affine_border_is_center_crop():
    """With identity draws, border=-s/2 must CROP the 2S canvas to its center
    S x S window (the reference's mosaic semantics), not resize it."""
    rng = np.random.default_rng(0)
    s = 80
    canvas = np.random.default_rng(1).integers(0, 255, (2 * s, 2 * s, 3)).astype(np.uint8)
    # box fully inside the center window [s/2, 3s/2) so no edge clipping
    boxes = np.array([[0.0, 50, 60, 110, 115]], np.float32)
    out, b = random_affine(canvas, boxes.copy(), rng, degrees=0.0,
                           translate=0.0, scale=0.0, shear=0.0,
                           border=(-s // 2, -s // 2))
    assert out.shape == (s, s, 3)
    np.testing.assert_array_equal(out, canvas[s // 2:3 * s // 2,
                                              s // 2:3 * s // 2])
    np.testing.assert_allclose(b[0, 1:], boxes[0, 1:] - s // 2, atol=1e-3)


def _reference_perspective_oracle(im, targets, rng, degrees, translate,
                                  scale, shear, border):
    """Numpy oracle of the reference's random_perspective affine math
    (augmentations.py:124-210, perspective=0), drawing from ``rng`` in the
    same order as podtpu's random_affine."""
    import math

    import cv2

    height = im.shape[0] + border[0] * 2
    width = im.shape[1] + border[1] * 2
    C = np.eye(3)
    C[0, 2] = -im.shape[1] / 2
    C[1, 2] = -im.shape[0] / 2
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ C
    im2 = cv2.warpAffine(im, M[:2], dsize=(width, height),
                         borderValue=(114, 114, 114))
    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = (xy @ M.T)[:, :2].reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        # box_candidates (augmentations.py:272-277)
        eps = 1e-16
        w1 = (targets[:, 3] - targets[:, 1]) * s
        h1 = (targets[:, 4] - targets[:, 2]) * s
        w2, h2 = new[:, 2] - new[:, 0], new[:, 3] - new[:, 1]
        ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
        keep = ((w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 + eps) > 0.10)
                & (ar < 20))
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
    return im2, targets


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_affine_matches_reference_math(seed):
    """Bit-exact image + box parity vs the reference's affine math on the
    mosaic crop path (same rng draws)."""
    s = 64
    canvas = np.random.default_rng(seed).integers(
        0, 255, (2 * s, 2 * s, 3)).astype(np.uint8)
    boxes = np.array(
        [[0.0, 20, 30, 90, 100], [1.0, 60, 70, 130, 120],
         [2.0, 0, 0, 3, 3]], np.float32)
    kw = dict(degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
              border=(-s // 2, -s // 2))
    got_im, got_b = random_affine(canvas, boxes.copy(),
                                  np.random.default_rng(seed), **kw)
    want_im, want_b = _reference_perspective_oracle(
        canvas, boxes.copy(), np.random.default_rng(seed), **kw)
    np.testing.assert_array_equal(got_im, want_im)
    assert got_b.shape == want_b.shape
    np.testing.assert_allclose(got_b, want_b, atol=1e-4)


def test_mosaic_crop_distribution_matches_reference():
    """Distribution check: podtpu's full mosaic sample (placement + crop
    affine) vs an oracle of the reference's load_mosaic math
    (datasets.py:185-239). Independent rng streams -> compare box survival
    rate and scale statistics, not bits."""
    s = 96
    rng_imgs = np.random.default_rng(0)
    imgs = [rng_imgs.integers(0, 255, (s, s, 3)).astype(np.uint8)
            for _ in range(4)]
    base_boxes = [
        np.array([[0, 10, 10, 50, 50], [1, 40, 30, 90, 80]], np.float32),
        np.array([[1, 20, 20, 70, 60]], np.float32),
        np.array([[2, 5, 40, 60, 90]], np.float32),
        np.array([[0, 30, 5, 80, 45]], np.float32),
    ]
    n_in = sum(len(b) for b in base_boxes)

    from podtpu.data.augment import mosaic4

    def podtpu_trial(seed):
        rng = np.random.default_rng(seed)
        canvas, boxes = mosaic4([i.copy() for i in imgs],
                                [b.copy() for b in base_boxes], s, rng)
        _, out = random_affine(canvas, boxes, rng, degrees=0.0,
                               translate=0.1, scale=0.5, shear=0.0,
                               border=(-s // 2, -s // 2))
        return out

    def oracle_trial(seed):
        rng = np.random.default_rng(seed)
        yc = int(rng.uniform(s // 2, 3 * s // 2))
        xc = int(rng.uniform(s // 2, 3 * s // 2))
        canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
        labels = []
        for i, (img, b) in enumerate(zip(imgs, base_boxes)):
            h, w = img.shape[:2]
            if i == 0:
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
                x1b, y1b = 0, h - (y2a - y1a)
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
                x1b, y1b = w - (x2a - x1a), 0
            else:
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
                x1b, y1b = 0, 0
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y1b + (y2a - y1a),
                                           x1b:x1b + (x2a - x1a)]
            bb = b.copy()
            bb[:, [1, 3]] += x1a - x1b
            bb[:, [2, 4]] += y1a - y1b
            labels.append(bb)
        labels = np.concatenate(labels)
        labels[:, 1:] = labels[:, 1:].clip(0, 2 * s)
        _, out = _reference_perspective_oracle(
            canvas, labels, rng, degrees=0.0, translate=0.1, scale=0.5,
            shear=0.0, border=(-s // 2, -s // 2))
        return out

    trials = 150
    got = [podtpu_trial(1000 + i) for i in range(trials)]
    want = [oracle_trial(5000 + i) for i in range(trials)]
    surv_got = sum(len(b) for b in got) / (trials * n_in)
    surv_want = sum(len(b) for b in want) / (trials * n_in)
    assert abs(surv_got - surv_want) < 0.08, (surv_got, surv_want)
    area_got = np.concatenate(
        [(b[:, 3] - b[:, 1]) * (b[:, 4] - b[:, 2]) for b in got if len(b)])
    area_want = np.concatenate(
        [(b[:, 3] - b[:, 1]) * (b[:, 4] - b[:, 2]) for b in want if len(b)])
    assert abs(np.log(area_got.mean() / area_want.mean())) < 0.15
    assert abs(np.log(area_got.std() / area_want.std())) < 0.3


def test_dataset_letterbox_and_simple(synth):
    for pipeline in ("letterbox", "simple"):
        ds = YoloTxtDataset(synth["train_list"], 160, augment=True,
                            pipeline=pipeline)
        img, boxes = ds.get(0, seed=123)
        assert img.shape == (160, 160, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert boxes.shape[1] == 5
        if len(boxes):
            assert (boxes[:, :4] >= 0).all() and (boxes[:, :4] <= 1).all()


def test_dataset_deterministic(synth):
    ds = YoloTxtDataset(synth["train_list"], 160, augment=True)
    a_img, a_box = ds.get(2, seed=7)
    b_img, b_box = ds.get(2, seed=7)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_box, b_box)
    c_img, _ = ds.get(2, seed=8)
    assert not np.array_equal(a_img, c_img)


def test_pad_annotations_overflow_and_fill():
    boxes = [np.zeros((2, 5), np.float32) + 0.5, np.zeros((0, 5), np.float32)]
    out = pad_annotations(boxes, max_annots=3)
    assert out.shape == (2, 3, 5)
    assert (out[0, :2] == 0.5).all() and (out[0, 2] == -1).all()
    assert (out[1] == -1).all()
    big = [np.ones((10, 5), np.float32)]
    assert pad_annotations(big, 4).shape == (1, 4, 5)


def test_loader_shapes_and_epochs(synth):
    ds = YoloTxtDataset(synth["train_list"], 160, augment=True)
    loader = Loader(ds, batch_size=4, shuffle=True, max_annots=6, workers=2,
                    seed=0)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(loader) == 3  # 12 / 4
    for b in batches:
        assert b["img"].shape == (4, 160, 160, 3)
        assert b["annot"].shape == (4, 6, 5)

    # different epoch -> different order/augs
    first = batches[0]["img"]
    loader.set_epoch(1)
    second = next(iter(loader))["img"]
    assert not np.array_equal(first, second)


def test_loader_close_joins_producer():
    """Closing the iterator must not return while pool workers are still
    reading samples — callers delete the data directory right after close
    (tmpdir benches/tests), racing any in-flight decode."""
    import time

    calls = []

    class SlowDS:
        def __len__(self):
            return 16

        def get(self, index, seed):
            time.sleep(0.05)
            calls.append(index)
            return (np.zeros((8, 8, 3), np.float32),
                    np.zeros((0, 5), np.float32))

    loader = Loader(SlowDS(), batch_size=4, shuffle=False, max_annots=2,
                    workers=2, prefetch=2)
    it = iter(loader)
    next(it)
    it.close()
    n_after_close = len(calls)
    time.sleep(0.3)  # any un-joined worker would land more reads here
    assert len(calls) == n_after_close


def test_loader_host_sharding(synth):
    ds = YoloTxtDataset(synth["train_list"], 160, augment=False)
    seen = []
    for host in range(2):
        loader = Loader(ds, batch_size=3, shuffle=False, max_annots=6,
                        workers=1, host_id=host, host_count=2)
        for batch in loader:
            seen.append(batch["img"].shape[0])
    # 12 images split 6/6 across two hosts, batch 3 -> 4 batches of 3
    assert seen == [3, 3, 3, 3]


@pytest.mark.slow
def test_loader_process_mode_matches_threads(synth):
    """worker_mode='process' (spawn pool) must yield the identical stream to
    the thread pool — samples are pure functions of (index, seed)."""
    ds = YoloTxtDataset(synth["train_list"], 160, augment=True,
                        pipeline="letterbox")
    a = Loader(ds, batch_size=4, shuffle=True, max_annots=6, workers=2,
               seed=3, worker_mode="thread")
    b = Loader(ds, batch_size=4, shuffle=True, max_annots=6, workers=2,
               seed=3, worker_mode="process")
    a.set_epoch(1)
    b.set_epoch(1)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["img"], bb["img"])
        np.testing.assert_array_equal(ba["annot"], bb["annot"])


def test_mosaic_mixup_cutout():
    from podtpu.data.augment import cutout, mixup, mosaic4

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (120, 160, 3)).astype(np.uint8) for _ in range(4)]
    boxes = [
        np.array([[0, 10, 10, 60, 60]], np.float32),
        np.array([[1, 20, 20, 100, 80]], np.float32),
        np.zeros((0, 5), np.float32),
        np.array([[2, 5, 5, 50, 90]], np.float32),
    ]
    canvas, out = mosaic4(imgs, boxes, 160, rng)
    assert canvas.shape == (320, 320, 3)
    assert out.shape[1] == 5
    assert (out[:, 1:] >= 0).all() and (out[:, 1:] <= 320).all()

    im, bx = mixup(imgs[0], boxes[0], imgs[1], boxes[1], rng)
    assert im.shape == imgs[0].shape
    assert len(bx) == 2

    im2, bx2 = cutout(imgs[0].copy(), boxes[0].copy(), rng)
    assert im2.shape == imgs[0].shape
    assert len(bx2) <= 1


@pytest.mark.slow
def test_backbone_pretrained_partial_load(tmp_path):
    import jax

    from podtpu.export.weights import SEP
    from podtpu.train.state import create_train_state

    cfg = {
        "model": "yolov3", "num_classes": 3, "input_size": 64,
        "compute_dtype": "float32",
        "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                    [20, 24], [32, 28], [40, 44], [56, 52]],
        "optimizer": "sgd", "optimizer_options": {"lr": 1e-3},
    }
    base = create_train_state(cfg, jax.random.PRNGKey(0))

    # fake "pretrained classifier" npz containing only the backbone scope,
    # with recognizable values
    arrays = {}
    flat = jax.tree_util.tree_flatten_with_path(base.params["backbone"])[0]
    for path, leaf in flat:
        key = "params" + SEP + "backbone" + SEP + SEP.join(
            p.key for p in path
        )
        arrays[key] = np.full(leaf.shape, 0.123, leaf.dtype)
    npz = str(tmp_path / "bb.npz")
    np.savez(npz, **arrays)

    cfg2 = dict(cfg, backbone_pretrained=npz)
    loaded = create_train_state(cfg2, jax.random.PRNGKey(0))
    bb_leaves = jax.tree_util.tree_leaves(loaded.params["backbone"])
    assert all(np.allclose(np.asarray(l), 0.123) for l in bb_leaves)
    # head params untouched by the partial load (still finite, not 0.123)
    head = jax.tree_util.tree_leaves(loaded.params["p5_head"])
    assert not np.allclose(np.asarray(head[0]), 0.123)


def test_mosaic_pipeline_option(synth):
    ds = YoloTxtDataset(synth["train_list"], 160, augment=True,
                        pipeline="letterbox", mosaic=1.0)
    img, boxes = ds.get(0, seed=11)
    assert img.shape == (160, 160, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    if len(boxes):
        assert (boxes[:, :4] >= 0).all() and (boxes[:, :4] <= 1).all()
    # deterministic per seed
    img2, boxes2 = ds.get(0, seed=11)
    np.testing.assert_array_equal(img, img2)


def test_cache_images_equivalence(synth):
    a = YoloTxtDataset(synth["train_list"], 160, augment=True,
                       pipeline="letterbox", cache_images=False)
    b = YoloTxtDataset(synth["train_list"], 160, augment=True,
                       pipeline="letterbox", cache_images=True)
    for idx in (0, 3):
        ia, ba = a.get(idx, seed=9)
        ib, bb = b.get(idx, seed=9)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)
        # second access hits the cache and must still be identical
        ic, bc = b.get(idx, seed=9)
        np.testing.assert_array_equal(ia, ic)
        np.testing.assert_array_equal(ba, bc)


def test_uint8_output_matches_float(synth):
    f = YoloTxtDataset(synth["train_list"], 160, augment=True,
                       pipeline="letterbox", output_uint8=False)
    u = YoloTxtDataset(synth["train_list"], 160, augment=True,
                       pipeline="letterbox", output_uint8=True)
    fi, fb = f.get(1, seed=4)
    ui, ub = u.get(1, seed=4)
    assert ui.dtype == np.uint8 and fi.dtype == np.float32
    np.testing.assert_allclose(ui.astype(np.float32) / 255.0, fi, atol=1e-6)
    np.testing.assert_array_equal(fb, ub)


@pytest.mark.slow
def test_train_step_accepts_uint8():
    import jax
    import jax.numpy as jnp

    from tests.test_train import TINY_CFG, tiny_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    state = create_train_state(TINY_CFG, jax.random.PRNGKey(0))
    step = make_train_step(TINY_CFG, mesh=None, donate=False)
    batch = tiny_batch()
    float_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    u8_batch = {
        "img": jnp.asarray((batch["img"] * 255).astype(np.uint8)),
        "annot": jnp.asarray(batch["annot"]),
    }
    rng = jax.random.PRNGKey(0)
    _, m_f = step(state, float_batch, rng)
    _, m_u = step(state, u8_batch, rng)
    # uint8 path quantizes to 1/255 steps; losses must be close
    assert abs(float(m_f["loss"]) - float(m_u["loss"])) / float(m_f["loss"]) < 0.05


def test_hist_equalize_luma_only():
    """Dormant parity (augmentations.py:63-71): Y is equalized, chroma kept."""
    from podtpu.data.augment import hist_equalize

    rng = np.random.default_rng(0)
    im = rng.integers(40, 90, (64, 64, 3), dtype=np.uint8)  # low contrast
    for use_clahe in (True, False):
        out = hist_equalize(im.copy(), use_clahe=use_clahe)
        assert out.shape == im.shape and out.dtype == np.uint8
        # luma got stretched
        import cv2
        y_in = cv2.cvtColor(im, cv2.COLOR_RGB2YUV)[:, :, 0]
        y_out = cv2.cvtColor(out, cv2.COLOR_RGB2YUV)[:, :, 0]
        assert np.ptp(y_out) > np.ptp(y_in)


def test_replicate_appends_smallest_half():
    """Dormant parity (augmentations.py:74-88): half the boxes (smallest
    side) are duplicated with new label rows, pixels really pasted."""
    from podtpu.data.augment import replicate

    rng = np.random.default_rng(1)
    im = np.zeros((100, 100, 3), np.uint8)
    im[10:20, 10:30] = 200  # box 0 contents
    boxes = np.array([
        [0, 10, 10, 30, 20],   # small -> replicated
        [1, 40, 40, 95, 95],   # large
    ], np.float32)
    out_im, out_boxes = replicate(im.copy(), boxes.copy(), rng)
    assert out_boxes.shape[0] == 3
    new = out_boxes[2]
    assert new[0] == 0  # class copied from the small box
    x1, y1, x2, y2 = new[1:].astype(int)
    assert (x2 - x1, y2 - y1) == (20, 10)
    np.testing.assert_array_equal(out_im[y1:y2, x1:x2], im[10:20, 10:30])


def test_replicate_empty_boxes_noop():
    from podtpu.data.augment import replicate

    im = np.zeros((32, 32, 3), np.uint8)
    boxes = np.zeros((0, 5), np.float32)
    out_im, out_boxes = replicate(im, boxes, np.random.default_rng(0))
    assert out_boxes.shape == (0, 5)


def test_copy_paste_mirrors_object():
    """Parity with the reference's mirror copy-paste
    (augmentations.py:213-234): accepted objects get their pixels mirrored
    across the vertical axis and a mirrored label + polygon appended."""
    from podtpu.data.augment import copy_paste

    rng = np.random.default_rng(3)
    im = np.full((100, 100, 3), 30, np.uint8)
    im[20:40, 10:30] = (200, 150, 90)  # the object, on the left half
    boxes = np.array([[2, 10, 20, 30, 40]], np.float32)
    segs = [np.array([[10, 20], [30, 20], [30, 40], [10, 40]], np.float32)]
    out_im, out_boxes, out_segs = copy_paste(im.copy(), boxes, segs, rng, p=1.0)
    assert out_boxes.shape[0] == 2 and len(out_segs) == 2
    cls, x1, y1, x2, y2 = out_boxes[1]
    assert cls == 2
    assert (x1, y1, x2, y2) == (70, 20, 90, 40)  # w - x2, y1, w - x1, y2
    # mirrored pixels really pasted (interior, away from rasterized edges)
    np.testing.assert_array_equal(out_im[25:35, 75:85],
                                  np.broadcast_to((200, 150, 90), (10, 10, 3)))
    # source pixels untouched
    np.testing.assert_array_equal(out_im[20:40, 10:30], im[20:40, 10:30])
    # mirrored polygon: x -> w - x
    np.testing.assert_allclose(out_segs[1][:, 0], 100 - segs[0][:, 0])
    np.testing.assert_allclose(out_segs[1][:, 1], segs[0][:, 1])


def test_copy_paste_ioa_gate_and_noop():
    """A mirrored footprint covering an existing label >= 30% IoA is
    rejected; and with no segments the call is a no-op (the reference's
    behavior on 5-field yolo-txt labels)."""
    from podtpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    im = np.zeros((100, 100, 3), np.uint8)
    # object on the left whose mirror lands exactly on an existing label
    boxes = np.array([[0, 10, 20, 30, 40], [1, 70, 20, 90, 40]], np.float32)
    segs = [np.array([[10, 20], [30, 20], [30, 40], [10, 40]], np.float32),
            np.array([[70, 20], [90, 20], [90, 40], [70, 40]], np.float32)]
    out_im, out_boxes, _ = copy_paste(im.copy(), boxes, segs, rng, p=1.0)
    # box 0's mirror fully covers box 1 (IoA 1.0) -> rejected; box 1's
    # mirror fully covers box 0 -> rejected
    assert out_boxes.shape[0] == 2
    np.testing.assert_array_equal(out_im, im)

    out_im, out_boxes, out_segs = copy_paste(im, boxes, [], rng, p=1.0)
    assert out_boxes.shape[0] == 2 and out_segs == []


def test_copy_paste_mosaic_knob(synth):
    """cfg copy_paste wires mirror-paste into the mosaic path with
    synthesized rectangle polygons; samples stay well-formed."""
    ds = YoloTxtDataset(synth["train_list"], 64, True, "letterbox",
                        mosaic=1.0, copy_paste=0.9)
    for i in range(4):
        im, ann = ds.get(i, seed=100 + i)
        assert im.shape == (64, 64, 3)
        if len(ann):
            assert np.all(ann[:, :4] >= 0) and np.all(ann[:, :4] <= 1)


def test_pixel_ops_semantics():
    """The Albumentations-wrapper ops (Blur/MedianBlur/ToGray/CLAHE) fire
    per the drawn probabilities and match their cv2 definitions."""
    import cv2

    from podtpu.data.augment import pixel_ops

    rng = np.random.default_rng(0)
    im = (np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3) * 7)

    # p=1: every op fires, in order. Replay the same stream manually.
    out = pixel_ops(im.copy(), np.random.default_rng(42), p=1.0)
    r = np.random.default_rng(42)
    want = im.copy()
    r.random(); k = int(r.choice((3, 5, 7)))
    want = cv2.blur(want, (k, k))
    r.random(); k = int(r.choice((3, 5, 7)))
    want = cv2.medianBlur(np.ascontiguousarray(want), k)
    r.random()
    want = cv2.cvtColor(cv2.cvtColor(want, cv2.COLOR_RGB2GRAY),
                        cv2.COLOR_GRAY2RGB)
    r.random(); clip = float(r.uniform(1.0, 4.0))
    op = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))
    lab = cv2.cvtColor(want, cv2.COLOR_RGB2LAB)
    lab[:, :, 0] = op.apply(lab[:, :, 0])
    want = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    np.testing.assert_array_equal(out, want)

    # p=0: identity
    np.testing.assert_array_equal(pixel_ops(im.copy(), rng, p=0.0), im)

    # ToGray output has equal channels; firing rate ~4 p per image
    fired = sum(
        not np.array_equal(pixel_ops(im.copy(),
                                     np.random.default_rng(s)), im)
        for s in range(2000))
    assert 40 <= fired <= 130  # ~4% of images see >=1 of the 4 p=0.01 ops


def test_pixel_ops_stream_isolated(synth):
    """Toggling pixel_ops never shifts the locked geometry/HSV draw stream:
    labels are bit-identical with the knob on and off, for every seed."""
    on = YoloTxtDataset(synth["train_list"], 160, augment=True,
                        pipeline="letterbox", pixel_ops=True)
    off = YoloTxtDataset(synth["train_list"], 160, augment=True,
                         pipeline="letterbox", pixel_ops=False)
    assert on.pixel_ops and not off.pixel_ops
    n_diff = 0
    for seed in range(60):
        a_img, a_box = on.get(seed % len(on), seed=seed)
        b_img, b_box = off.get(seed % len(off), seed=seed)
        np.testing.assert_array_equal(a_box, b_box)
        n_diff += not np.array_equal(a_img, b_img)
    assert n_diff <= 12  # only the rare fired samples differ in pixels

    # the simple pipeline never applies them (reference: letterbox-only)
    simple = YoloTxtDataset(synth["train_list"], 160, augment=True,
                            pipeline="simple", pixel_ops=True)
    assert not simple.pixel_ops


def test_loader_shard_equalization(synth):
    """Uneven host shards wrap-pad to the same length (DistributedSampler
    semantics) so multi-host collectives stay in lockstep: with 12 images on
    5 hosts every host must run the same number of batches."""
    ds = YoloTxtDataset(synth["train_list"], 160, augment=False)
    loaders = [Loader(ds, batch_size=2, shuffle=False, max_annots=6,
                      workers=1, host_id=h, host_count=5) for h in range(5)]
    lens = [len(ld._indices()) for ld in loaders]
    assert lens == [3] * 5  # ceil(12/5) everywhere (shards of 3,3,2,2,2 pad)
    assert all(len(ld) == 2 for ld in loaders)
    # union still covers the dataset; the pads are duplicates, not holes
    union = set()
    for ld in loaders:
        union |= set(int(i) for i in ld._indices())
    assert union == set(range(12))

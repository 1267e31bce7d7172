import os

import numpy as np
import jax
import jax.numpy as jnp

from mit_driverless_cv_traininginfra_tpu.config import load_network_spec
from mit_driverless_cv_traininginfra_tpu.infer.detect import (
    detect_batch,
    detect_image,
    unletterbox_boxes,
)
from mit_driverless_cv_traininginfra_tpu.infer.pipeline import two_stage_pipeline
from mit_driverless_cv_traininginfra_tpu.models import rektnet
from mit_driverless_cv_traininginfra_tpu.models.darknet import init_params

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_test.cfg")


def _setup():
    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    yp, ys = init_params(spec, jax.random.PRNGKey(0))
    rp, rs = rektnet.init(jax.random.PRNGKey(1))
    return spec, yp, ys, rp, rs


def test_detect_batch_shapes():
    spec, yp, ys, _, _ = _setup()
    imgs = jnp.zeros((2, 64, 64, 3))
    det = detect_batch(spec, yp, ys, imgs, conf_thresh=0.0, nms_thresh=0.25, top_k=8)
    assert det.boxes.shape == (2, 8, 4)
    assert det.scores.shape == (2, 8) and det.mask.shape == (2, 8)
    # conf_thresh=0 with random init keeps something
    assert bool(det.mask.any())


def test_detect_image_host_roundtrip():
    spec, yp, ys, _, _ = _setup()
    img = np.random.default_rng(0).uniform(0, 255, (100, 60, 3)).astype(np.uint8)
    boxes, scores = detect_image(spec, yp, ys, img, conf_thresh=0.0, top_k=8)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(boxes) == len(scores)


def test_unletterbox_inverse():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    out = unletterbox_boxes(boxes, pad_h=5, pad_w=3, ratio=2.0)
    np.testing.assert_allclose(np.asarray(out), [[2.0, 5.0, 12.0, 15.0]])


def test_two_stage_pipeline_end_to_end():
    spec, yp, ys, rp, rs = _setup()
    frames = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    out = two_stage_pipeline(
        spec, yp, ys, rp, rs, frames,
        conf_thresh=0.0, nms_thresh=0.25, max_det=4,
    )
    assert out.boxes.shape == (2, 4, 4)
    assert out.keypoints.shape == (2, 4, 7, 2)
    # keypoints of valid detections live inside their boxes
    m = np.asarray(out.mask)
    kx = np.asarray(out.keypoints[..., 0])
    bx0 = np.asarray(out.boxes[..., 0:1])
    bx1 = np.asarray(out.boxes[..., 2:3])
    valid = m[..., None] & np.ones_like(kx, bool)
    assert (kx[valid.astype(bool)] >= (bx0 - 1e-3 + np.zeros_like(kx))[valid]).all()
    assert (kx[valid] <= (bx1 + 1e-3 + np.zeros_like(kx))[valid]).all()


def test_crop_capacity_compaction_matches_dense():
    """crop_capacity ≥ #valid must be bit-identical to the dense path on
    valid slots (and zero on invalid ones)."""
    spec, yp, ys, rp, rs = _setup()
    frames = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (4, 64, 64, 3)), jnp.float32
    )
    dense = two_stage_pipeline(
        spec, yp, ys, rp, rs, frames,
        conf_thresh=0.3, nms_thresh=0.25, max_det=4,
    )
    n_valid = int(np.asarray(dense.mask).sum())
    cap = max(n_valid, 1)
    comp = two_stage_pipeline(
        spec, yp, ys, rp, rs, frames,
        conf_thresh=0.3, nms_thresh=0.25, max_det=4, crop_capacity=cap,
    )
    m = np.asarray(dense.mask)
    np.testing.assert_array_equal(np.asarray(comp.mask), m)
    np.testing.assert_allclose(np.asarray(comp.keypoints)[m],
                               np.asarray(dense.keypoints)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(comp.boxes),
                                  np.asarray(dense.boxes))


def test_crop_capacity_overflow_drops_lowest_scores():
    spec, yp, ys, rp, rs = _setup()
    frames = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (4, 64, 64, 3)), jnp.float32
    )
    dense = two_stage_pipeline(
        spec, yp, ys, rp, rs, frames,
        conf_thresh=0.0, nms_thresh=0.25, max_det=4,
    )
    m = np.asarray(dense.mask)
    n_valid = int(m.sum())
    if n_valid < 2:
        return  # nothing to drop with this seed
    cap = n_valid - 1
    comp = two_stage_pipeline(
        spec, yp, ys, rp, rs, frames,
        conf_thresh=0.0, nms_thresh=0.25, max_det=4, crop_capacity=cap,
    )
    # boxes/scores/mask untouched; exactly the lowest-score valid detection
    # lost its keypoints (zeros before the box offset is applied)
    np.testing.assert_array_equal(np.asarray(comp.mask), m)
    scores = np.asarray(dense.scores)
    valid_scores = scores[m]
    drop = valid_scores.argsort()[:1]
    kept_sc = np.sort(valid_scores)[::-1][:cap]
    kc = np.asarray(comp.keypoints)[m]
    kd = np.asarray(dense.keypoints)[m]
    match = np.isclose(kc, kd, rtol=1e-5, atol=1e-5).all(axis=(1, 2))
    assert match.sum() == cap, (match.sum(), cap)
    assert not match[valid_scores.argsort()[0]]


def test_pipeline_bf16_params():
    """bf16 serving params + bf16 frames must run end-to-end: NMS emits f32
    boxes, and the crop must follow the FRAME dtype (regression: f32 boxes
    used to promote the crops and crash the folded keypoint conv)."""
    import jax

    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn

    spec, yp, ys, rp, rs = _setup()
    folded = fold_bn(yp, ys, spec)
    rpf = rektnet.fold_bn(rp, rs)
    to_c = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    frames = jnp.asarray(
        np.random.default_rng(5).random((2, 64, 64, 3)), jnp.bfloat16)
    for cap in (None, 4):
        out = two_stage_pipeline(spec, to_c(folded), {}, to_c(rpf), {},
                                 frames, conf_thresh=0.1, max_det=4,
                                 crop_capacity=cap)
        assert out.keypoints.shape == (2, 4, 7, 2)
        assert np.all(np.isfinite(np.asarray(out.keypoints, np.float32)))

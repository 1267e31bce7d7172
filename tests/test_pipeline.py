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

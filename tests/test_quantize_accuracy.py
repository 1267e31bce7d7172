"""End-metric bound on int8 PTQ (VERDICT r1 #6): train the synthetic tasks
to convergence, then compare f32 serving vs the EXACT int8 composition
bench.py uses (fold_bn → calibrate → quantize_params → detections_int8 /
quantize_rektnet_params → apply_rektnet_int8) on mAP and keypoint-L2.

Numbers are quoted in PARITY.md §int8."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mit_driverless_cv_traininginfra_tpu.config import load_network_spec
from mit_driverless_cv_traininginfra_tpu.models import rektnet
from mit_driverless_cv_traininginfra_tpu.models.darknet import (
    detections,
    fold_bn,
    init_params,
)
from mit_driverless_cv_traininginfra_tpu.models.quantize import (
    apply_rektnet_int8,
    calibrate,
    calibrate_rektnet,
    detections_int8,
    quantize_params,
    quantize_rektnet_params,
)
from mit_driverless_cv_traininginfra_tpu.ops.metrics import (
    evaluate_image_batch,
    summarize,
)
from mit_driverless_cv_traininginfra_tpu.train.optim import make_optimizer
from mit_driverless_cv_traininginfra_tpu.train.steps import (
    init_train_state,
    rektnet_train_step,
    yolo_train_step,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_test.cfg")

# stated bounds (quoted in PARITY.md): PTQ on a converged model must cost
# at most this much of the end metric on the eval batch
MAP_DELTA_BOUND = 0.05
KPT_L2_DELTA_BOUND = 0.01  # normalised crop coords (80px crop → 0.8 px)


def _bright_square_batch(rng, B, size=64):
    imgs = rng.uniform(0.0, 0.1, (B, size, size, 3)).astype(np.float32)
    targets = np.zeros((B, 1, 5), np.float32)
    for b in range(B):
        w = h = int(rng.integers(12, 20))
        x0 = int(rng.integers(4, size - w - 4))
        y0 = int(rng.integers(4, size - h - 4))
        imgs[b, y0:y0 + h, x0:x0 + w] = rng.uniform(0.8, 1.0)
        targets[b, 0] = [0, (x0 + w / 2) / size, (y0 + h / 2) / size,
                         w / size, h / size]
    return jnp.asarray(imgs), jnp.asarray(targets)


@pytest.mark.slow
def test_int8_yolo_map_delta_bounded():
    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    params, mstate = init_params(spec, jax.random.PRNGKey(0))
    tx = make_optimizer("Adam", lr=5e-4)
    ts = init_train_state(params, mstate, tx)
    rng = np.random.default_rng(0)
    for _ in range(250):
        imgs, targets = _bright_square_batch(rng, 8)
        ts, _, _ = yolo_train_step(spec, tx, ts, imgs, targets)

    imgs, targets = _bright_square_batch(rng, 16)
    folded = fold_bn(ts.params, ts.model_state, spec)

    dets32 = detections(spec, folded, {}, imgs, with_classes=False)
    ev32 = evaluate_image_batch(dets32, targets, 64, 64, conf_thresh=0.5,
                                nms_thresh=0.25, iou_thresh=0.5, top_k=16)
    map32, r32, p32 = summarize(ev32)

    cal, _ = _bright_square_batch(np.random.default_rng(5), 4)
    amax = calibrate(spec, folded, cal)
    q = quantize_params(spec, folded, amax)
    dets8 = detections_int8(spec, q, imgs, with_classes=False)
    ev8 = evaluate_image_batch(dets8, targets, 64, 64, conf_thresh=0.5,
                               nms_thresh=0.25, iou_thresh=0.5, top_k=16)
    map8, r8, p8 = summarize(ev8)

    print(f"int8 bound: mAP f32={map32:.4f} int8={map8:.4f} "
          f"R {r32:.3f}->{r8:.3f} P {p32:.3f}->{p8:.3f}")
    assert map32 > 0.15, f"f32 model failed to converge (mAP {map32})"
    assert map32 - map8 <= MAP_DELTA_BOUND, (map32, map8)


@pytest.mark.slow
def test_int8_rektnet_kpt_l2_delta_bounded():
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import (
        rektnet_batch,
    )

    rng = np.random.default_rng(1)
    params, mstate = rektnet.init(jax.random.PRNGKey(1))
    tx = make_optimizer("Adam", lr=3e-3)
    ts = init_train_state(params, mstate, tx)
    pool_i, pool_p = rektnet_batch(rng, 64)
    pool_i, pool_p = jnp.asarray(pool_i), jnp.asarray(pool_p)
    dummy = jnp.zeros((1,), jnp.float32)
    for _ in range(70):  # sized for the 1-CPU host; converges to L2<0.12
        idx = rng.integers(0, 64, 8)
        ts, _, _, _ = rektnet_train_step(
            tx, ts, pool_i[idx], dummy, pool_p[idx],
            loss_type="l1_softargmax", synth_target_sigma=1.0)

    ev_i, ev_p = rektnet_batch(np.random.default_rng(9), 16)
    ev_i, ev_p = jnp.asarray(ev_i), np.asarray(ev_p)
    folded = rektnet.fold_bn(ts.params, ts.model_state)

    _, pts32 = rektnet.apply_folded(folded, ev_i)
    l2_32 = float(np.linalg.norm(np.asarray(pts32) - ev_p, axis=-1).mean())

    cal_i, _ = rektnet_batch(np.random.default_rng(6), 16)
    q = quantize_rektnet_params(folded,
                                calibrate_rektnet(folded, jnp.asarray(cal_i)))
    _, pts8 = apply_rektnet_int8(q, ev_i)
    l2_8 = float(np.linalg.norm(np.asarray(pts8, np.float32) - ev_p,
                                axis=-1).mean())

    print(f"int8 bound: kpt-L2 f32={l2_32:.5f} int8={l2_8:.5f}")
    # loose convergence gate (random soft-argmax sits at ~0.3); the real
    # assertion is the int8-vs-f32 delta below
    assert l2_32 < 0.15, f"f32 rektnet failed to converge (L2 {l2_32})"
    assert l2_8 - l2_32 <= KPT_L2_DELTA_BOUND, (l2_32, l2_8)

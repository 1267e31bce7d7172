"""Pallas kernel correctness, run in interpreter mode on CPU (the compiled
path is exercised on real TPU by bench.py / the drive scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mit_driverless_cv_traininginfra_tpu.ops.pallas_kernels import (
    _pallas_softargmax,
    _xla_softargmax,
    fused_softargmax,
)


def test_pallas_kernel_matches_xla_interpret():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 3, (12, 80, 80)),
                    jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        pts_p, pr_p = _pallas_softargmax(x)
    pts_x, pr_x = _xla_softargmax(x)
    np.testing.assert_allclose(np.asarray(pts_p), np.asarray(pts_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pr_p), np.asarray(pr_x), atol=1e-6)


def test_fused_softargmax_gradients_match_reference():
    x = jnp.asarray(np.random.default_rng(1).normal(0, 2, (4, 80, 80)),
                    jnp.float32)

    def via_fused(z):
        pts, probs = fused_softargmax(z)
        return jnp.sum(pts ** 2) + 0.1 * jnp.sum(probs ** 2)

    def reference(z):
        m, h, w = z.shape
        p = jax.nn.softmax(z.reshape(m, h * w), axis=1)
        ys = jnp.linspace(0, (h - 1.0) / h, h)
        xs = jnp.linspace(0, (w - 1.0) / w, w)
        yv, xv = jnp.repeat(ys, w), jnp.tile(xs, h)
        pts = jnp.stack([jnp.sum(p * xv, 1), jnp.sum(p * yv, 1)], 1)
        return jnp.sum(pts ** 2) + 0.1 * jnp.sum(p ** 2)

    g1 = jax.grad(via_fused)(x)
    g2 = jax.grad(reference)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_fused_softargmax_padding_path():
    # M not a multiple of BLOCK_M exercises the pad/unpad logic
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (5, 80, 80)),
                    jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        pts, probs = _pallas_softargmax(x)
    assert pts.shape == (5, 2) and probs.shape == (5, 80, 80)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=(1, 2))), 1.0, atol=1e-5)


def test_nms_topk_matches_reference_semantics_interpret():
    from mit_driverless_cv_traininginfra_tpu.ops.nms import nms
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_kernels import (
        _pallas_nms_topk,
    )

    rng = np.random.default_rng(3)
    B, N, K = 4, 256, 8
    xy = rng.uniform(0, 100, (B, N, 2))
    wh = rng.uniform(2, 30, (B, N, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        bP, sP, iP, kP = _pallas_nms_topk(boxes, scores, 0.5, K, 0.25)

    def ref_one(bb, ss):
        m = jnp.where(ss > 0.5, ss, -jnp.inf)
        idx, mask = nms(bb, m, overlap=0.25, top_k=K)
        return idx, mask

    iR, kR = jax.vmap(ref_one)(boxes, scores)
    for b in range(B):
        set_p = set(np.asarray(iP[b])[np.asarray(kP[b])].tolist())
        set_r = set(np.asarray(iR[b])[np.asarray(kR[b])].tolist())
        assert set_p == set_r, b
    # gathered boxes are exact
    gb = np.asarray(boxes[0])[np.asarray(iP[0])]
    np.testing.assert_array_equal(gb, np.asarray(bP[0]))


def test_xla_nms_topk_layout_matches_pallas_interpret():
    """The CPU fallback must produce the SAME slot layout as the kernel:
    top-k candidates in score order with in-place keep masks."""
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_kernels import (
        _pallas_nms_topk,
        _xla_nms_topk,
    )

    rng = np.random.default_rng(9)
    B, N, K = 3, 256, 8
    xy = rng.uniform(0, 100, (B, N, 2))
    wh = rng.uniform(2, 30, (B, N, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        bP, sP, iP, kP = _pallas_nms_topk(boxes, scores, 0.5, K, 0.25)
    bX, sX, iX, kX = _xla_nms_topk(boxes, scores, 0.5, K, 0.25)
    np.testing.assert_array_equal(np.asarray(iP), np.asarray(iX))
    np.testing.assert_array_equal(np.asarray(kP), np.asarray(kX))
    np.testing.assert_allclose(np.asarray(bP), np.asarray(bX), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sP), np.asarray(sX), atol=1e-6)

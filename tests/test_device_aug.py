import numpy as np
import jax
import jax.numpy as jnp

from mit_driverless_cv_traininginfra_tpu.data.augment import affine_labels
from mit_driverless_cv_traininginfra_tpu.ops.device_aug import (
    _affine_labels_batch,
    _affine_matrices,
    _warp_bilinear,
    augment_batch,
)


def test_warp_identity():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    M_inv = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    out = _warp_bilinear(imgs, M_inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)


def test_warp_translation_fills_grey():
    imgs = jnp.ones((1, 16, 16, 3), jnp.float32)
    # inverse map: src_x = dst_x - 8 → content shifts right by 8, left half grey
    M_inv = jnp.asarray([[[1, 0, -8], [0, 1, 0], [0, 0, 1]]], jnp.float32)
    out = np.asarray(_warp_bilinear(imgs, M_inv))
    assert abs(out[0, 8, 2, 0] - 127 / 255) < 1e-3
    assert abs(out[0, 8, 12, 0] - 1.0) < 1e-6


def test_affine_labels_batch_matches_host_rewarp():
    """The batched jax label rewarp must agree with the host numpy
    implementation for the same homography."""
    rng = np.random.default_rng(1)
    B, T = 3, 4
    labels = np.zeros((B, T, 5), np.float32)
    for b in range(B):
        for t in range(T):
            x0, y0 = rng.uniform(40, 300, 2)
            wdt, hgt = rng.uniform(20, 80, 2)
            labels[b, t] = [0, x0, y0, x0 + wdt, y0 + hgt]

    key = jax.random.PRNGKey(0)
    M, M_inv, ang = _affine_matrices(key, B, h=416, w=416)
    out = np.asarray(_affine_labels_batch(jnp.asarray(labels), M, ang, 416, 416))

    for b in range(B):
        # host path: rewarp with the same sampled parameters via the matrix
        import mit_driverless_cv_traininginfra_tpu.data.augment as A

        ref = labels[b].copy()
        Mb = np.asarray(M[b], np.float64)
        # reproduce host affine_labels numerics with this exact matrix
        pts = ref[:, 1:5]
        area0 = (pts[:, 2] - pts[:, 0]) * (pts[:, 3] - pts[:, 1])
        xy = np.ones((T * 4, 3))
        xy[:, :2] = pts[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(T * 4, 2)
        xy = (xy @ Mb.T)
        xy = (xy[:, :2] / xy[:, 2:3]).reshape(T, 8)
        x, y = xy[:, [0, 2, 4, 6]], xy[:, [1, 3, 5, 7]]
        boxes = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], 1)
        rad = float(ang[b]) * np.pi / 180
        red = max(abs(np.sin(rad)), abs(np.cos(rad))) ** 0.5
        cx, cy = (boxes[:, 2] + boxes[:, 0]) / 2, (boxes[:, 3] + boxes[:, 1]) / 2
        bw, bh = (boxes[:, 2] - boxes[:, 0]) * red, (boxes[:, 3] - boxes[:, 1]) * red
        boxes = np.clip(np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                                  cy + bh / 2], 1), 0, 416)
        bw, bh = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
        area = bw * bh
        ar = np.maximum(bw / (bh + 1e-16), bh / (bw + 1e-16))
        keep = (bw > 4) & (bh > 4) & (area / (area0 + 1e-16) > 0.1) & (ar < 10)
        expected = pts.copy()
        expected[keep] = boxes[keep]
        np.testing.assert_allclose(out[b, :, 1:5], expected, atol=2e-2)


def test_augment_batch_end_to_end():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    labels = np.zeros((4, 3, 5), np.float32)
    labels[:, 0] = [0, 10, 10, 40, 50]
    out_i, out_l = augment_batch(jax.random.PRNGKey(1), imgs,
                                 jnp.asarray(labels), noise=True)
    assert out_i.shape == imgs.shape and out_l.shape == labels.shape
    assert bool((out_i >= 0).all()) and bool((out_i <= 1).all())
    # padded label rows stay zero
    np.testing.assert_array_equal(np.asarray(out_l[:, 1:]), labels[:, 1:])
    # determinism per key
    out_i2, out_l2 = augment_batch(jax.random.PRNGKey(1), imgs,
                                   jnp.asarray(labels), noise=True)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(out_i2))


def test_lr_flip_label_consistency():
    imgs = jnp.zeros((8, 64, 64, 3), jnp.float32)
    labels = np.zeros((8, 1, 5), np.float32)
    labels[:, 0] = [0, 10, 20, 30, 40]
    out_i, out_l = augment_batch(jax.random.PRNGKey(3), imgs,
                                 jnp.asarray(labels),
                                 augment_affine=False, jitter=False)
    l = np.asarray(out_l[:, 0])
    flipped = np.isclose(l[:, 1], 64 - 30)
    unflipped = np.isclose(l[:, 1], 10)
    assert (flipped | unflipped).all()
    assert flipped.any() and unflipped.any()
    # x1 < x2 preserved under flip
    assert (l[:, 1] < l[:, 3]).all()

"""Windowed-DMA ROI crop kernel (ops/pallas_crop.py) vs the XLA twin.

Runs the Pallas interpreter on the CPU suite; the on-chip compile +
timing evidence lives in tools/reprobe.py (dma_dynamic_row_window_x8)
and /tmp-side bench runs recorded in PERF.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mit_driverless_cv_traininginfra_tpu.ops.image import (
    roi_crop_bilinear_indexed,
)
from mit_driverless_cv_traininginfra_tpu.ops.pallas_crop import (
    WLANES,
    WROWS,
    crop_kernel_applicable,
    roi_crop_windowed,
)


def _random_boxes(rng, n, size, wmax=180, hmax=220, edge=True):
    x0 = rng.uniform(0, size - 60, n)
    y0 = rng.uniform(0, size - 60, n)
    w = rng.uniform(8, wmax, n)
    h = rng.uniform(10, hmax, n)
    if edge and n >= 4:
        # corner/edge boxes exercise window clipping + the lane pad
        x0[:4] = [0, 0, size - 116, size - 180]
        y0[:4] = [0, size - 116, 0, size - 236]
        w[:4] = [60, 50, 115, 180]
        h[:4] = [80, 115, 60, 235]
    return np.stack([x0, y0, np.minimum(x0 + w, size),
                     np.minimum(y0 + h, size)], axis=1).astype(np.float32)


def test_applicability():
    assert crop_kernel_applicable(416, 416, 3, 80, 80)
    assert crop_kernel_applicable(800, 800, 3, 80, 80)
    assert not crop_kernel_applicable(128, 416, 3, 80, 80)   # H < WROWS
    assert not crop_kernel_applicable(416, 64, 3, 80, 80)    # W·C < WLANES
    assert not crop_kernel_applicable(416, 416, 5, 80, 80)   # channel layout


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_indexed_crop(dtype):
    rng = np.random.default_rng(0)
    B, S, C = 2, 416, 3
    frames = jnp.asarray(rng.uniform(0, 1, (B, S, S, C)), dtype)
    boxes = jnp.asarray(_random_boxes(rng, 24, S))
    fidx = jnp.asarray(rng.integers(0, B, 24), jnp.int32)
    ref = np.asarray(roi_crop_bilinear_indexed(frames, boxes, fidx, 80, 80),
                     np.float32)
    got = np.asarray(roi_crop_windowed(frames, boxes, fidx, 80, 80,
                                       interpret=True), np.float32)
    # identical matmul structure (f32-accum bf16 hats) → near-bitwise
    atol = 1e-5 if dtype == jnp.float32 else 1e-6
    np.testing.assert_allclose(got, ref, atol=atol)


def test_in_contract_bounds_documented():
    """The documented contract: height ≤ WROWS−16, width ≤ (WLANES−128)/C−2.
    Boxes AT the bound must still match the XLA twin exactly."""
    rng = np.random.default_rng(3)
    B, S, C = 1, 416, 3
    hmax = WROWS - 16
    wmax = (WLANES - 128) // C - 2
    frames = jnp.asarray(rng.uniform(0, 1, (B, S, S, C)), jnp.float32)
    boxes = np.asarray([
        [10.0, 10.0, 10.0 + wmax, 10.0 + hmax],
        [S - wmax - 1.0, S - hmax - 1.0, S - 1.0, S - 1.0],
    ], np.float32)
    fidx = jnp.zeros((2,), jnp.int32)
    ref = np.asarray(roi_crop_bilinear_indexed(
        frames, jnp.asarray(boxes), fidx, 80, 80))
    got = np.asarray(roi_crop_windowed(
        frames, jnp.asarray(boxes), fidx, 80, 80, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_oversize_box_is_border_clipped_not_garbage():
    """Out-of-contract boxes (taller than the window) must degrade to
    border-replicated samples inside the window — finite, in-range values,
    never out-of-bounds reads."""
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.uniform(0, 1, (1, 416, 416, 3)), jnp.float32)
    boxes = jnp.asarray([[5.0, 5.0, 410.0, 410.0]])  # nearly whole frame
    got = np.asarray(roi_crop_windowed(frames, boxes,
                                       jnp.zeros((1,), jnp.int32),
                                       80, 80, interpret=True))
    assert np.all(np.isfinite(got))
    assert got.min() >= 0.0 and got.max() <= 1.0

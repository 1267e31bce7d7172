"""Cross-ratio keypoint loss (reference ``RektNet/cross_ratio_loss.py:8-63``).

Location term selectable between ``l2_softargmax``/``l2_sm`` (squared error on
points), ``l2_heatmap``/``l2_hm`` (squared error on heatmaps), and
``l1_softargmax``/``l1_sm`` (absolute error on points); optional geometric
prior enforcing colinearity of the two cone side-edges (point chains
0-1-3-5 / 0-2-4-6) and parallelism of the horizontal colour boundaries.

Parity note — the reference computes its geometric dot products with
``torch.tensordot(a, b, dims=([1],[1]))`` on (B,2) tensors, which yields the
full (B,B) *cross-batch* matrix and then averages over all B² pairs
(cross_ratio_loss.py:36-57). That is faithfully reproduced when
``cross_batch=True`` (the default, for numeric parity); ``cross_batch=False``
uses the per-sample diagonal, which is almost certainly what was intended
and is cheaper — use it for new training runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12  # torch F.normalize default eps


def _normalize(v):
    """Row-normalise (B,2) with torch.nn.functional.normalize semantics:
    x / max(||x||, eps).

    The norm uses the double-where trick so the GRADIENT at an exactly
    zero vector is 0 (torch's subgradient convention) instead of NaN —
    ``jnp.linalg.norm``'s sqrt backward emits 0/0 there, which poisoned
    large-batch RektNet training at init (all soft-argmax points collapse
    to the heatmap centre, so keypoint differences can be exactly 0)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    return v / jnp.maximum(n, _EPS)


@functools.partial(
    jax.jit,
    static_argnames=("loss_type", "include_geo", "cross_batch"),
)
def cross_ratio_loss(
    heatmap,
    points,
    target_hm,
    target_points,
    loss_type: str = "l1_softargmax",
    include_geo: bool = True,
    geo_loss_gamma_horz: float = 0.0,
    geo_loss_gamma_vert: float = 0.0,
    cross_batch: bool = True,
):
    """Returns (location_loss, geo_loss, total_loss) scalars."""
    if loss_type in ("l2_softargmax", "l2_sm"):
        location_loss = jnp.mean(jnp.sum((points - target_points) ** 2, axis=(1, 2)))
    elif loss_type in ("l2_heatmap", "l2_hm"):
        location_loss = jnp.mean(jnp.sum((heatmap - target_hm) ** 2, axis=(1, 2, 3)))
    elif loss_type in ("l1_softargmax", "l1_sm"):
        location_loss = jnp.mean(jnp.sum(jnp.abs(points - target_points), axis=(1, 2)))
    else:
        raise ValueError(f"Unknown loss_type {loss_type!r}")

    if include_geo:
        def dot(a, b):
            if cross_batch:
                # (B,B) outer pairing — reference tensordot semantics.
                return jnp.einsum("ic,jc->ij", a, b)
            return jnp.einsum("ic,ic->i", a, b)

        p = points
        v53 = _normalize(p[:, 5] - p[:, 3])
        v31 = _normalize(p[:, 3] - p[:, 1])
        v10 = _normalize(p[:, 1] - p[:, 0])
        v64 = _normalize(p[:, 6] - p[:, 4])
        v42 = _normalize(p[:, 4] - p[:, 2])
        v20 = _normalize(p[:, 2] - p[:, 0])
        vA = 1.0 - dot(v31, v53)
        vB = 1.0 - dot(v10, v31)
        vC = 1.0 - dot(v64, v42)
        vD = 1.0 - dot(v42, v20)

        h21 = _normalize(p[:, 2] - p[:, 1])
        h43 = _normalize(p[:, 4] - p[:, 3])
        h65 = _normalize(p[:, 6] - p[:, 5])
        hA = 1.0 - dot(h43, h21)
        hB = 1.0 - dot(h65, h43)

        geo_loss = (
            geo_loss_gamma_horz * jnp.mean(hA + hB) / 2
            + geo_loss_gamma_vert * jnp.mean(vA + vB + vC + vD) / 4
        )
    else:
        geo_loss = jnp.asarray(0.0, dtype=location_loss.dtype)

    return location_loss, geo_loss, location_loss + geo_loss

"""Fused residual-stage Pallas kernel — EXPERIMENTAL, measured dead end.

Runs a whole Darknet-53 residual stage (n_blocks × [1×1 C→C/2 leaky, 3×3
C/2→C leaky, shortcut add], reference CVC-YOLOv3/models.py:15-110) in ONE
Pallas program per group of G images: activations and weights
VMEM-resident, int8 MXU matmuls with int32 accumulation.

**Round-2 verdict (tools/bench_resstage.py, v5e, B=128, 26² stage): NOT
adopted.** The depth-32 honest re-measure shows XLA already runs the 26²
stage at ~299 int8 TOPS (6.76 ms; the round-2 profiler's 204-TOPS reading
was axon-dispatch-gap contamination at chain depth 10) — and this kernel
measures 8.4 ms (~240 TOPS): the 9 per-tap dot_generals materialise int32
accumulators in VMEM between taps, where XLA's conv emitter keeps the
multi-tap accumulation in registers. On-chip numerics also drift: the bf16
residual carrier accumulates fma-ordering differences across 8 blocks
(74.8% exact agreement, ±4 int8 steps at the output; interpret mode is
bit-exact). Kept as tested reference code for band-fused res-stage
designs; do not wire into serving without (a) an im2col-K=2304 single
matmul for the 3×3 (kills the int32 round-trips) and (b) an f32 carrier.

Layout: flat 2D. Each image is a zero-bordered (S+2)×(S+2) patch flattened
to P=(S+2)² rows; G images stack to (G·P, C). A 3×3 tap is then ONE
contiguous row-offset slice: output position q reads input q + (dy-1)·(S+2)
+ (dx-1), and since valid outputs live at interior positions q ≥ S+3, all
tap slices stay in range — no strided access, no reshapes (both unsupported
in Mosaic, tools/probe_mosaic*.py). Border positions inside the computed
slab pick up wrapped-tap garbage and are re-zeroed by a host-precomputed
interior mask each block — which is exactly the conv zero-padding the next
block needs.

Numerics match models.quantize._qconv op-for-op: int32 integer convs, f32
dequant (acc·(s_x·s_w) + b), bf16 cast, leaky with f32 compare (the v5e
VPU rejects bf16 compares) and bf16 multiply, requant clip(round(x·s⁻¹)).
The residual carrier stays bf16 end-to-end (never round-tripped through
int8). Outputs: (a) the stage output quantized with the NEXT conv's input
scale, zero-bordered, so the downstream stride-2 conv consumes it via
_qconv_q8in with padding (0,0) — the borders ARE its padding; (b) the
bf16 stage output for the FPN route that reads the final shortcut
(reference route layers=(-1, 61)/(−1, 36)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mit_driverless_cv_traininginfra_tpu.config.darknet_cfg import (
    ConvBlock,
    NetworkSpec,
    ShortcutBlock,
)


def res_stage_spans(spec: NetworkSpec):
    """Maximal runs of [1×1 C→C/2, 3×3 C/2→C, shortcut(-3)] triplets.

    Returns [(start, n_blocks, C)]: ``start`` indexes the first 1×1 conv;
    the run covers spec blocks [start, start+3·n). Runs whose NON-final
    outputs feed a route are rejected (the final shortcut output may be
    routed — the kernel emits it)."""
    b = spec.blocks
    routed = set()
    for j, blk in enumerate(b):
        layers = getattr(blk, "layers", None)
        if layers:
            routed.update(li if li >= 0 else j + li for li in layers)

    def is_triplet(i, c_half=None, c_full=None):
        if i + 2 >= len(b):
            return False
        c1, c3, sc = b[i], b[i + 1], b[i + 2]
        return (isinstance(c1, ConvBlock) and c1.size == 1 and c1.stride == 1
                and c1.activation == "leaky" and c1.batch_normalize
                and isinstance(c3, ConvBlock) and c3.size == 3
                and c3.stride == 1 and c3.filters == 2 * c1.filters
                and c3.activation == "leaky" and c3.batch_normalize
                and isinstance(sc, ShortcutBlock)
                and (i + 2) + sc.from_layer == i - 1
                and (c_half is None or c1.filters == c_half)
                and (c_full is None or c3.filters == c_full))

    spans = []
    i = 0
    while i < len(b):
        if is_triplet(i):
            start, c_half, c_full = i, b[i].filters, b[i + 1].filters
            n = 0
            while (is_triplet(i, c_half, c_full)
                   and not ({i, i + 1} & routed)
                   and (n == 0 or (i - 1) not in routed)):
                n += 1
                i += 3
            if n > 0:
                spans.append((start, n, c_full))
            else:
                # first triplet of the run is routed-into → not fusable;
                # advance past it or the outer loop would re-enter the
                # same branch forever
                i += 1
        else:
            i += 1
    return spans


def quantize_res_stage(qparams, start: int, n_blocks: int,
                       next_conv_idx: int):
    """Pack quantized weights of a res-stage run for the kernel.

    qparams: models.quantize.quantize_params output. ``next_conv_idx`` is
    the spec index of the conv consuming the stage output (its input scale
    becomes the output requant scale)."""
    w1, s1, b1, w3, s3, b3, sx1, sx3 = [], [], [], [], [], [], [], []
    for i in range(n_blocks):
        q1 = qparams[str(start + 3 * i)]
        q3 = qparams[str(start + 3 * i + 1)]
        C_half = q1["wq"].shape[-1]
        C = q3["wq"].shape[-1]
        w1.append(q1["wq"].reshape(C, C_half))
        s1.append(q1["scale"].reshape(1, C_half))
        b1.append(q1["b"].reshape(1, C_half))
        w3.append(q3["wq"].reshape(9, C_half, C))
        s3.append(q3["scale"].reshape(1, C))
        b3.append(q3["b"].reshape(1, C))
        sx1.append(float(q1["sx_inv"]))
        sx3.append(float(q3["sx_inv"]))
    return {
        "w1": jnp.stack(w1), "s1": jnp.stack(s1), "b1": jnp.stack(b1),
        "w3": jnp.stack(w3), "s3": jnp.stack(s3), "b3": jnp.stack(b3),
        "sx1": jnp.asarray(sx1, jnp.float32).reshape(1, -1),
        "sx3": jnp.asarray(sx3, jnp.float32).reshape(1, -1),
        "sx_out": float(qparams[str(next_conv_idx)]["sx_inv"]),
    }


def _interior_mask_np(S: int, G: int):
    """Host-precomputed (G·P, 1) bf16 multiplier: 1 on interior positions
    of each image's zero-bordered patch, 0 on borders."""
    W = S + 2
    m = np.zeros((W, W), np.float32)
    m[1:S + 1, 1:S + 1] = 1.0
    return np.tile(m.reshape(-1), G).reshape(-1, 1)


def _res_stage_kernel(S: int, G: int, C: int, n_blocks: int):
    W = S + 2
    P = W * W
    off = W + 1                      # first interior flat position
    n_slab = G * P - 2 * off

    def kernel(x_ref, mask_ref, w1_ref, s1_ref, b1_ref, w3_ref, s3_ref,
               b3_ref, sx1_ref, sx3_ref, sxo_ref, slope_ref,
               outq_ref, outb_ref, tq_b):
        slope = jnp.asarray(slope_ref[0, 0], jnp.bfloat16)
        mask_full = mask_ref[:, :]                   # (G·P, 1) bf16
        mask_slab = mask_ref[pl.ds(off, n_slab), :]

        # residual carrier: the bf16 input (borders already zero)
        outb_ref[:, :] = x_ref[:, :]
        # int8 working view (block-0 1×1 input scale); borders q8(0)=0
        outq_ref[:, :] = jnp.clip(
            jnp.round(x_ref[:, :].astype(jnp.float32) * sx1_ref[0, 0]),
            -127, 127).astype(jnp.int8)

        for blk in range(n_blocks):
            # ---- 1×1 C→C/2 + leaky; rezero borders; quantize for 3×3 ---
            acc = jax.lax.dot_general(
                outq_ref[:, :], w1_ref[blk], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            t32 = acc.astype(jnp.float32) * s1_ref[blk, 0] + b1_ref[blk, 0]
            t = t32.astype(jnp.bfloat16)
            t = jnp.where(t32 >= 0, t, t * slope) * mask_full
            tq_b[:, :] = jnp.clip(
                jnp.round(t.astype(jnp.float32) * sx3_ref[0, blk]),
                -127, 127).astype(jnp.int8)

            # ---- 3×3 C/2→C: 9 contiguous-offset taps + leaky -----------
            acc3 = None
            for dy in range(3):
                for dx in range(3):
                    base = off + (dy - 1) * W + (dx - 1)
                    tap = jax.lax.dot_general(
                        tq_b[pl.ds(base, n_slab), :],
                        w3_ref[blk, 3 * dy + dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc3 = tap if acc3 is None else acc3 + tap
            y32 = acc3.astype(jnp.float32) * s3_ref[blk, 0] + b3_ref[blk, 0]
            y = y32.astype(jnp.bfloat16)
            y = jnp.where(y32 >= 0, y, y * slope)

            # ---- shortcut add (bf16 carrier), rezero borders -----------
            res = (y + outb_ref[pl.ds(off, n_slab), :]) * mask_slab
            outb_ref[pl.ds(off, n_slab), :] = res
            nxt = (sx1_ref[0, blk + 1] if blk + 1 < n_blocks
                   else sxo_ref[0, 0])
            outq_ref[pl.ds(off, n_slab), :] = jnp.clip(
                jnp.round(res.astype(jnp.float32) * nxt),
                -127, 127).astype(jnp.int8)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("S", "G", "n_blocks", "leaky_slope",
                                    "interpret"))
def fused_res_stage(x_bf_flat, mask, rs, S: int, G: int, n_blocks: int,
                    leaky_slope: float, interpret: bool = False):
    """x_bf_flat: (B·(S+2)², C) bf16 zero-bordered flattened patches.

    Returns (yq, ybf), both (B·(S+2)², C): the stage output quantized with
    the next conv's input scale, and the bf16 stage output (for FPN
    routes). ``mask`` from :func:`stage_mask`."""
    C = x_bf_flat.shape[-1]
    P = (S + 2) * (S + 2)
    B = x_bf_flat.shape[0] // P
    assert B % G == 0, (B, G)
    slope = jnp.asarray([[leaky_slope]], jnp.float32)
    kern = _res_stage_kernel(S, G, C, n_blocks)
    return pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G * P, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * P, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sx1 (1, n)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sx3 (1, n)
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((G * P, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * P, C), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * P, C), jnp.int8),
            jax.ShapeDtypeStruct((B * P, C), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((G * P, C // 2), jnp.int8),   # t quantized
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_bf_flat, mask, rs["w1"], rs["s1"], rs["b1"], rs["w3"], rs["s3"],
      rs["b3"], rs["sx1"], rs["sx3"],
      jnp.asarray([[rs["sx_out"]]], jnp.float32), slope)


def stage_mask(S: int, G: int):
    return jnp.asarray(_interior_mask_np(S, G), jnp.bfloat16)


def res_stage_pre(x_bf16):
    """(B,S,S,C) activation → zero-bordered flat (B·(S+2)², C) bf16."""
    B, S, _, C = x_bf16.shape
    xp = jnp.pad(jnp.asarray(x_bf16, jnp.bfloat16),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp.reshape(B * (S + 2) * (S + 2), C)


def res_stage_post(y_flat, B: int, S: int):
    """Kernel output → (B, S+2, S+2, C): zero-bordered NHWC. The following
    stride-2 conv consumes this via _qconv_q8in with padding (0,0); the
    bf16 twin is sliced [1:S+1, 1:S+1] for routes."""
    C = y_flat.shape[-1]
    return y_flat.reshape(B, S + 2, S + 2, C)


def res_stage_reference(x_bf16, rs, n_blocks: int, leaky_slope: float):
    """Pure-XLA twin (models.quantize semantics) for tests. Returns
    (stage activation bf16, quantized output)."""
    x = jnp.asarray(x_bf16, jnp.bfloat16)
    slope = jnp.asarray(leaky_slope, jnp.bfloat16)
    C_half = rs["w1"].shape[2]
    C = rs["w3"].shape[3]
    for blk in range(n_blocks):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * rs["sx1"][0, blk]),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, rs["w1"][blk], (((3,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        t32 = acc.astype(jnp.float32) * rs["s1"][blk, 0] + rs["b1"][blk, 0]
        t = t32.astype(jnp.bfloat16)
        t = jnp.where(t32 >= 0, t, t * slope)
        tq = jnp.clip(jnp.round(t.astype(jnp.float32) * rs["sx3"][0, blk]),
                      -127, 127).astype(jnp.int8)
        acc3 = jax.lax.conv_general_dilated(
            tq, rs["w3"][blk].reshape(3, 3, C_half, C), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y32 = acc3.astype(jnp.float32) * rs["s3"][blk, 0] + rs["b3"][blk, 0]
        y = y32.astype(jnp.bfloat16)
        y = jnp.where(y32 >= 0, y, y * slope)
        x = y + x
    yq = jnp.clip(jnp.round(x.astype(jnp.float32) * rs["sx_out"]),
                  -127, 127).astype(jnp.int8)
    return x, yq

"""Fused entry-block serving path: 4×4 conv1 (XLA) + Pallas conv2p→res1.

Round-2 profiling (tools/profile_detect.py) showed the 208² stages of the
int8 serving graph — packed stem + first residual block — running at 27-40
int8 TOPS while mid stages hit 317: the early narrow-channel high-resolution
layers are HBM-traffic- and layout-bound, not MXU-bound. Two measured fixes
(tools/bench_stem_variants.py, tools/probe_mosaic*.py):

1. **conv1 as a 4×4 stride-2 conv on raw frames** (``build_conv1_4x4``).
   The space-to-depth packed conv1 (stem_opt) is *exactly* a 4×4/s2 conv
   3→128: packed output channel (a,b,co) at (I,J) is the original conv1
   output at (2I+a, 2J+b), whose 3×3 receptive fields jointly cover the
   4×4 input patch at (2I-1, 2J-1). This kills the space-to-depth
   transpose and halves the MACs (K=48, no structural zeros); the int8
   output is bit-identical to the packed path (same per-channel weight
   absmax ⇒ same scales). Requantize-to-conv2p-scale is fused into the
   conv epilogue so the 11 MB/frame bf16 intermediate never exists.

2. **conv2p + res1 in one Pallas program per image** (``fused_entry_block``):

       hq (208², 128 int8) ─ conv2p (2×2 taps) ─ leaky ─┐ (VMEM)
           res1: 1×1 ─ leaky ─ 3×3 (in-kernel K=288 im2col) ─ leaky ─ (+)
           → requantize → resq (208², 64 int8)

   i.e. reference graph blocks 1-4 (CVC-YOLOv3/models.py:15-110: conv s2 →
   1×1 → 3×3 → shortcut) with every intermediate VMEM-resident. Integer
   convs accumulate in int32 on the MXU (exact); dequant→leaky→requant
   chains use the same f32-mul → bf16-cast points as
   models.quantize._qconv, so the result matches the unfused int8 path to
   ±1 int8 step on ~1% of values (f32 fma-rounding differences between
   the two compiled programs; tests pin the bound). The stride-2 block 5
   stays in XLA (Mosaic has no strided slicing; measured fine at
   64→128/104²) and consumes resq directly.

Band tiling: 13 bands × 16 output rows; row halos are recomputed, conv
zero-padding is reproduced exactly by zero-masking out-of-range absolute
rows and permanent zero border columns in scratch. Only probe-validated
Mosaic idioms are used: rank-3 minor-dim contractions, dynamic pl.ds,
sublane/lane-subrange writes (tools/probe_mosaic*.py on v5e).
"""

from __future__ import annotations

import functools
from typing import Dict

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

BAND = 16


def entry_block_applicable(spec: NetworkSpec) -> bool:
    """True iff blocks 0-4 are the standard YOLOv3 entry pattern at an
    even input size: [conv3×3 s1 c32, conv3×3 s2 c64, conv1×1 c32,
    conv3×3 c64, shortcut] with leaky activations, and no later block
    routes to blocks 0-3 (block 4's output is the kernel output)."""
    b = spec.blocks
    if len(b) < 6 or spec.net.width != spec.net.height:
        return False
    if spec.net.height % 32 != 0 or (spec.net.height // 2) % BAND != 0:
        return False
    want = [(3, 1, 32), (3, 2, 64), (1, 1, 32), (3, 1, 64)]
    for blk, w in zip(b[:4], want):
        if (not isinstance(blk, ConvBlock) or blk.size != w[0]
                or blk.stride != w[1] or blk.filters != w[2]
                or blk.activation != "leaky" or not blk.batch_normalize):
            return False
    # from_layer is a relative (negative) index into layer_outputs (which
    # holds blocks 0..i-1 when block i runs): -3 at block 4 → block 1.
    if not isinstance(b[4], ShortcutBlock) or 4 + b[4].from_layer != 1:
        return False
    # the consumer (quantize.forward_features_int8 entry_q path) feeds the
    # kernel's q8 output straight into block 5 as an int8 3×3/s2 conv with
    # padding 1 — block 5 must actually BE that conv and be quantizable
    # (not preyolo), or the hardcoded stride/pad silently mis-shapes it
    b5 = b[5]
    if (not isinstance(b5, ConvBlock) or b5.size != 3 or b5.stride != 2
            or b5.activation != "leaky" or not b5.batch_normalize
            or b5.is_preyolo):
        return False
    for i, blk in enumerate(b[5:], start=5):
        # routes carry absolute indices when non-negative, python-style
        # relative ones when negative (layer_outputs has i entries).
        # The fused path pads layer_outputs slots 0-5 with block-5's
        # output, so ONLY index 5 aliases correctly — a reference to
        # block 4 (the shortcut's bf16 output) would silently read
        # block 5's instead (advisor finding r2). Reject < 5.
        layers = getattr(blk, "layers", None)
        if layers and any((li if li >= 0 else i + li) < 5 for li in layers):
            return False
        frm = getattr(blk, "from_layer", None)  # shortcuts: relative
        if frm is not None and i + frm < 5:
            return False
    return True


# ---------------------------------------------------------------------------
# conv1 as 4×4 stride-2 (XLA)
# ---------------------------------------------------------------------------


def build_conv1_4x4(folded_params) -> Dict[str, np.ndarray]:
    """Folded block-'0' weights (3,3,3,C1) → 4×4/s2 weights (4,4,3,4·C1)
    with packed-phase output order (a·2+b)·C1+co (cites stem_opt tap
    algebra; verified bit-identical on-chip in tools/bench_conv1_4x4.py)."""
    w1 = np.asarray(folded_params["0"]["w"], np.float32)
    b1 = np.asarray(folded_params["0"]["b"], np.float32)
    C, C1 = w1.shape[2], w1.shape[3]
    w4 = np.zeros((4, 4, C, 4 * C1), np.float32)
    for a in range(2):
        for b in range(2):
            for dy in range(3):
                for dx in range(3):
                    w4[a + dy, b + dx, :,
                       (a * 2 + b) * C1:(a * 2 + b + 1) * C1] += w1[dy, dx]
    return {"w": w4, "b": np.concatenate([b1] * 4)}


def quantize_entry(folded_params, amax: Dict[str, float],
                   conv1_dtype: str = "int8"):
    """Quantized parameter bundle for the fused entry path.

    amax: calibration dict from models.quantize.calibrate — keys '0'..'3'
    are the conv input absmaxes of blocks 0-3, '5' is block 5's (the
    requant scale of the kernel's resq output).

    ``conv1_dtype``: 'int8' (default) quantizes the 4×4 conv1 weights;
    'bf16' stores them bf16 and conv1 runs as a bf16 conv (the stage is
    LAYOUT-bound, not MXU-bound, and int8 buys nothing on 3-channel
    input — tools/bench_conv1_4x4.py measures bf16 5.26 vs int8 5.78
    ms/batch standalone). The consumer dispatches on the bundle keys, so
    no API threading; both modes emit the same int8 hq for conv2p."""
    c4 = build_conv1_4x4(folded_params)
    w4, b4 = c4["w"], c4["b"]
    s_w = np.maximum(np.abs(w4).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    sx = {k: max(float(amax[k]), 1e-12) / 127.0 for k in ("0", "1", "2",
                                                          "3", "5")}
    if conv1_dtype == "bf16":
        ep = {
            "c1_wb": jnp.asarray(w4, jnp.bfloat16),
            "c1_b": jnp.asarray(b4, jnp.float32),
            "hq_sx_inv": jnp.float32(1.0 / sx["1"]),
        }
    else:
        ep = {
            "c1_wq": jnp.asarray(np.clip(np.round(w4 / s_w), -127, 127),
                                 jnp.int8),
            "c1_scale": jnp.asarray(sx["0"] * s_w, jnp.float32),
            "c1_b": jnp.asarray(b4, jnp.float32),
            "c1_sx_inv": jnp.float32(1.0 / sx["0"]),
            "hq_sx_inv": jnp.float32(1.0 / sx["1"]),
        }

    def q(w):
        w = np.asarray(w, np.float32)
        s = np.maximum(np.abs(w).max(axis=tuple(range(w.ndim - 1))) / 127.0,
                       1e-12)
        return (jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8),
                s)

    # conv2p taps (2,2,128,64) from the packed-stem rewrite of block 1
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem,
    )

    packed = build_packed_stem(
        {"0": folded_params["0"], "1": folded_params["1"]})
    w2q, s2 = q(np.asarray(packed["w2"], np.float32))
    ep["w2"] = w2q.reshape(4, 128, 64)
    ep["w2_scale"] = jnp.asarray(sx["1"] * s2, jnp.float32).reshape(1, 64)
    ep["w2_b"] = jnp.asarray(packed["b2"], jnp.float32).reshape(1, 64)

    w1x1q, s1x1 = q(folded_params["2"]["w"])           # (1,1,64,32)
    ep["w1x1"] = w1x1q.reshape(64, 32)
    ep["w1x1_scale"] = jnp.asarray(sx["2"] * s1x1,
                                   jnp.float32).reshape(1, 32)
    ep["w1x1_b"] = jnp.asarray(folded_params["2"]["b"],
                               jnp.float32).reshape(1, 32)

    w3q, s3 = q(folded_params["3"]["w"])               # (3,3,32,64)
    # im2col weight layout: k = (dy*3+dx)*32 + c, matching the kernel's
    # lane-write order
    ep["w3im"] = w3q.reshape(9 * 32, 64)
    ep["w3_scale"] = jnp.asarray(sx["3"] * s3, jnp.float32).reshape(1, 64)
    ep["w3_b"] = jnp.asarray(folded_params["3"]["b"],
                             jnp.float32).reshape(1, 64)

    # requant input-scale inverses: out2→r1c1, t→r1c3, res→block5
    ep["sx"] = jnp.asarray([1.0 / sx["2"], 1.0 / sx["3"], 1.0 / sx["5"]],
                           jnp.float32).reshape(1, 3)
    return ep


def conv1_4x4_q8(frames, ep, leaky_slope: float):
    """frames (B,H,W,3) [0,1] → hq (B,H/2,W/2,128) int8 (requant fused).

    Dispatches on the bundle: ``c1_wb`` present → bf16 conv (the layout-
    bound variant quantize_entry(conv1_dtype='bf16') builds), else the
    int8 conv with on-the-fly input quantization."""
    if "c1_wb" in ep:
        acc = jax.lax.conv_general_dilated(
            frames.astype(jnp.bfloat16), ep["c1_wb"], (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = (acc + ep["c1_b"]).astype(jnp.bfloat16)
    else:
        xq = jnp.clip(jnp.round(frames.astype(jnp.float32) * ep["c1_sx_inv"]),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, ep["c1_wq"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        h = (acc.astype(jnp.float32) * ep["c1_scale"]
             + ep["c1_b"]).astype(jnp.bfloat16)
    h = jnp.where(h >= 0, h, h * leaky_slope)
    return jnp.clip(jnp.round(h.astype(jnp.float32) * ep["hq_sx_inv"]),
                    -127, 127).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Pallas kernel: hq → resq
# ---------------------------------------------------------------------------


def _q8(x, sx_inv):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * sx_inv),
                    -127, 127).astype(jnp.int8)


def _deq_leaky(acc, scale, b, slope):
    # Compare in f32 (the v5e VPU rejects bf16 comparisons) but multiply in
    # bf16, matching models.darknet._leaky's weak-python-float multiply on
    # bf16 tensors. Sign is preserved by the bf16 round, so the f32
    # comparison picks the same branch.
    y32 = acc.astype(jnp.float32) * scale + b
    y = y32.astype(jnp.bfloat16)
    return jnp.where(y32 >= 0, y, y * jnp.asarray(slope, jnp.bfloat16))


def _dot3(x, w):
    """(R, W, K) int8 × (K, N) int8 → (R, W, N) int32 (MXU)."""
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _row_mask(n_rows, a0, H):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1, 1), 0)
    return (rows + a0 >= 0) & (rows + a0 < H)


def _entry_kernel(H):
    nband = H // BAND

    def kernel(hq_ref, w2_ref, w2s_ref, w2b_ref, w1_ref, w1s_ref, w1b_ref,
               w3_ref, w3s_ref, w3b_ref, sx_ref, slope_ref, out_ref,
               hq_b, out2_b, tq_b, tim_b):
        slope = slope_ref[0, 0]
        # zero scratch once per program: border columns must stay zero
        hq_b[:, :, :] = jnp.zeros_like(hq_b)
        tq_b[:, :, :] = jnp.zeros_like(tq_b)

        def band(k, carry):
            r0 = k * BAND

            # ---- load hq rows [r0-2, r0+16] (19 rows) -------------------
            v0 = jnp.clip(r0 - 2, 0, H - 17)
            d0 = v0 - (r0 - 2)                       # 2 for k=0, else 0
            hq_b[pl.ds(d0, 17), 1:H + 1, :] = hq_ref[0, pl.ds(v0, 17), :, :]

            @pl.when(k < nband - 1)
            def _():
                hq_b[17:19, 1:H + 1, :] = hq_ref[0, pl.ds(r0 + 15, 2), :, :]

            @pl.when(k == nband - 1)
            def _():
                # last band: row r0+15 == H-1 at pos 17; pos 18 (row H)
                # is garbage and is zero-masked below
                hq_b[17:18, 1:H + 1, :] = hq_ref[0, pl.ds(H - 1, 1), :, :]

            hq_v = jnp.where(_row_mask(19, r0 - 2, H), hq_b[:, :, :], 0)

            # ---- conv2p: out2 rows [r0-1, r0+16] (18) -------------------
            # out2 row b ← hq rows b-1+Dy (Dy∈{0,1}); col j ← hq cols
            # j-1+Dx.  hq_v pos p = row r0-2+p; buffer col j+1 = hq col j.
            acc = _dot3(hq_v[0:18, 0:H, :], w2_ref[0])
            acc += _dot3(hq_v[0:18, 1:H + 1, :], w2_ref[1])
            acc += _dot3(hq_v[1:19, 0:H, :], w2_ref[2])
            acc += _dot3(hq_v[1:19, 1:H + 1, :], w2_ref[3])
            out2 = _deq_leaky(acc, w2s_ref[0], w2b_ref[0], slope)
            out2_b[:, :, :] = out2

            # ---- res1 1×1 → t rows [r0-1, r0+16] (18) -------------------
            tacc = _dot3(_q8(out2, sx_ref[0, 0]), w1_ref[:, :])
            t = _deq_leaky(tacc, w1s_ref[0], w1b_ref[0], slope)
            t = jnp.where(_row_mask(18, r0 - 1, H), t, 0)
            tq_b[:, 1:H + 1, :] = _q8(t, sx_ref[0, 1])

            # ---- res1 3×3 via in-kernel im2col (K=288) ------------------
            # res row a=r0+i ← t rows a-1+dy → tq_b pos i+dy; col j ←
            # t cols j-1+dx → buffer col j+dx.
            for dy in range(3):
                for dx in range(3):
                    s = dy * 3 + dx
                    tim_b[:, :, 32 * s:32 * s + 32] = \
                        tq_b[pl.ds(dy, BAND), dx:dx + H, :]
            racc = _dot3(tim_b[:, :, :], w3_ref[:, :])
            b3 = _deq_leaky(racc, w3s_ref[0], w3b_ref[0], slope)

            # ---- shortcut add + requant --------------------------------
            res = b3 + out2_b[1:17, :, :]     # out2 rows [r0, r0+15]
            out_ref[0, pl.ds(r0, BAND), :, :] = _q8(res, sx_ref[0, 2])
            return carry

        jax.lax.fori_loop(0, nband, band, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("leaky_slope",))
def fused_entry_block(hq, ep, leaky_slope: float):
    """hq (B, H, H, 128) int8 → resq (B, H, H, 64) int8 (block-4 output,
    quantized with block 5's input scale)."""
    B, H = hq.shape[0], hq.shape[1]
    slope = jnp.asarray([[leaky_slope]], jnp.float32)
    return pl.pallas_call(
        _entry_kernel(H),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, H, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2 (4,128,64)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1x1 (64,32)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w3im (288,64)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, H, 64), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, H, 64), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((19, H + 2, 128), jnp.int8),     # hq band
            pltpu.VMEM((18, H, 64), jnp.bfloat16),      # out2
            pltpu.VMEM((18, H + 2, 32), jnp.int8),      # t quantized
            pltpu.VMEM((BAND, H, 288), jnp.int8),       # r1c3 im2col
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hq, ep["w2"], ep["w2_scale"], ep["w2_b"], ep["w1x1"], ep["w1x1_scale"],
      ep["w1x1_b"], ep["w3im"], ep["w3_scale"], ep["w3_b"], ep["sx"], slope)


def entry_forward_int8(ep, frames, leaky_slope: float, interpret=False,
                       use_kernel=False):
    """frames (B,H,W,3) → resq (B,H/2,W/2,64) int8 — the fused serving
    entry: XLA 4×4/s2 conv1 + conv2p/res1.

    Default runs conv2p/res1 in XLA (measured best on v5e: the win is the
    4×4 conv1; XLA already runs conv2p/res1/block5 near bandwidth limit).
    ``use_kernel=True`` selects the Pallas program (experimental — the
    rank-3 formulation loops M=208 matmuls and currently loses to XLA)."""
    hq = conv1_4x4_q8(frames, ep, leaky_slope)
    if interpret:
        return _fused_entry_interpret(hq, ep, leaky_slope)
    if use_kernel:
        return fused_entry_block(hq, ep, leaky_slope)
    return _entry_rest_xla(hq, ep, leaky_slope)


def _fused_entry_interpret(hq, ep, leaky_slope: float):
    B, H = hq.shape[0], hq.shape[1]
    slope = jnp.asarray([[leaky_slope]], jnp.float32)
    return pl.pallas_call(
        _entry_kernel(H),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, H, 128), lambda b: (b, 0, 0, 0)),
        ] + [pl.BlockSpec()] * 9 + [
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, H, 64), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, H, 64), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((19, H + 2, 128), jnp.int8),
            pltpu.VMEM((18, H, 64), jnp.bfloat16),
            pltpu.VMEM((18, H + 2, 32), jnp.int8),
            pltpu.VMEM((BAND, H, 288), jnp.int8),
        ],
        interpret=True,
    )(hq, ep["w2"], ep["w2_scale"], ep["w2_b"], ep["w1x1"], ep["w1x1_scale"],
      ep["w1x1_b"], ep["w3im"], ep["w3_scale"], ep["w3_b"], ep["sx"], slope)


def entry_reference_int8(ep, frames, leaky_slope: float):
    """Pure-XLA twin of the kernel path (same math, HBM intermediates) —
    the correctness oracle for tests AND the default serving formulation
    (see entry_forward_int8). Matches models.quantize semantics."""
    hq = conv1_4x4_q8(frames, ep, leaky_slope)
    return _entry_rest_xla(hq, ep, leaky_slope)


def _entry_rest_xla(hq, ep, leaky_slope: float):
    acc = jax.lax.conv_general_dilated(
        hq, ep["w2"].reshape(2, 2, 128, 64), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out2 = _deq_leaky(acc, ep["w2_scale"][0], ep["w2_b"][0], leaky_slope)
    tacc = jax.lax.conv_general_dilated(
        _q8(out2, ep["sx"][0, 0]), ep["w1x1"].reshape(1, 1, 64, 32),
        (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    t = _deq_leaky(tacc, ep["w1x1_scale"][0], ep["w1x1_b"][0], leaky_slope)
    racc = jax.lax.conv_general_dilated(
        _q8(t, ep["sx"][0, 1]), ep["w3im"].reshape(3, 3, 32, 64),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    b3 = _deq_leaky(racc, ep["w3_scale"][0], ep["w3_b"][0], leaky_slope)
    return _q8(b3 + out2, ep["sx"][0, 2])

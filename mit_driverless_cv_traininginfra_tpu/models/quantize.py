"""Post-training int8 quantization for the serving path.

The 2000 fps/chip north star (BASELINE.md) needs ~254 TFLOP/s effective at
the pipeline's ~127 GFLOP/frame — above the v5e bf16 peak (~197) but well
inside int8 (~394 TOPS). This module provides the standard PTQ recipe:

- **weights**: per-output-channel symmetric int8
  (``s_w[c] = max|w[..., c]| / 127``);
- **activations**: per-tensor symmetric int8 with scales calibrated by
  recording per-conv-input absolute maxima over calibration batches;
- **compute**: quantize input on the fly → int8 conv with int32
  accumulation on the MXU → dequantize with the fused ``s_x · s_w[c]``
  scale → bias → activation. Keeping inter-op activations in bf16 (rather
  than threading int8 scales through routes/shortcuts) costs two cheap VPU
  elementwise ops per conv and keeps the graph transformation local and
  exact-shaped.

Pre-yolo head convs stay bf16 (standard practice: the detection head is
scale-sensitive and a negligible FLOP fraction).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mit_driverless_cv_traininginfra_tpu.config.darknet_cfg import (
    ConvBlock,
    MaxPoolBlock,
    NetworkSpec,
    RouteBlock,
    ShortcutBlock,
    UpsampleBlock,
    YoloBlock,
)
from mit_driverless_cv_traininginfra_tpu.models.darknet import (
    _leaky,
    _maxpool,
    _upsample,
)
from mit_driverless_cv_traininginfra_tpu.models.rektnet import conv2d


def calibrate(spec: NetworkSpec, folded_params, frames) -> Dict[str, float]:
    """Run the folded bf16 graph on calibration frames and record the
    absolute max of every conv input. Returns {block_idx: amax}."""
    amax: Dict[str, float] = {}
    x = jnp.asarray(frames, jnp.float32)
    layer_outputs = []
    for i, b in enumerate(spec.blocks):
        if isinstance(b, ConvBlock):
            amax[str(i)] = float(jnp.max(jnp.abs(x)))
            p = folded_params[str(i)]
            x = conv2d(x, p["w"], p["b"], stride=b.stride,
                       padding=(b.size - 1) // 2)
            if b.activation == "leaky":
                x = _leaky(x, spec.net.leaky_slope)
            elif b.activation == "ReLU":
                x = jax.nn.relu(x)
        elif isinstance(b, MaxPoolBlock):
            x = _maxpool(x, b.size, b.stride)
        elif isinstance(b, UpsampleBlock):
            x = _upsample(x, b.stride)
        elif isinstance(b, RouteBlock):
            x = jnp.concatenate([layer_outputs[li] for li in b.layers], axis=-1)
        elif isinstance(b, ShortcutBlock):
            x = layer_outputs[-1] + layer_outputs[b.from_layer]
        layer_outputs.append(x)
    return amax


def quantize_params(spec: NetworkSpec, folded_params, amax: Dict[str, float],
                    act_dtype=jnp.bfloat16):
    """Folded bf16/f32 params → int8 serving params.

    Per conv block: {wq int8 HWIO, scale (Cout,) = s_x·s_w, b, s_x_inv}.
    Pre-yolo convs are passed through unquantized.
    """
    qparams: Dict[str, dict] = {}
    for i, b in enumerate(spec.blocks):
        if not isinstance(b, ConvBlock):
            continue
        p = folded_params[str(i)]
        if b.is_preyolo:
            qparams[str(i)] = {
                "w": jnp.asarray(p["w"], act_dtype),
                "b": jnp.asarray(p["b"], act_dtype),
            }
            continue
        w = jnp.asarray(p["w"], jnp.float32)
        s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0  # (Cout,)
        s_w = jnp.maximum(s_w, 1e-12)
        wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        s_x = max(amax.get(str(i), 1.0), 1e-12) / 127.0
        qparams[str(i)] = {
            "wq": wq,
            "scale": jnp.asarray(s_x * s_w, jnp.float32),
            "b": jnp.asarray(p["b"], jnp.float32),
            "sx_inv": jnp.float32(1.0 / s_x),
        }
    return qparams


def _qconv(x, q, stride: int, padding: int, act_dtype):
    """On-the-fly input quantization → int8 MXU conv → fused dequant+bias."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * q["sx_inv"]),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, q["wq"], (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * q["scale"] + q["b"]).astype(act_dtype)


def forward_features_int8(spec: NetworkSpec, qparams, x,
                          act_dtype=jnp.bfloat16):
    """int8 twin of ``forward_features`` (inference only). Returns the raw
    pre-yolo head outputs."""
    outputs = []
    layer_outputs = []
    x = jnp.asarray(x, act_dtype)
    for i, b in enumerate(spec.blocks):
        if isinstance(b, ConvBlock):
            q = qparams[str(i)]
            pad = (b.size - 1) // 2
            if "wq" in q:
                x = _qconv(x, q, b.stride, pad, act_dtype)
            else:
                x = conv2d(x, q["w"], q["b"], stride=b.stride, padding=pad)
            if b.activation == "leaky":
                x = _leaky(x, spec.net.leaky_slope)
            elif b.activation == "ReLU":
                x = jax.nn.relu(x)
        elif isinstance(b, MaxPoolBlock):
            x = _maxpool(x, b.size, b.stride)
        elif isinstance(b, UpsampleBlock):
            x = _upsample(x, b.stride)
        elif isinstance(b, RouteBlock):
            x = jnp.concatenate([layer_outputs[li] for li in b.layers], axis=-1)
        elif isinstance(b, ShortcutBlock):
            x = layer_outputs[-1] + layer_outputs[b.from_layer]
        elif isinstance(b, YoloBlock):
            outputs.append(x)
        layer_outputs.append(x)
    return outputs


def detections_int8(spec: NetworkSpec, qparams, x, act_dtype=jnp.bfloat16):
    """int8 eval forward + standard decode. Returns (B, ΣA·H·W, 5+C)."""
    from mit_driverless_cv_traininginfra_tpu.models.darknet import decode_head

    heads = forward_features_int8(spec, qparams, x, act_dtype)
    yolo_blocks = [b for b in spec.blocks if isinstance(b, YoloBlock)]
    decoded = [
        decode_head(h.astype(jnp.float32), yb.anchors, spec.net.height,
                    spec.net.num_classes)
        for h, yb in zip(heads, yolo_blocks)
    ]
    return jnp.concatenate(decoded, axis=1)

"""Per-stage profile of the int8 serving detect graph on the live chip.

Times cumulative prefixes of ``forward_features_int8`` at the Darknet-53
resolution-stage boundaries and differences them into per-stage ms, next to
an analytic FLOP + HBM-traffic account per stage — to classify each stage
as MXU-bound or bandwidth-bound (the round-2 question: detect measures
~207 effective int8 TOPS of a ~394 peak; is the gap schedule or HBM?).

Usage:  python tools/profile_detect.py [--batch 128] [--iters 32]
Writes a table to stdout; run it on the TPU (falls back to CPU but the
numbers are then meaningless).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mit_driverless_cv_traininginfra_tpu.utils.jaxcache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time_ms(fn, iters):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) * 1000 / iters


def truncated_forward(spec, qparams, x, stop: int, act_dtype=jnp.bfloat16,
                      packed_stem_q=None):
    """forward_features_int8 cut after block index ``stop`` (inclusive)."""
    from mit_driverless_cv_traininginfra_tpu.config.darknet_cfg import (
        ConvBlock, MaxPoolBlock, RouteBlock, ShortcutBlock, UpsampleBlock,
        YoloBlock,
    )
    from mit_driverless_cv_traininginfra_tpu.models.darknet import (
        _leaky, _maxpool, _upsample,
    )
    from mit_driverless_cv_traininginfra_tpu.models.quantize import _qconv
    from mit_driverless_cv_traininginfra_tpu.models.rektnet import conv2d
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import pack_input

    layer_outputs = []
    x = jnp.asarray(x, act_dtype)
    start = 0
    if packed_stem_q is not None:
        xp = pack_input(x)
        h = _leaky(_qconv(xp, packed_stem_q["c1"], 1, 1, act_dtype),
                   spec.net.leaky_slope)
        x = _leaky(_qconv(h, packed_stem_q["c2"], 1, [(1, 0), (1, 0)],
                          act_dtype), spec.net.leaky_slope)
        layer_outputs = [x, x]
        start = 2
        if stop < 2:
            return x
    acc = None
    for i, b in list(enumerate(spec.blocks))[start:stop + 1]:
        if isinstance(b, ConvBlock):
            q = qparams[str(i)]
            pad = (b.size - 1) // 2
            if "wq" in q:
                x = _qconv(x, q, b.stride, pad, act_dtype)
            else:
                x = conv2d(x, q["w"], q["b"], stride=b.stride, padding=pad)
            if b.activation == "leaky":
                x = _leaky(x, spec.net.leaky_slope)
        elif isinstance(b, MaxPoolBlock):
            x = _maxpool(x, b.size, b.stride)
        elif isinstance(b, UpsampleBlock):
            x = _upsample(x, b.stride)
        elif isinstance(b, RouteBlock):
            x = jnp.concatenate([layer_outputs[li] for li in b.layers], -1)
        elif isinstance(b, ShortcutBlock):
            x = layer_outputs[-1] + layer_outputs[b.from_layer]
        elif isinstance(b, YoloBlock):
            acc = x if acc is None else acc  # keep last head tensor
        layer_outputs.append(x)
    return x


def stage_accounting(spec, size: int):
    """Per-block (flops, out_bytes_bf16) for the serving graph."""
    from mit_driverless_cv_traininginfra_tpu.config.darknet_cfg import (
        ConvBlock, RouteBlock, ShortcutBlock, UpsampleBlock, YoloBlock,
    )
    hw = size
    dims = []  # per block: (H, W, C)
    flops = []
    h = w = size
    c = 3
    outs = []
    for i, b in enumerate(spec.blocks):
        f = 0
        if isinstance(b, ConvBlock):
            h, w = h // b.stride, w // b.stride
            f = 2 * h * w * b.size * b.size * c * b.filters
            c = b.filters
        elif isinstance(b, UpsampleBlock):
            h, w = h * b.stride, w * b.stride
        elif isinstance(b, RouteBlock):
            c = sum(outs[li][2] for li in b.layers)
            h, w = outs[b.layers[0]][0], outs[b.layers[0]][1]
        elif isinstance(b, ShortcutBlock):
            pass
        outs.append((h, w, c))
        flops.append(f)
    return outs, flops


def main():
    import bench as bench_mod
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import yolo_batch
    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        calibrate, quantize_packed_stem, quantize_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem, slice_preyolo, stem_is_packable,
    )

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 128
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 32

    spec = flagship_spec(416)
    params, state, _, _ = bench_mod._train_synthetic(spec)
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded) if stem_is_packable(spec) else None

    rng = np.random.default_rng(42)
    frames_np, _ = yolo_batch(rng, batch, size=416)
    cal = jnp.asarray(frames_np[:8], jnp.float32)
    amax = calibrate(spec, folded, cal)
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax) if packed is not None else None

    dev = jax.devices()[0]
    frames = jax.device_put(jnp.asarray(frames_np, jnp.bfloat16), dev)
    print(f"platform={dev.platform} batch={batch} iters={iters}")

    # cut points: end of packed stem, end of each resolution stage, heads
    cuts = [
        (1, "stem(208²,64)"),
        (4, "res1 208²"),
        (11, "down+res 104²"),
        (36, "down+res 52²"),
        (61, "down+res 26²"),
        (81, "13² + head0 conv"),
        (93, "FPN 26² + head1"),
        (106, "FPN 52² + head2"),
    ]

    outs, flops = stage_accounting(spec, 416)

    prev_ms = 0.0
    prev_i = -1
    rows = []
    for stop, label in cuts:
        fn = jax.jit(lambda f, s=stop: truncated_forward(
            spec, yolo_q, f, s, packed_stem_q=stem_q))
        ms = _time_ms(lambda: fn(frames), iters)
        seg_ms = ms - prev_ms
        seg_flops = sum(flops[prev_i + 1:stop + 1])
        # bf16 traffic estimate: every block output written+read once
        seg_bytes = sum(2 * o[0] * o[1] * o[2]
                        for o in outs[prev_i + 1:stop + 1]) * 2  # w+r
        rows.append((label, ms, seg_ms, seg_flops, seg_bytes))
        prev_ms, prev_i = ms, stop

    tot_ms = prev_ms
    print(f"{'stage':<20}{'cum_ms':>9}{'seg_ms':>9}{'ms/frm':>9}"
          f"{'GF/frm':>8}{'TOPS':>7}{'GB/s':>8}")
    for label, ms, seg, f, by in rows:
        gf = f / 1e9
        tops = gf * batch / max(seg, 1e-9)  # GF / ms == TF/s
        gbs = by * batch / max(seg, 1e-9) / 1e6  # bytes/ms → GB/s
        print(f"{label:<20}{ms:>9.2f}{seg:>9.2f}{seg / batch:>9.4f}"
              f"{gf:>8.2f}{tops:>7.0f}{gbs:>8.0f}")
    print(f"total {tot_ms:.2f} ms/batch = {tot_ms / batch:.4f} ms/frame")


if __name__ == "__main__":
    sys.exit(main())

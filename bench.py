"""End-to-end benchmark: detect→crop→keypoints frames/sec on one chip.

Measures the fused two-stage pipeline (full YOLOv3-416 + batched NMS + ROI
crop + RektNet soft-argmax) — BASELINE.json's headline metric, north star
≥2000 frames/sec/chip at 416×416 on TPU v5e.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

import jax

# Persistent compilation cache: the fused pipeline is one large XLA program
# and a cold compile through the TPU tunnel takes minutes; cache it on disk
# so repeat runs (and the driver's bench invocation) start hot.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 2000.0


def main():
    # NOTE: do NOT import __graft_entry__ here — it forces the CPU platform
    # at module import (required for the driver's virtual-mesh dryrun); the
    # bench must stay on the real chip.
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec as _flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.infer.pipeline import (
        two_stage_pipeline,
        two_stage_pipeline_int8,
    )
    from mit_driverless_cv_traininginfra_tpu.models import rektnet
    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn, init_params
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        calibrate,
        calibrate_rektnet,
        quantize_packed_stem,
        quantize_params,
        quantize_rektnet_params,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem,
        slice_preyolo,
        stem_is_packable,
    )

    spec = _flagship_spec(416)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    folded = fold_bn(params, state, spec)
    # serving-graph passes: single-class head slice + space-to-depth stem
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded) if stem_is_packable(spec) else None
    rp, rs = rektnet.init(jax.random.PRNGKey(1))
    rp = rektnet.fold_bn(rp, rs)
    rs = {}
    if on_tpu:
        folded = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), folded)
        rp = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), rp)
        rs = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), rs)
        if packed is not None:
            packed = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), packed)

    batch = 128 if on_tpu else 2
    iters = 20 if on_tpu else 2
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, 416, 416, 3)),
        compute_dtype,
    )
    frames = jax.device_put(frames, dev)

    use_int8 = on_tpu and "--bf16" not in sys.argv
    if use_int8:
        # int8 PTQ serving config (the reference's own deployment target is
        # TensorRT, where int8 serving is the norm); calibration on random
        # frames here — real deployments calibrate on dataset frames
        to_f32 = lambda t: jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32), t)
        folded32, packed32, rekt32 = to_f32(folded), to_f32(packed), to_f32(rp)
        cal = jnp.asarray(
            np.random.default_rng(2).uniform(0, 1, (2, 416, 416, 3)),
            jnp.float32)
        amax = calibrate(spec, folded32, cal)
        yolo_q = quantize_params(spec, folded32, amax)
        stem_q = (quantize_packed_stem(packed32, amax)
                  if packed32 is not None else None)
        crops_cal = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (8, 80, 80, 3)), jnp.float32)
        rekt_q = quantize_rektnet_params(rekt32,
                                         calibrate_rektnet(rekt32, crops_cal))

        def run(f):
            return two_stage_pipeline_int8(
                spec, yolo_q, stem_q, rekt_q, f,
                conf_thresh=0.8, nms_thresh=0.25, max_det=16,
            )
    else:
        def run(f):
            return two_stage_pipeline(
                spec, folded, {}, rp, rs, f,
                conf_thresh=0.8, nms_thresh=0.25, max_det=16,
                packed_stem=packed,
            )

    def sync(o):
        # NOTE: through the axon tunnel, block_until_ready() returns before
        # the computation finishes; a device→host scalar read is the only
        # reliable fence.
        return float(jnp.sum(o.keypoints)) + float(jnp.sum(o.scores))

    # warmup/compile
    sync(run(frames))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(frames)
    sync(out)  # queue executes in order; fencing the last fences them all
    dt = time.perf_counter() - t0

    fps = batch * iters / dt

    # p50 single-frame latency (BASELINE.json's second headline metric)
    p50_ms = None
    if on_tpu:
        # device-side B=1 latency: chained runs under one fence (a per-run
        # fence would measure the axon tunnel's RTT, not the chip)
        frame = frames[:1]
        sync(run(frame))  # compile B=1 variant
        lats = []
        for _ in range(5):
            t1 = time.perf_counter()
            o = None
            for _ in range(8):
                o = run(frame)
            sync(o)
            lats.append((time.perf_counter() - t1) * 1000 / 8)
        p50_ms = sorted(lats)[len(lats) // 2]

    out = {
        "metric": "e2e_detect_crop_keypoints_fps_416",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }
    if p50_ms is not None:
        # steady-state per-frame device time (8 chained B=1 runs under one
        # fence), NOT cold single-dispatch latency incl. transfer
        out["p50_device_frame_ms"] = round(p50_ms, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

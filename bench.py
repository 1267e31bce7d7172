"""End-to-end benchmark: detect→crop→keypoints frames/sec on one chip.

Measures the fused two-stage pipeline (full YOLOv3-416 + batched NMS + ROI
crop + RektNet soft-argmax) — BASELINE.json's headline metric, north star
≥2000 frames/sec/chip at 416×416 on TPU v5e.

Honesty measures (round-2): the model is first TRAINED on synthetic cone
scenes (data/synthetic.py) so conf logits have trained sparsity, the bench
frames are rendered cone scenes (not uniform noise), int8 PTQ calibrates on
that distribution, and the JSON carries a per-stage latency breakdown plus
achieved TFLOP/s. Trained weights are cached under ~/.cache/mdcv_bench/.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
     "stages_ms": {...}, ...}
"""

import json
import os
import sys
import time

import jax

# Persistent compilation cache: the fused pipeline is one large XLA program
# and a cold compile through the TPU tunnel takes minutes; cache it on disk
# so repeat runs (and the driver's bench invocation) start hot.
from mit_driverless_cv_traininginfra_tpu.utils.jaxcache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 2000.0
CKPT = os.path.expanduser("~/.cache/mdcv_bench/ckpt_v1.npz")


# canonical fence + chained timing (utils/profiling): block_until_ready is
# a no-op through the axon tunnel, and short chains measure dispatch, not
# the chip — one implementation, shared with the tools/ benches
from mit_driverless_cv_traininginfra_tpu.utils.profiling import (  # noqa: E402
    fence as _sync,
    time_ms as _time_ms,
)


# ---------------------------------------------------------------------------
# trained-weights cache (synthetic cone task)
# ---------------------------------------------------------------------------


def _tree_sha(trees) -> str:
    """Content hash of the benched weights (leaf bytes, not the npz
    container): pins round-over-round fps comparisons to like-for-like
    weights (VERDICT r3 weak-#1 — the headline is weight-dependent)."""
    import hashlib

    h = hashlib.sha256()
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


def _save_trees(path, trees):
    leaves = []
    for t in trees:
        leaves.extend(jax.tree_util.tree_leaves(t))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, *[np.asarray(l) for l in leaves])


def _load_trees(path, like):
    data = np.load(path)
    arrs = [data[k] for k in data.files]
    out, i = [], 0
    for t in like:
        leaves, treedef = jax.tree_util.tree_flatten(t)
        n = len(leaves)
        got = arrs[i:i + n]
        # shape-check every leaf against the live spec: a stale ckpt with
        # the right leaf COUNT but wrong shapes (model/spec edit without a
        # ckpt version bump) must trigger the retrain fallback here, not a
        # confusing conv shape error minutes into the benched compile
        for want, have in zip(leaves, got):
            if tuple(np.shape(want)) != tuple(have.shape):
                raise ValueError(
                    f"cached leaf shape {have.shape} != spec {np.shape(want)}")
        out.append(jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(a) for a in got]))
        i += n
    return out


def _train_synthetic(spec, steps_yolo=400, steps_rekt=400):
    """Short synthetic-cone training pass so the benched weights produce
    trained conf sparsity (VERDICT r1 #4). Returns (params, state, rp, rs)."""
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import (
        rektnet_batch,
        yolo_batch,
    )
    from mit_driverless_cv_traininginfra_tpu.models import rektnet
    from mit_driverless_cv_traininginfra_tpu.models.darknet import init_params
    from mit_driverless_cv_traininginfra_tpu.train.optim import make_optimizer
    from mit_driverless_cv_traininginfra_tpu.train.steps import (
        init_train_state,
        rektnet_train_step,
        yolo_train_step,
    )

    rng = np.random.default_rng(0)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    rp, rs = rektnet.init(jax.random.PRNGKey(1))
    if os.path.exists(CKPT):
        try:
            params, state, rp, rs = _load_trees(CKPT, [params, state, rp, rs])
            print("bench: loaded cached trained weights", file=sys.stderr)
            return params, state, rp, rs
        except Exception as e:  # stale cache → retrain
            print(f"bench: ckpt load failed ({e}); retraining", file=sys.stderr)

    t0 = time.perf_counter()
    # --- YOLO: pool of pre-rendered scenes, B=8, bf16 compute -------------
    pool_i, pool_t = yolo_batch(rng, 256, size=spec.net.height)
    pool_i = jnp.asarray(pool_i)
    pool_t = jnp.asarray(pool_t)
    tx = make_optimizer("Adam", lr=5e-4)
    ts = init_train_state(params, state, tx)
    B = 8
    for step in range(steps_yolo):
        idx = rng.integers(0, pool_i.shape[0], B)
        ts, loss, _ = yolo_train_step(spec, tx, ts, pool_i[idx], pool_t[idx],
                                      compute_dtype="bfloat16")
        if step % 100 == 0:
            print(f"bench: yolo step {step} loss {float(loss):.3f}",
                  file=sys.stderr)
    params, state = ts.params, ts.model_state

    # --- RektNet: synthetic crops, point-supervised -----------------------
    # loss_type='l1_softargmax' reads only the soft-argmax points; the
    # on-device gaussian heatmap targets (synth_target_sigma) are traced
    # but DCE'd by XLA under this loss — they matter only for l2_heatmap
    crop_i, crop_p = rektnet_batch(rng, 512)
    crop_i = jnp.asarray(crop_i)
    crop_p = jnp.asarray(crop_p)
    rtx = make_optimizer("Adam", lr=1e-3)
    rts = init_train_state(rp, rs, rtx)
    dummy_hm = jnp.zeros((1,), jnp.float32)
    for step in range(steps_rekt):
        idx = rng.integers(0, crop_i.shape[0], 64)
        rts, total, loc, _ = rektnet_train_step(
            rtx, rts, crop_i[idx], dummy_hm, crop_p[idx],
            loss_type="l1_softargmax", include_geo=True,
            geo_loss_gamma_horz=0.05, geo_loss_gamma_vert=0.05,
            compute_dtype="bfloat16", synth_target_sigma=1.0)
        if step % 100 == 0:
            print(f"bench: rekt step {step} loss {float(total):.4f}",
                  file=sys.stderr)
    rp, rs = rts.params, rts.model_state
    print(f"bench: synthetic training took {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    _save_trees(CKPT, [params, state, rp, rs])
    return params, state, rp, rs


def _pick_conf_thresh(spec, folded, packed, frames, max_det):
    """Reference operating point conf 0.8 if it fires realistically on the
    trained model; otherwise the threshold yielding ~12 pre-NMS
    candidates/frame (reported in the JSON either way)."""
    from mit_driverless_cv_traininginfra_tpu.models.darknet import detections

    dets = detections(spec, folded, {}, frames[:16], packed_stem=packed,
                      with_classes=False)
    conf = np.asarray(dets[..., 4], np.float32)
    per_frame_08 = (conf > 0.8).sum(axis=1).mean()
    if 1.0 <= per_frame_08 <= 5 * max_det:
        return 0.8, float(per_frame_08)
    want = 12
    thresh = float(np.quantile(conf, 1.0 - want / conf.shape[1]))
    thresh = min(max(thresh, 0.05), 0.95)
    return thresh, float((conf > thresh).sum(axis=1).mean())


def main():
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec as _flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import yolo_batch
    from mit_driverless_cv_traininginfra_tpu.infer.pipeline import (
        two_stage_pipeline,
        two_stage_pipeline_int8,
    )
    from mit_driverless_cv_traininginfra_tpu.models import rektnet
    from mit_driverless_cv_traininginfra_tpu.models.darknet import fold_bn
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        apply_rektnet_int8,
        calibrate,
        calibrate_rektnet,
        detections_int8,
        quantize_packed_stem,
        quantize_params,
        quantize_rektnet_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem,
        slice_preyolo,
        stem_is_packable,
    )
    from mit_driverless_cv_traininginfra_tpu.utils.profiling import (
        conv_graph_flops,
        rektnet_flops,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    max_det = 16
    if "--max-det" in sys.argv:
        max_det = int(sys.argv[sys.argv.index("--max-det") + 1])

    spec = _flagship_spec(416)
    trained = on_tpu and "--no-train" not in sys.argv
    # --yolo-weights <file.weights>: bench PRODUCTION-trained detector
    # weights (e.g. the cli.yolo_train output, VERDICT r4 #1) instead of
    # the cached synthetic-training weights; RektNet stays cache-trained.
    yolo_weights = (sys.argv[sys.argv.index("--yolo-weights") + 1]
                    if "--yolo-weights" in sys.argv else None)
    weights_sha = None
    if trained:
        params, state, rp, rs = _train_synthetic(spec)
        if yolo_weights:
            from mit_driverless_cv_traininginfra_tpu.models.darknet import (
                load_darknet_weights,
            )

            params, state, _ = load_darknet_weights(spec, params, state,
                                                    yolo_weights)
            print(f"bench: YOLO weights from {yolo_weights}",
                  file=sys.stderr)
        weights_sha = _tree_sha([params, state, rp, rs])
        print(f"bench: weights_sha {weights_sha}", file=sys.stderr)
    else:
        from mit_driverless_cv_traininginfra_tpu.models.darknet import (
            init_params,
        )

        params, state = init_params(spec, jax.random.PRNGKey(0))
        rp, rs = rektnet.init(jax.random.PRNGKey(1))

    folded = fold_bn(params, state, spec)
    # serving-graph passes: single-class head slice + space-to-depth stem
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded) if stem_is_packable(spec) else None
    rp = rektnet.fold_bn(rp, rs)
    rs = {}

    # bench frames: rendered cone scenes (trained distribution)
    scene_rng = np.random.default_rng(42)
    batch = 128 if on_tpu else 2
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    iters = 20 if on_tpu else 2
    frames_np, _ = yolo_batch(scene_rng, batch, size=416)

    if on_tpu:
        to_c = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype), t)
        folded_c, rp_c = to_c(folded), to_c(rp)
        packed_c = to_c(packed) if packed is not None else None
    else:
        folded_c, rp_c, packed_c = folded, rp, packed
    frames = jax.device_put(jnp.asarray(frames_np, compute_dtype), dev)

    # operating point: trained conf sparsity decides the threshold
    frames32 = jnp.asarray(frames_np[:16], jnp.float32)
    conf_thresh, prenms_per_frame = _pick_conf_thresh(
        spec, folded, packed, frames32, max_det)

    # --kpt-pad N: run RektNet on the crop buffer zero-padded to the next
    # N-multiple while the crop gather stays at the fine-grained capacity
    # (the capacity-quantum-slack A/B, VERDICT r3 #6). 0 = off. Parsed
    # before the run() closures — they capture it.
    kpt_pad = (int(sys.argv[sys.argv.index("--kpt-pad") + 1])
               if "--kpt-pad" in sys.argv else 0)

    use_int8 = on_tpu and "--bf16" not in sys.argv
    # windowed-DMA Pallas crop (ops/pallas_crop.py): bit-exact in-contract,
    # measured 1.3-1.55x vs the indexed crop standalone (r3). Default ON on
    # TPU; --no-crop-kernel reverts to the XLA indexed crop.
    from mit_driverless_cv_traininginfra_tpu.ops.pallas_crop import (
        crop_kernel_applicable,
    )

    use_crop_kernel = (on_tpu and "--no-crop-kernel" not in sys.argv
                       and crop_kernel_applicable(416, 416, 3, 80, 80))
    crop_cap = [None]  # set after the dense warmup measures detection load
    if use_int8:
        # int8 PTQ serving config (the reference's own deployment target is
        # TensorRT, where int8 serving is the norm); calibration on the
        # same synthetic-scene distribution the weights were trained on
        cal = jnp.asarray(frames_np[:8], jnp.float32)
        amax = calibrate(spec, folded, cal)
        yolo_q = quantize_params(spec, folded, amax)
        stem_q = (quantize_packed_stem(packed, amax)
                  if packed is not None else None)
        from mit_driverless_cv_traininginfra_tpu.data.synthetic import (
            rektnet_batch,
        )

        crops_cal, _ = rektnet_batch(np.random.default_rng(3), 32)
        rekt_q = quantize_rektnet_params(
            rp, calibrate_rektnet(rp, jnp.asarray(crops_cal)))
        from mit_driverless_cv_traininginfra_tpu.ops.pallas_entry import (
            entry_block_applicable,
            quantize_entry,
        )

        # --conv1 bf16: the 4×4 conv1 stage is layout-bound, not MXU-bound
        # (tools/bench_conv1_4x4.py: bf16 5.26 vs int8 5.78 ms/batch) —
        # measure-then-adopt experiment flag
        conv1_dtype = (sys.argv[sys.argv.index("--conv1") + 1]
                       if "--conv1" in sys.argv else "int8")
        entry_q = (quantize_entry(folded, amax, conv1_dtype=conv1_dtype)
                   if entry_block_applicable(spec)
                   and "--no-entry-kernel" not in sys.argv else None)

        def run(f):
            return two_stage_pipeline_int8(
                spec, yolo_q, stem_q, rekt_q, f,
                conf_thresh=conf_thresh, nms_thresh=0.25, max_det=max_det,
                crop_capacity=crop_cap[0], entry_q=entry_q,
                crop_kernel=use_crop_kernel and crop_cap[0] is not None,
                kpt_pad_multiple=kpt_pad,
            )
    else:
        def run(f):
            return two_stage_pipeline(
                spec, folded_c, {}, rp_c, rs, f,
                conf_thresh=conf_thresh, nms_thresh=0.25, max_det=max_det,
                packed_stem=packed_c, crop_capacity=crop_cap[0],
                crop_kernel=use_crop_kernel and crop_cap[0] is not None,
                kpt_pad_multiple=kpt_pad,
            )

    # dense warmup: compile + measure the actual detection load
    out0 = run(frames)
    _sync(out0.keypoints, out0.scores)
    mean_det = float(np.asarray(out0.mask, np.float32).sum(axis=1).mean())
    # 1.1 is the measured-safe margin for the bench's stationary synthetic
    # load (p99+10% ≫ observed σ; zero overflows across the study runs);
    # AdaptiveCapacity's generic default stays 1.25.
    cap_margin = (float(sys.argv[sys.argv.index("--cap-margin") + 1])
                  if "--cap-margin" in sys.argv else 1.1)
    # Capacity quantum: keypoint cost is roughly linear at 128-steps but
    # XLA's RektNet schedule prefers 128-multiple batches (416 crops cost
    # 0.119 ms/frame vs 384's 0.091 — PERF.md "Capacity quantum"), so
    # quantum 32 recovers only ~half the bucket-rounding slack; still the
    # measured-best default (2251.9 vs 2210.7 fps at quantum 128).
    cap_quantum = (int(sys.argv[sys.argv.index("--cap-quantum") + 1])
                   if "--cap-quantum" in sys.argv else 32)
    if cap_quantum < 1:
        raise SystemExit(f"--cap-quantum must be >= 1, got {cap_quantum}")
    if on_tpu:
        # crop compaction: RektNet runs on the valid crops only (the r1
        # breakdown showed masked padding slots were 57% of e2e time).
        # Capacity from the serving AdaptiveCapacity policy (p99 of
        # observed batch loads × margin, quantised to --cap-quantum,
        # default 32).
        from mit_driverless_cv_traininginfra_tpu.infer.capacity import (
            AdaptiveCapacity,
        )

        policy = AdaptiveCapacity(floor=256, margin=cap_margin,
                                  quantum=cap_quantum)
        policy.observe_mask(out0.mask)
        crop_cap[0] = policy.capacity(batch, max_det)
        out0 = run(frames)  # compile the compacted variant
        _sync(out0.keypoints, out0.scores)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(frames)
    _sync(out.keypoints, out.scores)  # queue executes in order
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    # whether the Pallas crop ACTUALLY ran in the timed e2e: with
    # capacity >= batch*max_det the pipeline takes the dense path and the
    # kernel flag is inert — report what executed, not what was requested
    kernel_active = bool(use_crop_kernel and crop_cap[0] is not None
                         and crop_cap[0] < batch * max_det)

    # analytic achieved-compute rate (conv MACs only, serving graph)
    yolo_gf = conv_graph_flops(spec) / 1e9
    crops_per_frame = (crop_cap[0] / batch if crop_cap[0] is not None
                       else max_det)
    rekt_gf = rektnet_flops() / 1e9 * crops_per_frame
    tops = (yolo_gf + rekt_gf) * fps / 1e3

    out_json = {
        "metric": "e2e_detect_crop_keypoints_fps_416",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "conf_thresh": round(conf_thresh, 3),
        "prenms_cand_per_frame": round(prenms_per_frame, 1),
        "mean_det_per_frame": round(mean_det, 2),
        "trained_weights": trained,
        "weights_sha": weights_sha,
        "yolo_weights_src": yolo_weights or "bench-cache",
        "int8": use_int8,
        "flops_per_frame_g": round(yolo_gf + rekt_gf, 1),
        "achieved_tops": round(tops, 1),
        "max_det": max_det,
        "crop_capacity": crop_cap[0],
        "cap_margin": cap_margin,
        "cap_quantum": cap_quantum,
        "crop_kernel": kernel_active,
    }

    if on_tpu:
        # ---- per-stage breakdown (isolated jits; e2e overlaps them) ------
        from mit_driverless_cv_traininginfra_tpu.infer.pipeline import (
            _postprocess,
        )

        if use_int8:
            det_fn = jax.jit(lambda f: detections_int8(
                spec, yolo_q, f, packed_stem_q=stem_q, with_classes=False,
                entry_q=entry_q))
            kpt_fn = jax.jit(
                lambda c: apply_rektnet_int8(rekt_q, c)[1])
        else:
            from mit_driverless_cv_traininginfra_tpu.models.darknet import (
                detections,
            )

            det_fn = jax.jit(lambda f: detections(
                spec, folded_c, {}, f, packed_stem=packed_c,
                with_classes=False))
            kpt_fn = jax.jit(lambda c: rektnet.apply_folded(rp_c, c)[1])
        post_fn = jax.jit(lambda d: _postprocess(d, conf_thresh, 0.25,
                                                 max_det))
        C = crop_cap[0]
        # time the SAME crop op the e2e configuration executed — a
        # breakdown over the XLA indexed crop while the headline ran the
        # Pallas windowed crop would misattribute ~30-55% of crop cost
        if kernel_active:
            from mit_driverless_cv_traininginfra_tpu.ops.pallas_crop import (
                roi_crop_windowed,
            )

            crop_fn = jax.jit(
                lambda f, b, i: roi_crop_windowed(f, b, i, 80, 80))
        else:
            from mit_driverless_cv_traininginfra_tpu.ops.image import (
                roi_crop_bilinear_indexed,
            )

            crop_fn = jax.jit(
                lambda f, b, i: roi_crop_bilinear_indexed(f, b, i, 80, 80))

        dets = det_fn(frames)
        boxes, scores, mask = post_fn(dets)
        key = jnp.where(mask.reshape(-1), -scores.reshape(-1), jnp.inf)
        sel = jax.lax.top_k(-key, C)[1]
        boxes_c = boxes.reshape(-1, 4)[sel]
        fidx = (sel // max_det).astype(jnp.int32)
        flat = crop_fn(frames, boxes_c, fidx)

        # depth 32: shorter chains leave axon dispatch gaps in sub-5ms
        # stages (PERF.md measurement discipline)
        n = 32
        stages = {
            "detect_ms": _time_ms(lambda: det_fn(frames),
                                  lambda o: o[..., 4], n),
            "nms_ms": _time_ms(lambda: post_fn(dets), lambda o: o[1], n),
            "crop_ms": _time_ms(lambda: crop_fn(frames, boxes_c, fidx),
                                lambda o: o[..., 0, 0, 0], n),
            "keypoint_ms": _time_ms(lambda: kpt_fn(flat),
                                    lambda o: o[..., 0], n),
        }
        stages = {k: round(v / batch, 4) for k, v in stages.items()}
        stages["sum_ms"] = round(sum(stages.values()), 4)
        stages["e2e_ms"] = round(1000.0 / fps, 4)
        out_json["stages_per_frame_ms"] = stages

        # p50 single-frame latency: device-side B=1 latency. Chain DEEP
        # (64) under one fence: per-call dispatch through the axon tunnel
        # is ~0.4-1.4 ms and only pipelines away at depth ≫8 (measured:
        # x8 ≈ 9 ms/frame of mostly tunnel, x128 ≈ 2.9 ms of mostly chip).
        # The B=1 serving config caps crops at max_det/2 (covers every
        # scene up to 8 cones; the batch-wide capacity is meaningless at
        # B=1) — reported as p50_crop_capacity.
        frame = frames[:1]
        b1_cap = max_det // 2
        saved_cap = crop_cap[0]
        crop_cap[0] = b1_cap
        o = run(frame)
        _sync(o.keypoints, o.scores)
        lats = []
        for _ in range(5):
            t1 = time.perf_counter()
            o = None
            for _ in range(64):
                o = run(frame)
            _sync(o.keypoints, o.scores)
            lats.append((time.perf_counter() - t1) * 1000 / 64)
        crop_cap[0] = saved_cap
        # steady-state per-frame device time, NOT cold single-dispatch
        # latency incl. transfer
        out_json["p50_device_frame_ms"] = round(sorted(lats)[len(lats) // 2], 2)
        out_json["p50_crop_capacity"] = b1_cap

        # ---- serving-runtime measurement (VERDICT r3 #1): the same
        # program through the production TwoStageServer frontend — warmup
        # wall, steady fps incl. observation/policy overhead, latency
        # percentiles, and the compiles==0 deployment invariant. Reruns
        # every round so the serving runtime stays evidenced.
        if use_int8:
            from mit_driverless_cv_traininginfra_tpu.infer.capacity import (
                AdaptiveCapacity,
            )
            from mit_driverless_cv_traininginfra_tpu.infer.serving import (
                TwoStageServer,
            )

            # free the breakdown/B=1 stages' device arrays before serving:
            # `dets` alone is B×10647×85 f32 ≈ 460 MB, and at the larger
            # crop capacities production-trained weights demand (672-768)
            # the leftover HBM pressure showed up as multi-second remote
            # allocator stalls INSIDE the timed serve window (measured:
            # 15 s at the bucket switch with run2 weights; the same
            # switch is 96 ms in a clean process — tools-probed). A
            # deployed server process doesn't carry another program's
            # working set; the bench shouldn't either.
            import gc

            del dets, boxes, scores, mask, key, sel, boxes_c, fidx, flat
            del o, out0, out
            gc.collect()

            cap = crop_cap[0]
            server = TwoStageServer(
                spec, yolo_q=yolo_q, stem_q=stem_q, rekt_q=rekt_q,
                entry_q=entry_q, conf_thresh=conf_thresh, nms_thresh=0.25,
                max_det=max_det,
                policy=AdaptiveCapacity(floor=min(256, cap),
                                        margin=cap_margin,
                                        quantum=cap_quantum,
                                        warmup_capacity=cap),
                observe_every=8, crop_kernel=kernel_active)
            # 3-bucket lattice (VERDICT r4 #6): the timed window below
            # injects a load shift, so growth must land on a warmed bucket
            lattice = [cap, cap + cap_quantum, cap + 2 * cap_quantum]
            wsecs = server.warmup([batch], capacities=lattice,
                                  pad_sizes=[batch - 28])
            # event frames: a SHORT batch (zero-pad bucket) and a
            # higher-load scene set (more cones/frame -> the policy's p99
            # want grows -> bucket switch, still compile-free). Detection
            # density is WEIGHT-dependent (2.75 det/frame cache weights vs
            # 4.74 production run2), so escalate scene density until the
            # grow condition is guaranteed under the weights actually
            # benched — a fixed density crossed the bucket with production
            # weights but missed it with the cache weights.
            short_frames = frames[: batch - 28]
            # keep the candidate with the HIGHEST observed load: scene
            # density and detection count are not monotone (a detector
            # trained on <=8-cone scenes underfires on crowded 40-cone
            # ones), and an under-base "shift" would inject a load DROP
            shift_np = shift_cones = None
            shift_batch_dets = -1.0
            for mc in (14, 20, 28, 40):
                cand, _ = yolo_batch(np.random.default_rng(7), batch,
                                     size=416, max_cones=mc)
                probe = run(jax.device_put(
                    jnp.asarray(cand, compute_dtype), dev))
                bd = float(np.asarray(probe.mask, np.float32).sum())
                if bd > shift_batch_dets:
                    shift_np, shift_cones, shift_batch_dets = cand, mc, bd
                if bd * cap_margin >= cap + cap_quantum / 2:
                    break
            del probe
            shift_frames = jax.device_put(
                jnp.asarray(shift_np, compute_dtype), dev)
            # fence the ~130 MB upload: it rides the device stream, and an
            # in-flight H2D would otherwise land inside the bootstrap
            # observation's fenced window (measured: a 2.9 s "p99")
            _sync(shift_frames)
            # 5 untimed calls restart the dispatch pipeline after warmup's
            # fence, then a 64-deep timed window — a 20-call window right
            # after warmup measures one queue drain, not the server
            # (PERF.md "Measurement discipline": the first cut of this
            # block read 134 fps that way)
            s_iters = 64

            def timed_window():
                """One 64-call window with the pad + load-shift events.
                Returns (wall_s, frames_served, capacity trace, per-call
                dispatch walls). Deferred serving returns immediately, so
                a big per-call wall is a STALL (hidden compile, host
                round-trip, remote-server event), not batch latency."""
                w = None
                for _ in range(5):
                    w = server(frames)
                _sync(w.keypoints, w.scores)
                trace, walls, served = set(), [], 0
                t_w = time.perf_counter()
                for i in range(s_iters):
                    if i == 24:
                        fr = short_frames      # pad-path event
                    elif 25 <= i < 41:
                        fr = shift_frames      # load-shift event
                    else:
                        fr = frames
                    c0 = time.perf_counter()
                    w = server(fr)
                    walls.append((time.perf_counter() - c0) * 1e3)
                    served += int(fr.shape[0])
                    trace.add(server.current_capacity)
                _sync(w.keypoints, w.scores)
                return time.perf_counter() - t_w, served, trace, walls

            sdt, s_frames, cap_trace, call_ms = timed_window()
            # the axon remote server shows a rare multi-second dispatch
            # stall unrelated to any client code path (PERF.md
            # "Serve-window stall forensics": periodic ~25 min into the
            # process, compiles==0, every local mechanism ruled out).
            # When one lands inside the window, archive it and re-run the
            # window ONCE so the per-round artifact measures the server,
            # not the infra event — both windows' numbers are kept.
            stall_retry = None
            if max(call_ms) > 1500.0:
                stall_retry = {
                    "fps": round(s_frames / sdt, 2),
                    "max_dispatch_stall_ms": round(max(call_ms), 1),
                    "max_dispatch_stall_at": int(np.argmax(call_ms)),
                    "bucket_switches": len(cap_trace) - 1,
                }
                sdt, s_frames, cap_trace, call_ms = timed_window()
            st = server.stats()
            assert st["compiles"] == 0, (
                f"serving path compiled after warmup: {st}")
            assert st["batch_pads"] >= 1, f"pad path never ran: {st}"
            # fenced latency percentiles — the SLA numbers (VERDICT r4
            # #2b); the deferred-mode pipeline_wall_ms is archived too,
            # labeled as pipeline depth, NOT latency. The bootstrap
            # observation's fenced sample measures the warmup->serve
            # TRANSITION (first post-warmup fence; the r5 "1.7 s outlier")
            # — archive it under its own name and keep the percentile
            # ring to pure steady-state measure_latency samples.
            boot_ms = [ms for _, ms in server.latencies]
            server.latencies.clear()
            server.measure_latency(frames, n=24)
            lat = server.latency_stats()
            out_json["serve"] = {
                "fps": round(s_frames / sdt, 2),
                "warmup_s": round(wsecs, 2),
                "warmed_capacities": lattice,
                "weights_sha": weights_sha,
                "compiles_after_warmup": st["compiles"],
                "batch_pads": st["batch_pads"],
                "bucket_switches_in_window": len(cap_trace) - 1,
                "capacities_served": sorted(cap_trace),
                "grows": st["grows"],
                "capacity_exhausted": st["capacity_exhausted"],
                "latency_fenced_batch_ms": lat["latency_batch_ms"],
                "latency_fenced_frame_ms": lat["latency_frame_ms"],
                "pipeline_wall_ms": lat["pipeline_wall_ms"],
                "pipeline_depth": lat["pipeline_depth"],
                "max_dispatch_stall_ms": round(max(call_ms), 1),
                "max_dispatch_stall_at": int(np.argmax(call_ms)),
                # which steady-state fenced sample is the ring max —
                # localizes a p99 outlier (bootstrap transition samples
                # are archived separately as bootstrap_fenced_ms)
                "fenced_max_at": int(np.argmax(
                    [ms for _, ms in server.latencies])),
                "fenced_n": len(server.latencies),
                "bootstrap_fenced_ms": (round(max(boot_ms), 1)
                                        if boot_ms else None),
                "shift_max_cones": shift_cones,
                "shift_batch_dets": shift_batch_dets,
                "window_retries": 0 if stall_retry is None else 1,
                "stall_retry": stall_retry,
                "crop_kernel_active": st["crop_kernel_active"],
            }

    print(json.dumps(out_json))
    return 0


if __name__ == "__main__":
    sys.exit(main())

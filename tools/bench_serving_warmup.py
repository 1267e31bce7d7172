"""Measure TwoStageServer bucket-switch stalls and warmup cost on chip
(VERDICT r2 #2).

A (batch, capacity) bucket is one compiled XLA program; entering an
uncompiled bucket on the serving path stalls for the full compile (minutes
through the axon tunnel — the r2 finding). This tool measures, on the real
chip, with the production int8 flagship config:

1. cold first-call latency on an unwarmed bucket (the stall),
2. `warmup()` wall time for a 3-bucket lattice,
3. steady-state call time after warmup,
4. a policy-driven capacity SWITCH between two warmed buckets
   (must be a jit-cache hit, not a compile).

Usage: python tools/bench_serving_warmup.py [--batch 128]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    # NOTE: deliberately NOT sharing bench.py's persistent cache for the
    # stall measurement — a cache hit would understate the cold stall. The
    # warmup/steady numbers are cache-independent (in-process jit cache).
    jax.config.update("jax_compilation_cache_dir", None)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=416)
    args = ap.parse_args()

    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.infer.capacity import (
        AdaptiveCapacity,
    )
    from mit_driverless_cv_traininginfra_tpu.infer.serving import (
        TwoStageServer,
    )
    from mit_driverless_cv_traininginfra_tpu.models import rektnet
    from mit_driverless_cv_traininginfra_tpu.models.darknet import (
        fold_bn,
        init_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        calibrate,
        calibrate_rektnet,
        quantize_packed_stem,
        quantize_params,
        quantize_rektnet_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
        build_packed_stem,
        slice_preyolo,
        stem_is_packable,
    )

    spec = flagship_spec(args.size)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    folded = fold_bn(params, state, spec)
    spec, folded = slice_preyolo(spec, folded)
    packed = build_packed_stem(folded) if stem_is_packable(spec) else None
    rng = np.random.default_rng(0)
    cal = jnp.asarray(rng.uniform(0, 1, (4, args.size, args.size, 3)),
                      jnp.float32)
    amax = calibrate(spec, folded, cal)
    yolo_q = quantize_params(spec, folded, amax)
    stem_q = quantize_packed_stem(packed, amax) if packed is not None else None
    rp, rs = rektnet.init(jax.random.PRNGKey(1))
    rpf = rektnet.fold_bn(rp, rs)
    rekt_q = quantize_rektnet_params(
        rpf, calibrate_rektnet(rpf, jnp.asarray(
            rng.uniform(0, 1, (8, 80, 80, 3)), jnp.float32)))

    B = args.batch
    policy = AdaptiveCapacity(floor=256, margin=1.25, quantum=128,
                              shrink_patience=1)
    srv = TwoStageServer.from_params(
        spec, yolo_q, stem_q, rekt_q, conf_thresh=0.3, max_det=16,
        policy=policy, observe_every=10**9)  # manual observation control
    frames = jnp.asarray(rng.uniform(0, 1, (B, args.size, args.size, 3)),
                         jnp.bfloat16)

    def fence(out):
        return float(jnp.sum(out.scores))

    # 1) cold stall: first call on an unwarmed bucket
    t0 = time.perf_counter()
    fence(srv(frames))
    cold_stall_s = time.perf_counter() - t0

    # 2) warmup a 3-bucket lattice (the cold bucket is cached in-process,
    # so this times the two new buckets + three fenced executions)
    t0 = time.perf_counter()
    srv.warmup([B], capacities=[256, 384, 512])
    warmup_s = time.perf_counter() - t0

    # 3) steady state (chain 32 under one fence); fence the priming call
    # BEFORE starting the clock or its in-flight work leaks into the
    # timed window (~one call, ~3% at depth 32)
    fence(srv(frames))
    t0 = time.perf_counter()
    for _ in range(32):
        out = srv(frames)
    fence(out)
    steady_ms = (time.perf_counter() - t0) * 1000 / 32
    cap_a = srv.current_capacity

    # 4) policy-driven switch to ANOTHER warmed bucket: inject a load
    # history that wants a different bucket; the next call must not stall
    want = 500 if cap_a <= 384 else 100
    for _ in range(64):
        policy.observe(want)
    t0 = time.perf_counter()
    fence(srv(frames))
    switch_ms = (time.perf_counter() - t0) * 1000
    cap_b = srv.current_capacity
    assert cap_b != cap_a, (cap_a, cap_b)
    assert srv.compiles == 1, srv.stats()  # only the pre-warmup cold call

    print(json.dumps({
        "metric": "serving_bucket_stall",
        "batch": B,
        "cold_stall_s": round(cold_stall_s, 1),
        "warmup_3buckets_s": round(warmup_s, 1),
        "steady_call_ms": round(steady_ms, 1),
        "warmed_switch_ms": round(switch_ms, 1),
        "switch": [cap_a, cap_b],
        "stats": {k: v for k, v in srv.stats().items()
                  if k not in ("warmed_buckets",)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

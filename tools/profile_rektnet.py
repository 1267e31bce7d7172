"""Per-layer profile of the int8 RektNet serving path at crop capacity
(512 crops, depth-32 chains)."""

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


def _time_ms(fn, iters=32):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) * 1000 / iters


def main():
    import bench as bench_mod
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.data.synthetic import (
        rektnet_batch,
    )
    from mit_driverless_cv_traininginfra_tpu.models import rektnet
    from mit_driverless_cv_traininginfra_tpu.models.quantize import (
        _qconv, apply_rektnet_int8, calibrate_rektnet,
        quantize_rektnet_params,
    )
    from mit_driverless_cv_traininginfra_tpu.models.rektnet import (
        conv2d, soft_argmax_2d,
    )

    spec = flagship_spec(416)
    _, _, rp, rs = bench_mod._train_synthetic(spec)
    rp = rektnet.fold_bn(rp, rs)
    crops_cal, _ = rektnet_batch(np.random.default_rng(3), 32)
    q = quantize_rektnet_params(rp, calibrate_rektnet(
        rp, jnp.asarray(crops_cal)))

    C = 512
    rng = np.random.default_rng(7)
    crops = jax.device_put(jnp.asarray(rng.random((C, 80, 80, 3)),
                                       jnp.bfloat16), jax.devices()[0])

    full = jax.jit(lambda c: apply_rektnet_int8(q, c)[1])
    print(f"full int8 rektnet (512): {_time_ms(lambda: full(crops)):8.2f} ms")

    # per-layer: build cumulative prefixes
    def prefix(depth):
        def f(x):
            h = jax.nn.relu(_qconv(x, q["stem"], 1, 3, jnp.bfloat16))
            if depth == 0:
                return h
            for i in range(1, min(depth, 4) + 1):
                p = q[f"res{i}"]
                a1 = jax.nn.relu(_qconv(h, p["conv1"], 1, 2, jnp.bfloat16,
                                        dilation=2))
                b2 = _qconv(a1, p["conv2"], 1, 1, jnp.bfloat16)
                sc = _qconv(h, p["shortcut_conv"], 1, 0, jnp.bfloat16)
                h = jax.nn.relu(sc + b2)
            if depth <= 4:
                return h
            logits = conv2d(h.astype(jnp.float32), q["out"]["w"],
                            q["out"]["b"])
            if depth == 5:
                return logits
            pts, _ = soft_argmax_2d(jnp.transpose(logits, (0, 3, 1, 2)))
            return pts
        return jax.jit(f)

    labels = ["stem 3→16", "res1 16", "res2 32", "res3 64", "res4 128",
              "out conv", "softargmax"]
    prev = 0.0
    for d, lab in enumerate(labels):
        ms = _time_ms(lambda f=prefix(d): f(crops))
        print(f"{lab:<12} cum {ms:7.2f}  seg {ms - prev:7.2f} ms")
        prev = ms


if __name__ == "__main__":
    main()

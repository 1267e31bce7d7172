"""Isolate RektNet res4's three convs at 512 crops (depth-32): is the
dilation-2 conv the slow one, and does a dense 5x5 or shifted-matmul
formulation beat XLA's rhs_dilation?"""

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
        _qconv, calibrate_rektnet, quantize_rektnet_params,
    )

    spec = flagship_spec(416)
    _, _, rp, rs = bench_mod._train_synthetic(spec)
    rp = rektnet.fold_bn(rp, rs)
    crops_cal, _ = rektnet_batch(np.random.default_rng(3), 32)
    q = quantize_rektnet_params(rp, calibrate_rektnet(
        rp, jnp.asarray(crops_cal)))
    p4 = q["res4"]

    C = 512
    rng = np.random.default_rng(7)
    h = jax.device_put(jnp.asarray(rng.random((C, 80, 80, 64)),
                                   jnp.bfloat16), jax.devices()[0])

    c1 = jax.jit(lambda x: _qconv(x, p4["conv1"], 1, 2, jnp.bfloat16,
                                  dilation=2))
    a1 = c1(h)
    c2 = jax.jit(lambda x: _qconv(x, p4["conv2"], 1, 1, jnp.bfloat16))
    sc = jax.jit(lambda x: _qconv(x, p4["shortcut_conv"], 1, 0,
                                  jnp.bfloat16))
    print(f"res4.conv1 d2 3x3 64→128 : {_time_ms(lambda: c1(h)):8.2f} ms "
          f"({0.943 * C / 1e3:.2f} TF)")
    print(f"res4.conv2    3x3 128→128: {_time_ms(lambda: c2(a1)):8.2f} ms "
          f"({1.887 * C / 1e3:.2f} TF)")
    print(f"res4.shortcut 1x1 64→128 : {_time_ms(lambda: sc(h)):8.2f} ms "
          f"({0.105 * C / 1e3:.2f} TF)")

    # variant: dilated conv as dense 5x5 with zeros
    wq = np.zeros((5, 5, 64, 128), np.int8)
    wq[::2, ::2] = np.asarray(p4["conv1"]["wq"])
    q5 = dict(p4["conv1"], wq=jnp.asarray(wq))
    c1b = jax.jit(lambda x: _qconv(x, q5, 1, 2, jnp.bfloat16))
    print(f"variant dense 5x5        : {_time_ms(lambda: c1b(h)):8.2f} ms")
    same = np.allclose(np.asarray(c1(h[:4]), np.float32),
                       np.asarray(c1b(h[:4]), np.float32), atol=1e-2)
    print("dense-5x5 equivalent:", same)

    # variant: 9 shifted int8 matmuls accumulated in int32
    wt = jnp.asarray(p4["conv1"]["wq"]).reshape(9, 64, 128)

    def c1c_(x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32)
                                * p4["conv1"]["sx_inv"]),
                      -127, 127).astype(jnp.int8)
        xp = jnp.pad(xq, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(
                    xp, (0, 2 * dy, 2 * dx, 0),
                    (x.shape[0], 2 * dy + 80, 2 * dx + 80, 64))
                t = jax.lax.dot_general(
                    sl, wt[dy * 3 + dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = t if acc is None else acc + t
        return (acc.astype(jnp.float32) * p4["conv1"]["scale"]
                + p4["conv1"]["b"]).astype(jnp.bfloat16)

    c1c = jax.jit(c1c_)
    print(f"variant 9 shifted matmuls: {_time_ms(lambda: c1c(h)):8.2f} ms")
    same = np.allclose(np.asarray(c1(h[:4]), np.float32),
                       np.asarray(c1c(h[:4]), np.float32), atol=1e-2)
    print("shifted-matmul equivalent:", same)


if __name__ == "__main__":
    main()

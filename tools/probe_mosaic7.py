"""Seventh probe round: XLA im2col cost for conv1 and DMA of the
(B,208,208,108) patch tensor.

im2col construction: for k-group (dy,p) (6 groups of 18 lanes), the patch
lanes are xqflat[2a+2dy+p-2, 6J-6 : 6J+12] — i.e. three 6-lane-shifted
(208,6) reshapes of the flat row. All free-form XLA reshape/slice/concat.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def conv1_im2col(frames, sx_inv):
    """frames (B,416,416,3) bf16 → patches (B,208,208,108) int8.

    Patch channel order: k = (dy∈3, p∈2, dx∈3, q∈2, c∈3) flattened as
    (dy, p) major (6 groups of 18), inner (dx, q, c) = lane offset
    6*dx + 3*q + c (== the 18 consecutive flat lanes 6J-6 .. 6J+11)."""
    B = frames.shape[0]
    xq = jnp.clip(jnp.round(frames.astype(jnp.float32) * sx_inv),
                  -127, 127).astype(jnp.int8)
    flat = xq.reshape(B, 416, 1248)
    # pad rows: frame row index r = 2a + (2dy + p) - 2 ∈ [-2, 417]
    # pad cols: lanes 6J-6 .. 6J+11 ∈ [-6, 1253]
    flat = jnp.pad(flat, ((0, 0), (2, 2), (6, 6)))     # (B, 420, 1260)
    groups = []
    for dy in range(3):
        for p in range(2):
            # rows 2a + 2dy + p - 2 for a=0..207 → padded rows 2a + 2dy + p
            rows = jax.lax.slice(flat, (0, 2 * dy + p, 0),
                                 (B, 2 * dy + p + 415, 1260), (1, 2, 1))
            # (B, 208, 1260): lanes 6J-6 .. 6J+11 → three shifted (208,6)
            # reshapes: lanes [6J+s*6-6 .. +6) = rows[..., s*6 : s*6+1248]
            shifts = [rows[:, :, 6 * s:6 * s + 1248].reshape(B, 208, 208, 6)
                      for s in range(3)]
            groups.append(jnp.concatenate(shifts, axis=-1))  # (B,208,208,18)
    return jnp.concatenate(groups, axis=-1)                  # (...,108)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("platform:", dev.platform)
    B = 128
    frames = jax.device_put(jnp.asarray(rng.random((B, 416, 416, 3)),
                                        jnp.bfloat16), dev)
    sx_inv = jnp.float32(127.0)

    r4 = jax.jit(lambda f: conv1_im2col(f, sx_inv))
    print(f"R4 XLA conv1 im2col @32 : {_time_ms(lambda: r4(frames)):8.3f} ms")

    patches = r4(frames)
    print("patches shape:", patches.shape, patches.dtype)

    # correctness: contract with w and compare vs packed-stem conv1p math
    w1 = rng.standard_normal((3, 3, 3, 32)).astype(np.float32)
    # w48-equivalent in this k-order: k=(dy,p,dx,q,c) → conv1p phase (p,q),
    # tap (dy,dx), channel c → out channel (p*2+q)*32 + co
    wk = np.zeros((108, 128), np.float32)
    for dy in range(3):
        for p in range(2):
            for dx in range(3):
                for q in range(2):
                    for c in range(3):
                        k = ((dy * 2 + p) * 18) + (dx * 6 + q * 3 + c)
                        wk[k, (p * 2 + q) * 32:(p * 2 + q + 1) * 32] = \
                            w1[dy, dx, c]
    # oracle: conv1 on xq then pack phases
    xq = np.clip(np.round(np.asarray(frames[:2], np.float32) * 127.0),
                 -127, 127)
    import scipy.signal  # noqa: F401  (not available? fallback manual)
    # manual conv (stride 1, pad 1) at sampled positions
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    got = np.einsum('bijk,kn->bijn',
                    np.asarray(patches[:2], np.float32), wk)
    # check a few positions
    ok = True
    for (bb, aa, jj) in [(0, 0, 0), (0, 100, 100), (1, 207, 207), (1, 3, 150)]:
        for p in range(2):
            for q in range(2):
                y, x = 2 * aa + p, 2 * jj + q
                patch = xp[bb, y:y + 3, x:x + 3, :]
                ref = np.einsum('ijc,ijcn->n', patch, w1)
                g = got[bb, aa, jj, (p * 2 + q) * 32:(p * 2 + q + 1) * 32]
                if not np.allclose(ref, g, atol=1e-3):
                    ok = False
    print("im2col correctness:", "PASS" if ok else "FAIL")

    # Q18: DMA of (1,208,208,108) blocks
    def ksum(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[0].astype(jnp.float32))

    fq18 = pl.pallas_call(
        ksum, grid=(B,),
        in_specs=[pl.BlockSpec((1, 208, 208, 108), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    try:
        print(f"Q18 patches block DMA@32: {_time_ms(lambda: fq18(patches)):8.3f} ms")
    except Exception as e:
        print("Q18 FAIL —", str(e).split(chr(10))[0][:140])


if __name__ == "__main__":
    main()

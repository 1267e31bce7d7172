"""One-command Mosaic/v5e toolchain constraint re-probe (VERDICT r2 #9).

Round 2 pinned a constraint matrix for this toolchain (PERF.md "Mosaic
v5e constraints", distilled from tools/probe_mosaic*.py and
tools/probe_crop_dma.py). Several kernel designs are BLOCKED on those
constraints — the windowed-DMA crop (dynamic-start DMA windows hang the
remote compile), in-kernel destriding for conv1 (strided slices /
lane-sublane reshapes unsupported). This tool re-runs the whole matrix as
one table so a toolchain update can be checked in minutes; gate any new
kernel work on its output.

Each probe runs in a SUBPROCESS with a timeout (the r2 failure mode for
dynamic-window DMA was a >30 min compile hang, not an error).

Usage:
    python tools/reprobe.py               # the full table
    python tools/reprobe.py --one NAME    # one probe, in-process
    python tools/reprobe.py --timeout 180

Exit status 0 always (the table is the product). A probe whose status
differs from the r2 expectation is flagged CHANGED, and blocked designs
whose gating probes now pass are listed at the end.

Run on a QUIET host: on this 1-core box a concurrent pytest suite
starves the probe subprocesses into spurious TIMEOUTs on probes that
pass in isolation (observed r4 close; re-running the four "changed"
probes alone read PASS).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> (last recorded status, what it gates). Baseline = round 3:
# the r2→r3 toolchain update turned the windowed-DMA compile HANG into a
# clean divisibility error, and the 8-aligned variant (pl.ds(r*8, WIN))
# began compiling — which unblocked ops/pallas_crop.py. A future status
# change prints CHANGED and re-evaluates the blocked designs below.
EXPECT = {
    "strided_slice_sublane": ("FAIL", "in-kernel destriding (conv1 ingest)"),
    "lane_merge_reshape": ("FAIL", "in-kernel space-to-depth relayout"),
    "rank3_dim0_contraction": ("FAIL", "entry kernel rank-3 band matmuls"),
    "bf16_compare": ("FAIL", "bf16 masks/compares inside kernels"),
    "transpose_2d": ("PASS", "sanity: supported idiom"),
    "dynamic_ds": ("PASS", "sanity: supported idiom"),
    "lane_subrange_write": ("PASS", "sanity: in-kernel im2col writes"),
    "rank3_minor_contraction": ("PASS", "sanity: supported idiom"),
    "dma_dynamic_image_index": ("PASS", "per-crop frame DMA (crop kernel)"),
    "dma_dynamic_row_window": ("FAIL", "raw dynamic-start window DMA"),
    "dma_dynamic_row_window_x8": ("PASS", "windowed-DMA ROI crop (ADOPTED r3)"),
}

# designs still blocked on toolchain constraints (the windowed-DMA crop
# graduated to ops/pallas_crop.py in r3 and is no longer listed)
BLOCKED_DESIGNS = {
    "in-kernel conv1 destride/relayout (Pallas conv1)":
        ["strided_slice_sublane", "lane_merge_reshape"],
    "entry kernel rank-3 band formulation (ops/pallas_entry use_kernel)":
        ["rank3_dim0_contraction"],
}


def _probe(name):
    """Run one probe in-process; raises on unsupported lowering."""
    import jax

    # persistent compile cache: the remote compile service intermittently
    # takes minutes even for tiny kernels, which reads as a spurious
    # TIMEOUT. Cache keys include the compiler version, so a toolchain
    # update still recompiles (and re-tests) every probe.
    from mit_driverless_cv_traininginfra_tpu.utils.jaxcache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def call(kernel, out_shape, n_in=1, scratch=None):
        return pl.pallas_call(
            kernel, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            **({"scratch_shapes": scratch} if scratch else {}))

    x8 = jnp.asarray(rng.integers(-127, 127, (16, 208, 64)), jnp.int8)
    xf = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)

    if name == "strided_slice_sublane":
        def k(x_ref, o_ref):
            o_ref[...] = jax.lax.slice(x_ref[...], (0, 0, 0), (16, 207, 64),
                                       (1, 2, 1))
        out = call(k, jax.ShapeDtypeStruct((16, 104, 64), jnp.int8))(x8)
        assert np.array_equal(np.asarray(out), np.asarray(x8)[:, 0:207:2])

    elif name == "lane_merge_reshape":
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(16, 104, 128)
        out = call(k, jax.ShapeDtypeStruct((16, 104, 128), jnp.int8))(x8)
        assert np.array_equal(np.asarray(out),
                              np.asarray(x8).reshape(16, 104, 128))

    elif name == "rank3_dim0_contraction":
        w = jnp.asarray(rng.integers(-127, 127, (16, 64)), jnp.int8)

        def k(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        out = call(k, jax.ShapeDtypeStruct((208, 64, 64), jnp.int32),
                   n_in=2)(x8, w)
        exp = jax.lax.dot_general(x8, w, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        assert np.array_equal(np.asarray(out), np.asarray(exp))

    elif name == "bf16_compare":
        xb = jnp.asarray(rng.standard_normal((64, 256)), jnp.bfloat16)

        def k(x_ref, o_ref):
            o_ref[...] = (x_ref[...] > jnp.bfloat16(0.0)).astype(jnp.bfloat16)
        out = call(k, jax.ShapeDtypeStruct((64, 256), jnp.bfloat16))(xb)
        assert np.array_equal(np.asarray(out, np.float32),
                              (np.asarray(xb, np.float32) > 0).astype(np.float32))

    elif name == "transpose_2d":
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].T
        out = call(k, jax.ShapeDtypeStruct((256, 64), jnp.float32))(xf)
        assert np.allclose(np.asarray(out), np.asarray(xf).T)

    elif name == "dynamic_ds":
        def k(x_ref, o_ref, scr):
            def body(i, c):
                scr[pl.ds(i * 8, 8), :] = x_ref[pl.ds(i * 8, 8), :] * 2.0

                @pl.when(i == 7)
                def _():
                    o_ref[...] = scr[...]
                return c
            jax.lax.fori_loop(0, 8, body, 0)
        out = call(k, jax.ShapeDtypeStruct((64, 256), jnp.float32),
                   scratch=[pltpu.VMEM((64, 256), jnp.float32)])(xf)
        assert np.allclose(np.asarray(out), np.asarray(xf) * 2)

    elif name == "lane_subrange_write":
        def k(x_ref, o_ref):
            o_ref[...] = jnp.zeros((64, 256), jnp.float32)
            o_ref[:, pl.ds(64, 128)] = x_ref[:, pl.ds(0, 128)]
        out = call(k, jax.ShapeDtypeStruct((64, 256), jnp.float32))(xf)
        assert np.allclose(np.asarray(out)[:, 64:192], np.asarray(xf)[:, :128])

    elif name == "rank3_minor_contraction":
        w = jnp.asarray(rng.integers(-127, 127, (64, 128)), jnp.int8)

        def k(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        out = call(k, jax.ShapeDtypeStruct((16, 208, 128), jnp.int32),
                   n_in=2)(x8, w)
        exp = jax.lax.dot_general(x8, w, (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        assert np.array_equal(np.asarray(out), np.asarray(exp))

    elif name in ("dma_dynamic_image_index", "dma_dynamic_row_window",
                  "dma_dynamic_row_window_x8"):
        WIN = 64
        B, H, W = 4, 128, 256
        frames = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
        fidx = jnp.asarray([2, 0, 3, 1], jnp.int32)
        windowed = name != "dma_dynamic_image_index"
        aligned = name.endswith("_x8")
        # aligned variant ships the start in 8-row units: pl.ds(r*8, WIN)
        # is provably 8-divisible (the r3 Mosaic error asks exactly this)
        r0 = (jnp.asarray([0, 4, 8, 2], jnp.int32) if aligned
              else jnp.asarray([0, 32, 64, 16], jnp.int32))
        C = 4

        def k(fi, r, f, o, scr, sem):
            i = pl.program_id(0)
            if windowed:
                start = r[i] * 8 if aligned else r[i]
                dma = pltpu.make_async_copy(
                    f.at[fi[i], pl.ds(start, WIN)], scr, sem)
            else:
                dma = pltpu.make_async_copy(f.at[fi[i]], scr, sem)
            dma.start()
            dma.wait()
            o[0] = scr[0:WIN] if not windowed else scr[...]

        shape = (WIN, W)
        fn = pl.pallas_call(
            k,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(C,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1,) + shape, lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM(shape if windowed else (H, W), jnp.float32),
                    pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((C,) + shape, jnp.float32))
        out = np.asarray(jax.jit(fn)(fidx, r0, frames))
        fnp = np.asarray(frames)
        for i in range(C):
            s = int(r0[i]) * 8 if aligned else int(r0[i])
            src = fnp[fidx[i], s:s + WIN] if windowed else fnp[fidx[i], :WIN]
            assert np.allclose(out[i], src), f"crop {i} mismatch"

    else:
        raise SystemExit(f"unknown probe {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--timeout", type=int, default=180)
    ap.add_argument("--retries", type=int, default=1,
                    help="extra attempts for TIMEOUT probes — the remote "
                         "compile service intermittently stalls for "
                         "minutes on ANY kernel; retries hit the "
                         "persistent compile cache")
    args = ap.parse_args()

    if args.one:
        _probe(args.one)
        print(f"{args.one}: PASS")
        return 0

    def attempt(name):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=args.timeout)
            status = "PASS" if p.returncode == 0 else "FAIL"
            detail = ""
            if p.returncode != 0:
                lines = p.stderr.strip().splitlines()
                informative = [l for l in lines if any(
                    k in l for k in ("Error", "error:", "NotImplemented",
                                     "Mosaic", "INTERNAL", "Unsupported",
                                     "not supported", "failed"))]
                detail = (informative[-1] if informative
                          else (lines or ["?"])[-1]).strip()[:110]
            return status, detail
        except subprocess.TimeoutExpired:
            return "TIMEOUT", f">{args.timeout}s (compile hang/stall)"

    results = {}
    for name in EXPECT:
        status, detail = attempt(name)
        for _ in range(args.retries):
            if status != "TIMEOUT":
                break
            status, detail = attempt(name)
        results[name] = (status, detail)

    w = max(len(n) for n in EXPECT) + 2
    print(f"{'probe':<{w}} {'r2':<8} {'now':<8} gates")
    changed = []
    for name, (exp, gates) in EXPECT.items():
        now, detail = results[name]
        mark = "" if now == exp else "  <-- CHANGED"
        print(f"{name:<{w}} {exp:<8} {now:<8} {gates}{mark}")
        if detail and now == "FAIL":
            print(f"{'':<{w}} {detail}")
        if now != exp:
            changed.append(name)

    unblocked = [d for d, gating in BLOCKED_DESIGNS.items()
                 if all(results[g][0] == "PASS" for g in gating)]
    if unblocked:
        print("\nDESIGNS NOW VIABLE (re-measure before adopting):")
        for d in unblocked:
            print(f"  - {d}")
    elif changed:
        print("\nmatrix changed but no blocked design fully unblocked")
    else:
        print("\nconstraint matrix unchanged since round 2")
    print(json.dumps({n: results[n][0] for n in results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

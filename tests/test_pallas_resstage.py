"""Experimental fused res-stage kernel (ops/pallas_resstage): correctness
on CPU (interpret mode — bit-exact vs the XLA twin; see the module
docstring for the on-chip verdict)."""

import jax
import jax.numpy as jnp
import numpy as np

from mit_driverless_cv_traininginfra_tpu.ops.pallas_resstage import (
    fused_res_stage,
    quantize_res_stage,
    res_stage_post,
    res_stage_pre,
    res_stage_reference,
    res_stage_spans,
    stage_mask,
)


def _qconv_params(rng, cin, cout, k):
    w = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.2
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    sx = 2.5
    return {
        "wq": jnp.asarray(np.clip(np.round(w / s_w), -127, 127), jnp.int8),
        "scale": jnp.asarray((sx / 127.0) * s_w, jnp.float32),
        "b": jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1),
        "sx_inv": jnp.float32(127.0 / sx),
    }


def test_res_stage_spans_flagship():
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )

    spans = res_stage_spans(flagship_spec(416))
    # Darknet-53 runs: 1×64, 2×128, 8×256, 8×512, 4×1024
    assert [(n, c) for _, n, c in spans] == [
        (1, 64), (2, 128), (8, 256), (8, 512), (4, 1024)]


def test_res_stage_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    S, C, NB, G, B = 8, 64, 3, 2, 4
    qparams = {}
    for i in range(NB):
        qparams[str(10 + 3 * i)] = _qconv_params(rng, C, C // 2, 1)
        qparams[str(10 + 3 * i + 1)] = _qconv_params(rng, C // 2, C, 3)
    qparams["99"] = _qconv_params(rng, C, C, 3)
    rs = quantize_res_stage(qparams, 10, NB, 99)

    x = jnp.asarray(rng.standard_normal((B, S, S, C)) * 0.5, jnp.bfloat16)
    yq, ybf = fused_res_stage(res_stage_pre(x), stage_mask(S, G), rs,
                              S=S, G=G, n_blocks=NB, leaky_slope=0.1,
                              interpret=True)
    xr, yr = res_stage_reference(x, rs, NB, 0.1)

    yq4 = np.asarray(res_stage_post(yq, B, S))[:, 1:S + 1, 1:S + 1, :]
    ybf4 = np.asarray(res_stage_post(ybf, B, S),
                      np.float32)[:, 1:S + 1, 1:S + 1, :]
    assert np.array_equal(yq4, np.asarray(yr))
    assert np.array_equal(ybf4, np.asarray(xr, np.float32))
    # borders of the quantized output are the next conv's zero padding
    full = np.asarray(res_stage_post(yq, B, S))
    assert full[:, 0].max() == 0 and full[:, -1].max() == 0
    assert full[:, :, 0].max() == 0 and full[:, :, -1].max() == 0


def test_res_stage_spans_terminates_when_first_triplet_routed():
    """Regression: a run whose FIRST triplet has a routed conv output used
    to spin forever (i never advanced on the rejected run) and emit bogus
    (start, 0, C) spans."""
    import types

    from mit_driverless_cv_traininginfra_tpu.config.darknet_cfg import (
        ConvBlock,
        RouteBlock,
        ShortcutBlock,
    )

    def triplet():
        return [
            ConvBlock(filters=32, size=1, stride=1, batch_normalize=True,
                      activation="leaky"),
            ConvBlock(filters=64, size=3, stride=1, batch_normalize=True,
                      activation="leaky"),
            ShortcutBlock(from_layer=-3),
        ]

    # route into block 0 (the first 1×1): whole run unfusable → no spans
    spec = types.SimpleNamespace(blocks=triplet() + [RouteBlock(layers=(0,))])
    assert res_stage_spans(spec) == []

    # clean run followed by a routed triplet: one span, no bogus n=0 entry
    spec2 = types.SimpleNamespace(
        blocks=triplet() + triplet() + [RouteBlock(layers=(3,))])
    assert res_stage_spans(spec2) == [(0, 1, 64)]

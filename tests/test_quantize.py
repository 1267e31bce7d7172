import os

import numpy as np
import jax
import jax.numpy as jnp

from mit_driverless_cv_traininginfra_tpu.config import load_network_spec
from mit_driverless_cv_traininginfra_tpu.models.darknet import (
    detections,
    fold_bn,
    init_params,
)
from mit_driverless_cv_traininginfra_tpu.models.quantize import (
    calibrate,
    detections_int8,
    quantize_params,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_test.cfg")


def _setup():
    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    folded = fold_bn(params, state, spec)
    cal = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)),
                      jnp.float32)
    amax = calibrate(spec, folded, cal)
    return spec, folded, amax


def test_quantize_params_structure():
    spec, folded, amax = _setup()
    q = quantize_params(spec, folded, amax)
    # every conv input saw calibration
    assert set(amax) == set(q)
    n_int8 = sum(1 for v in q.values() if "wq" in v)
    n_pass = sum(1 for v in q.values() if "w" in v)
    assert n_pass == 2  # the two preyolo heads stay bf16
    assert n_int8 == len(q) - 2
    some = next(v for v in q.values() if "wq" in v)
    assert some["wq"].dtype == jnp.int8
    assert int(jnp.max(jnp.abs(some["wq"].astype(jnp.int32)))) <= 127
    # per-channel scale shape
    assert some["scale"].shape == (some["wq"].shape[-1],)


def test_int8_forward_tracks_f32():
    spec, folded, amax = _setup()
    q = quantize_params(spec, folded, amax, act_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    ref = np.asarray(detections(spec, folded, {}, x))
    got = np.asarray(detections_int8(spec, q, x, act_dtype=jnp.float32))
    # int8 PTQ on random (worst-case) weights: bounded confidence drift
    conf_ref, conf_got = ref[0, :, 4], got[0, :, 4]
    assert np.abs(conf_ref - conf_got).mean() < 0.05
    assert np.corrcoef(conf_ref, conf_got)[0, 1] > 0.9
    # centre coords bounded within a grid cell's scale
    assert np.abs(ref[0, :, 0] - got[0, :, 0]).mean() < 2.0


def test_calibration_covers_all_convs():
    spec, folded, amax = _setup()
    n_convs = sum(1 for b in spec.blocks
                  if type(b).__name__ == "ConvBlock")
    assert len(amax) == n_convs
    assert all(v > 0 for v in amax.values())

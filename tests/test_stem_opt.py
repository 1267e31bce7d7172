import os

import numpy as np
import jax
import jax.numpy as jnp

from mit_driverless_cv_traininginfra_tpu.config import load_network_spec
from mit_driverless_cv_traininginfra_tpu.config.cfg_factory import yolov3_cfg
from mit_driverless_cv_traininginfra_tpu.models.darknet import (
    detections,
    fold_bn,
    forward_features,
    init_params,
)
from mit_driverless_cv_traininginfra_tpu.models.stem_opt import (
    apply_packed_stem,
    build_packed_stem,
    pack_input,
    stem_is_packable,
)


def _small_yolo_spec(tmp_path):
    cfg = yolov3_cfg(width=64, height=64, classes=1)
    p = tmp_path / "y.cfg"
    p.write_text(cfg)
    return load_network_spec(str(p), vanilla_anchor=True)


def test_pack_input_layout():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    p = pack_input(x)
    assert p.shape == (2, 2, 2, 12)
    # packed channel (p_row, p_col, c): slot 0 = x[0,0], slot 3·? check a few
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 0:3]), np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 3:6]), np.asarray(x[0, 0, 1]))
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 6:9]), np.asarray(x[0, 1, 0]))
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 9:12]), np.asarray(x[0, 1, 1]))


def test_packed_stem_exact_vs_plain(tmp_path):
    spec = _small_yolo_spec(tmp_path)
    assert stem_is_packable(spec)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    folded = fold_bn(params, state, spec)
    packed = build_packed_stem(folded)

    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    # plain: run blocks 0..1 (conv+leaky twice)
    import dataclasses

    sub = dataclasses.replace(spec, blocks=spec.blocks[:2])
    from mit_driverless_cv_traininginfra_tpu.models.rektnet import conv2d

    h = conv2d(x, folded["0"]["w"], folded["0"]["b"], stride=1, padding=1)
    h = jnp.where(h >= 0, h, h * spec.net.leaky_slope)
    h = conv2d(h, folded["1"]["w"], folded["1"]["b"], stride=2, padding=1)
    expected = jnp.where(h >= 0, h, h * spec.net.leaky_slope)

    got = apply_packed_stem(packed, x, spec.net.leaky_slope)
    assert got.shape == expected.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_full_detections_with_packed_stem(tmp_path):
    spec = _small_yolo_spec(tmp_path)
    params, state = init_params(spec, jax.random.PRNGKey(2))
    folded = fold_bn(params, state, spec)
    packed = build_packed_stem(folded)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    plain = detections(spec, folded, {}, x)
    fast = detections(spec, folded, {}, x, packed_stem=packed)
    # random-init wh logits pass through exp(), so compare relatively
    # (f32 reassociation drift amplified exponentially on huge values)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(fast),
                               rtol=1e-2, atol=1e-2)


def test_slice_preyolo_preserves_box_conf_outputs(tmp_path):
    from mit_driverless_cv_traininginfra_tpu.models.stem_opt import slice_preyolo

    spec = _small_yolo_spec(tmp_path)
    params, state = init_params(spec, jax.random.PRNGKey(5))
    folded = fold_bn(params, state, spec)
    spec_s, folded_s = slice_preyolo(spec, folded)
    assert spec_s.net.num_classes == 0
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    full = detections(spec, folded, {}, x, with_classes=False)
    sliced = detections(spec_s, folded_s, {}, x, with_classes=False)
    np.testing.assert_allclose(np.asarray(full), np.asarray(sliced),
                               rtol=1e-5, atol=1e-4)

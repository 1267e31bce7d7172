import os

import numpy as np
import jax
import pytest

from mit_driverless_cv_traininginfra_tpu.config import load_network_spec
from mit_driverless_cv_traininginfra_tpu.export import onnx_writer as ox
from mit_driverless_cv_traininginfra_tpu.export.pt_to_onnx import export_rektnet_onnx
from mit_driverless_cv_traininginfra_tpu.export.yolo2onnx import export_yolo_onnx
from mit_driverless_cv_traininginfra_tpu.models import rektnet
from mit_driverless_cv_traininginfra_tpu.models.darknet import init_params

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_test.cfg")


def test_proto_roundtrip_minimal():
    w = np.random.default_rng(0).normal(size=(4, 3, 3, 3)).astype(np.float32)
    node = ox.make_node("Conv", ["x", "w"], ["y"], name="c0",
                        kernel_shape=[3, 3], strides=[1, 1],
                        pads=[1, 1, 1, 1], dilations=[1, 1])
    graph = ox.make_graph(
        "g", [node],
        inputs=[ox.make_value_info("x", [1, 3, 8, 8])],
        outputs=[ox.make_value_info("y", [1, 4, 8, 8])],
        initializers=[ox.make_tensor("w", w)],
    )
    model = ox.make_model(graph, opset=9, producer_name="test")
    parsed = ox.parse_model(model)
    assert parsed["producer"] == "test" and parsed["opset"] == 9
    assert parsed["nodes"][0]["op_type"] == "Conv"
    assert parsed["nodes"][0]["attrs"]["kernel_shape"] == [3, 3]
    np.testing.assert_array_equal(parsed["initializers"]["w"], w)
    assert parsed["inputs"][0]["shape"] == [1, 3, 8, 8]


def test_yolo_onnx_export_structure(tmp_path):
    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    params, state = init_params(spec, jax.random.PRNGKey(0))
    path = str(tmp_path / "yolo.onnx")
    export_yolo_onnx(spec, params, state, path)
    parsed = ox.parse_model(open(path, "rb").read())
    ops = [n["op_type"] for n in parsed["nodes"]]
    # every block family appears
    for op in ["Conv", "BatchNormalization", "LeakyRelu", "Add", "Concat",
               "Upsample", "MaxPool"]:
        assert op in ops, op
    # two raw pre-yolo outputs, 18 channels each (classes+5)*3
    assert len(parsed["outputs"]) == 2
    assert all(o["shape"][1] == 18 for o in parsed["outputs"])
    # input at onnx_height
    assert parsed["inputs"][0]["shape"] == [1, 3, spec.net.onnx_height,
                                            spec.net.width]
    # BN epsilon matches the reference exporter (yolo2onnx.py:649)
    bn = next(n for n in parsed["nodes"] if n["op_type"] == "BatchNormalization")
    assert bn["attrs"]["epsilon"] == pytest.approx(1e-5)


def test_yolo_onnx_weights_byte_exact(tmp_path):
    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    params, state = init_params(spec, jax.random.PRNGKey(1))
    path = str(tmp_path / "yolo.onnx")
    export_yolo_onnx(spec, params, state, path)
    parsed = ox.parse_model(open(path, "rb").read())
    w0 = parsed["initializers"]["001_conv_weights"]
    expected = np.transpose(np.asarray(params["0"]["w"]), (3, 2, 0, 1))
    np.testing.assert_array_equal(w0, expected)


def test_rektnet_onnx_export_structure(tmp_path):
    params, state = rektnet.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "rekt.onnx")
    export_rektnet_onnx(params, state, path)
    parsed = ox.parse_model(open(path, "rb").read())
    ops = [n["op_type"] for n in parsed["nodes"]]
    assert ops.count("Conv") == 1 + 4 * 3 + 1  # stem + 3 per res block + out
    assert ops.count("Add") == 4
    assert parsed["outputs"][0]["shape"] == [1, 7, 80, 80]
    # dilated first conv of each res block
    res1c1 = next(n for n in parsed["nodes"] if n["name"] == "res1_conv1")
    assert res1c1["attrs"]["dilations"] == [2, 2]
    assert res1c1["attrs"]["pads"] == [2, 2, 2, 2]


# ---------------------------------------------------------------------------
# numeric execution (VERDICT r3 #3): the exports feed TensorRT in the
# reference deployment — run the exported graph through the in-repo numpy
# evaluator and require equality with the JAX forward. A transposed
# weight, wrong pad, or bad attribute passes the structural tests but
# fails here.
# ---------------------------------------------------------------------------

from mit_driverless_cv_traininginfra_tpu.export.onnx_eval import run_model


def test_yolo_onnx_numeric_matches_jax_forward(tmp_path):
    from mit_driverless_cv_traininginfra_tpu.models.darknet import (
        forward_features,
    )

    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    params, state = init_params(spec, jax.random.PRNGKey(3))
    path = str(tmp_path / "yolo.onnx")
    export_yolo_onnx(spec, params, state, path)  # onnx_height (32) x width
    parsed = ox.parse_model(open(path, "rb").read())

    rng = np.random.default_rng(0)
    h, w = spec.net.onnx_height, spec.net.width
    x_nchw = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    got = run_model(parsed, {"000_net": x_nchw})

    x_nhwc = jax.numpy.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    heads, _ = forward_features(spec, params, state, x_nhwc)
    assert len(got) == len(heads) == 2
    for (name, onnx_out), jax_out in zip(got.items(), heads):
        want = np.transpose(np.asarray(jax_out, np.float32), (0, 3, 1, 2))
        assert onnx_out.shape == want.shape, name
        np.testing.assert_allclose(onnx_out, want, rtol=1e-4, atol=1e-4)


def test_yolo_onnx_numeric_catches_transposed_weight(tmp_path):
    """The numeric check must actually discriminate: corrupt one conv
    initializer with a spatial transpose and require a mismatch."""
    from mit_driverless_cv_traininginfra_tpu.models.darknet import (
        forward_features,
    )

    spec = load_network_spec(FIXTURE, vanilla_anchor=True)
    params, state = init_params(spec, jax.random.PRNGKey(4))
    path = str(tmp_path / "yolo.onnx")
    export_yolo_onnx(spec, params, state, path)
    parsed = ox.parse_model(open(path, "rb").read())
    w0 = parsed["initializers"]["001_conv_weights"]
    # kh<->kw spatial transpose: same shape, different network
    parsed["initializers"]["001_conv_weights"] = np.ascontiguousarray(
        np.transpose(w0, (0, 1, 3, 2)))
    rng = np.random.default_rng(1)
    h, w = spec.net.onnx_height, spec.net.width
    x_nchw = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    x_nhwc = jax.numpy.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    heads, _ = forward_features(spec, params, state, x_nhwc)
    got = run_model(parsed, {"000_net": x_nchw})
    want = np.transpose(np.asarray(heads[0], np.float32), (0, 3, 1, 2))
    name0 = list(got)[0]
    assert not np.allclose(got[name0], want, rtol=1e-4, atol=1e-4)


def test_rektnet_onnx_numeric_matches_jax_forward(tmp_path):
    params, state = rektnet.init(jax.random.PRNGKey(5))
    path = str(tmp_path / "rekt.onnx")
    export_rektnet_onnx(params, state, path)
    parsed = ox.parse_model(open(path, "rb").read())

    rng = np.random.default_rng(2)
    x_nchw = rng.uniform(0, 1, (1, 3, 80, 80)).astype(np.float32)
    got = run_model(parsed, {"input": x_nchw})

    x_nhwc = jax.numpy.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    logits = rektnet.apply(params, state, x_nhwc, hm_only=True)  # (B,H,W,K)
    want = np.transpose(np.asarray(logits, np.float32), (0, 3, 1, 2))
    out = got["out"]
    assert out.shape == (1, 7, 80, 80)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

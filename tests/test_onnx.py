"""ONNX reader/executor tests: hand-encoded protobuf fixtures executed by
the jnp executor, compared against torch oracles with the same weights."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpu_rvc.ckpt.onnx_reader import (encode_model, encode_node, load_onnx)
from tpu_rvc.models.onnx_exec import OnnxModule


def test_onnx_conv_bn_relu_convtranspose(tmp_path, rng):
    cin, ch, k = 4, 8, 3
    w1 = rng.standard_normal((ch, cin, k, k)).astype(np.float32)
    b1 = rng.standard_normal(ch).astype(np.float32)
    g = rng.uniform(0.5, 2, ch).astype(np.float32)
    beta = rng.standard_normal(ch).astype(np.float32)
    mean = rng.standard_normal(ch).astype(np.float32)
    var = rng.uniform(0.5, 2, ch).astype(np.float32)
    w2 = rng.standard_normal((ch, cin, 2, 2)).astype(np.float32)

    nodes = [
        encode_node("Conv", ["input", "w1", "b1"], ["c1"],
                    kernel_shape=[k, k], pads=[1, 1, 1, 1], strides=[1, 1]),
        encode_node("BatchNormalization",
                    ["c1", "g", "beta", "mean", "var"], ["bn"],
                    epsilon=1e-5),
        encode_node("Relu", ["bn"], ["r"]),
        encode_node("ConvTranspose", ["r", "w2"], ["output"],
                    kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0]),
    ]
    model = encode_model(nodes, {"w1": w1, "b1": b1, "g": g, "beta": beta,
                                 "mean": mean, "var": var, "w2": w2},
                         ["input"], ["output"])
    p = str(tmp_path / "m.onnx")
    open(p, "wb").write(model)

    graph = load_onnx(p)
    assert [n.op_type for n in graph.nodes] == [
        "Conv", "BatchNormalization", "Relu", "ConvTranspose"]
    mod = OnnxModule(graph)

    x = rng.standard_normal((2, cin, 16, 16)).astype(np.float32)
    out = np.asarray(mod(x))

    with torch.no_grad():
        t = F.conv2d(torch.from_numpy(x), torch.from_numpy(w1),
                     torch.from_numpy(b1), padding=1)
        t = F.batch_norm(t, torch.from_numpy(mean), torch.from_numpy(var),
                         torch.from_numpy(g), torch.from_numpy(beta),
                         eps=1e-5)
        t = F.relu(t)
        t = F.conv_transpose2d(t, torch.from_numpy(w2), stride=2)
    np.testing.assert_allclose(out, t.numpy(), rtol=1e-4, atol=1e-4)


def test_onnx_elementwise_and_shape_ops(tmp_path, rng):
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    nodes = [
        encode_node("Transpose", ["input"], ["t"], perm=[0, 2, 1]),
        encode_node("Reshape", ["t", "shape"], ["rs"]),
        encode_node("Sigmoid", ["rs"], ["s"]),
        encode_node("Mul", ["s", "s"], ["output"]),
    ]
    model = encode_model(nodes, {"shape": np.asarray([2, 12], np.int64)},
                         ["input"], ["output"])
    p = str(tmp_path / "m2.onnx")
    open(p, "wb").write(model)
    mod = OnnxModule.from_file(p)
    out = np.asarray(mod(a))
    ref = 1 / (1 + np.exp(-a.transpose(0, 2, 1).reshape(2, 12)))
    np.testing.assert_allclose(out, ref ** 2, rtol=1e-5)

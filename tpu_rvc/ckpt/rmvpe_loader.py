"""Load rmvpe.pt (reference rvc/f0/models.py:4 `get_rmvpe`) into the flax
E2E tree, folding BatchNorm running stats into (scale, bias) pairs."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

BN_EPS = 1e-5


def _fold_bn(sd, prefix):
    g = np.asarray(sd[f"{prefix}.weight"], np.float64)
    b = np.asarray(sd[f"{prefix}.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float64)
    scale = g / np.sqrt(var + BN_EPS)
    bias = b - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def _conv2d_w(w):  # torch (out, in, kh, kw) -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _convT2d_w(w):  # torch (in, out, kh, kw) -> flipped HWIO
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _conv_block_res(sd, prefix) -> Dict[str, Any]:
    out = {
        "conv0_w": _conv2d_w(sd[f"{prefix}.conv.0.weight"]),
        "bn0": _fold_bn(sd, f"{prefix}.conv.1"),
        "conv1_w": _conv2d_w(sd[f"{prefix}.conv.3.weight"]),
        "bn1": _fold_bn(sd, f"{prefix}.conv.4"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut_w"] = _conv2d_w(sd[f"{prefix}.shortcut.weight"])
        out["shortcut_b"] = np.asarray(sd[f"{prefix}.shortcut.bias"])
    return out


def _res_encoder_block(sd, prefix, n_blocks=4) -> Dict[str, Any]:
    return {f"block_{j}": _conv_block_res(sd, f"{prefix}.conv.{j}")
            for j in range(n_blocks)}


def rmvpe_params_from_torch(sd: Dict[str, np.ndarray],
                            n_blocks: int = 4, en_de_layers: int = 5,
                            inter_layers: int = 4) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    unet: Dict[str, Any] = {"in_bn": _fold_bn(sd, "unet.encoder.bn")}
    for i in range(en_de_layers):
        unet[f"enc_{i}"] = _res_encoder_block(
            sd, f"unet.encoder.layers.{i}", n_blocks)
    for i in range(inter_layers):
        unet[f"inter_{i}"] = _res_encoder_block(
            sd, f"unet.intermediate.layers.{i}", n_blocks)
    for i in range(en_de_layers):
        d = f"unet.decoder.layers.{i}"
        dec = {
            "up_w": _convT2d_w(sd[f"{d}.conv1.0.weight"]),
            "up_bn": _fold_bn(sd, f"{d}.conv1.1"),
        }
        for j in range(n_blocks):
            dec[f"block_{j}"] = _conv_block_res(sd, f"{d}.conv2.{j}")
        unet[f"dec_{i}"] = dec
    p["unet"] = unet
    p["cnn_w"] = _conv2d_w(sd["cnn.weight"])
    p["cnn_b"] = np.asarray(sd["cnn.bias"])
    gru = {}
    for sfx_t, sfx_o in (("", ""), ("_reverse", "_rev")):
        gru[f"wi{sfx_o}"] = np.ascontiguousarray(
            np.asarray(sd[f"fc.0.gru.weight_ih_l0{sfx_t}"]).T)
        gru[f"wh{sfx_o}"] = np.ascontiguousarray(
            np.asarray(sd[f"fc.0.gru.weight_hh_l0{sfx_t}"]).T)
        gru[f"bi{sfx_o}"] = np.asarray(sd[f"fc.0.gru.bias_ih_l0{sfx_t}"])
        gru[f"bh{sfx_o}"] = np.asarray(sd[f"fc.0.gru.bias_hh_l0{sfx_t}"])
    p["gru"] = gru
    p["fc_w"] = np.ascontiguousarray(np.asarray(sd["fc.1.weight"]).T)
    p["fc_b"] = np.asarray(sd["fc.1.bias"])
    return p


def load_rmvpe(path: str):
    from tpu_rvc.ckpt.torch_pth import load_pth
    from tpu_rvc.models.rmvpe import E2E

    sd = load_pth(path)
    params = rmvpe_params_from_torch(sd)
    return E2E(), {"params": params}

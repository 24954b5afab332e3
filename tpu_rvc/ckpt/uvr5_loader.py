"""Load UVR5 CascadedASPPNet torch weights into the flax tree
(reference nets_123821KB.py state_dict layout)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .rmvpe_loader import _fold_bn, _conv2d_w


def _cbr(sd, prefix) -> Dict[str, Any]:
    """Conv2DBNActiv: Sequential(conv, bn, activ) -> {conv_w, bn}."""
    return {"conv_w": _conv2d_w(sd[f"{prefix}.conv.0.weight"]),
            "bn": _fold_bn(sd, f"{prefix}.conv.1")}


def _sep_cbr(sd, prefix) -> Dict[str, Any]:
    """SeperableConv2DBNActiv: Sequential(dw, pw, bn, activ).
    dw torch (nin, 1, k, k) groups=nin -> HWIO (k, k, 1, nin)."""
    dw = np.asarray(sd[f"{prefix}.conv.0.weight"])
    return {
        "dw_w": np.ascontiguousarray(np.transpose(dw, (2, 3, 1, 0))),
        "pw_w": _conv2d_w(sd[f"{prefix}.conv.1.weight"]),
        "bn": _fold_bn(sd, f"{prefix}.conv.2"),
    }


def _encoder(sd, prefix) -> Dict[str, Any]:
    return {"conv1": _cbr(sd, f"{prefix}.conv1"),
            "conv2": _cbr(sd, f"{prefix}.conv2")}


def _decoder(sd, prefix) -> Dict[str, Any]:
    return {"conv": _cbr(sd, f"{prefix}.conv")}


def _aspp(sd, prefix) -> Dict[str, Any]:
    return {
        "conv1": _cbr(sd, f"{prefix}.conv1.1"),
        "conv2": _cbr(sd, f"{prefix}.conv2"),
        "conv3": _sep_cbr(sd, f"{prefix}.conv3"),
        "conv4": _sep_cbr(sd, f"{prefix}.conv4"),
        "conv5": _sep_cbr(sd, f"{prefix}.conv5"),
        "bottleneck": _cbr(sd, f"{prefix}.bottleneck.0"),
    }


def _base_aspp(sd, prefix) -> Dict[str, Any]:
    out = {}
    for i in range(1, 5):
        out[f"enc{i}"] = _encoder(sd, f"{prefix}.enc{i}")
        out[f"dec{i}"] = _decoder(sd, f"{prefix}.dec{i}")
    out["aspp"] = _aspp(sd, f"{prefix}.aspp")
    return out


def cascaded_aspp_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {
        "stg1_low": _base_aspp(sd, "stg1_low_band_net"),
        "stg1_high": _base_aspp(sd, "stg1_high_band_net"),
        "stg2_bridge": _cbr(sd, "stg2_bridge"),
        "stg2_full": _base_aspp(sd, "stg2_full_band_net"),
        "stg3_bridge": _cbr(sd, "stg3_bridge"),
        "stg3_full": _base_aspp(sd, "stg3_full_band_net"),
        "out_w": _conv2d_w(sd["out.weight"]),
    }


def load_cascaded_aspp(path: str, n_fft: int = 1344):
    """Load an HP-style UVR5 .pth.  n_fft: bins*2 from the band params
    (4band_v2: bins=672 -> n_fft 1344)."""
    from tpu_rvc.ckpt.torch_pth import load_pth
    from tpu_rvc.models.uvr5 import CascadedASPPNet

    sd = load_pth(path)
    params = cascaded_aspp_params_from_torch(sd)
    return CascadedASPPNet(n_fft=n_fft), {"params": params}


# ---------------------------------------------------------------------------
# DeEcho / DeReverb CascadedNet (reference nets.py:47 + layers.py)
# ---------------------------------------------------------------------------


def _encoder_new(sd, prefix):
    return {"conv1": _cbr(sd, f"{prefix}.conv1"),
            "conv2": _cbr(sd, f"{prefix}.conv2")}


def _aspp_new(sd, prefix):
    out = {"conv1": _cbr(sd, f"{prefix}.conv1.1"),
           "conv2": _cbr(sd, f"{prefix}.conv2"),
           "bottleneck": _cbr(sd, f"{prefix}.bottleneck")}
    for i in (3, 4, 5):
        out[f"conv{i}_w"] = _conv2d_w(sd[f"{prefix}.conv{i}.conv.0.weight"])
        out[f"conv{i}_bn"] = _fold_bn(sd, f"{prefix}.conv{i}.conv.1")
    return out


def _lstm_module(sd, prefix):
    out = {"conv": _cbr(sd, f"{prefix}.conv")}
    for sfx_t, sfx_o in (("", ""), ("_reverse", "_rev")):
        out[f"wi{sfx_o}"] = np.ascontiguousarray(
            np.asarray(sd[f"{prefix}.lstm.weight_ih_l0{sfx_t}"]).T)
        out[f"wh{sfx_o}"] = np.ascontiguousarray(
            np.asarray(sd[f"{prefix}.lstm.weight_hh_l0{sfx_t}"]).T)
        out[f"bi{sfx_o}"] = np.asarray(sd[f"{prefix}.lstm.bias_ih_l0{sfx_t}"])
        out[f"bh{sfx_o}"] = np.asarray(sd[f"{prefix}.lstm.bias_hh_l0{sfx_t}"])
    out["dense_w"] = np.ascontiguousarray(
        np.asarray(sd[f"{prefix}.dense.0.weight"]).T)
    out["dense_b"] = np.asarray(sd[f"{prefix}.dense.0.bias"])
    out["dense_bn"] = _fold_bn(sd, f"{prefix}.dense.1")
    return out


def _base_net_new(sd, prefix):
    out = {"enc1": _cbr(sd, f"{prefix}.enc1")}
    for i in range(2, 6):
        out[f"enc{i}"] = _encoder_new(sd, f"{prefix}.enc{i}")
    out["aspp"] = _aspp_new(sd, f"{prefix}.aspp")
    for i in range(1, 5):
        out[f"dec{i}"] = {"conv": _cbr(sd, f"{prefix}.dec{i}.conv1")}
    out["lstm_dec2"] = _lstm_module(sd, f"{prefix}.lstm_dec2")
    return out


def deecho_params_from_torch(sd):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {
        "stg1_low_base": _base_net_new(sd, "stg1_low_band_net.0"),
        "stg1_low_conv": _cbr(sd, "stg1_low_band_net.1"),
        "stg1_high": _base_net_new(sd, "stg1_high_band_net"),
        "stg2_low_base": _base_net_new(sd, "stg2_low_band_net.0"),
        "stg2_low_conv": _cbr(sd, "stg2_low_band_net.1"),
        "stg2_high": _base_net_new(sd, "stg2_high_band_net"),
        "stg3_full": _base_net_new(sd, "stg3_full_band_net"),
        "out_w": _conv2d_w(sd["out.weight"]),
    }


def load_deecho(path: str, n_fft: int = 1024):
    """Load a VR-DeEcho*/DeReverb .pth (reference uvr5/modules.py selects
    CascadedNet for these names; their param set is 4band_v3 with n_fft from
    the band params)."""
    from tpu_rvc.ckpt.torch_pth import load_pth
    from tpu_rvc.models.uvr5 import CascadedNetDeEcho

    sd = load_pth(path)
    nout = 64 if "DeReverb" in path else 48 if "Aggressive" in path else 32
    # infer nout from out.weight if possible
    nout = int(np.asarray(sd["out.weight"]).shape[1])
    nout_lstm = int(np.asarray(
        sd["stg1_low_band_net.0.lstm_dec2.dense.0.weight"]).shape[1])
    return (CascadedNetDeEcho(n_fft=n_fft, nout=nout, nout_lstm=nout_lstm),
            {"params": deecho_params_from_torch(sd)})

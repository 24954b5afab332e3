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

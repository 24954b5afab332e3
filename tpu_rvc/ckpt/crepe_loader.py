"""Load a torchcrepe `full.pth` state dict into the flax Crepe tree.

torchcrepe names: conv{i}.weight/bias (out, in, kh, 1), conv{i}_BN.{weight,
bias,running_mean,running_var}, classifier.{weight,bias}.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .rmvpe_loader import _fold_bn


def crepe_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(6):
        w = np.asarray(sd[f"conv{i + 1}.weight"])  # (out, in, k, 1)
        p[f"conv{i}_w"] = np.ascontiguousarray(
            np.transpose(w[:, :, :, 0], (2, 1, 0)))
        p[f"conv{i}_b"] = np.asarray(sd[f"conv{i + 1}.bias"])
        p[f"bn{i}"] = _fold_bn(sd, f"conv{i + 1}_BN")
    p["fc_w"] = np.ascontiguousarray(np.asarray(sd["classifier.weight"]).T)
    p["fc_b"] = np.asarray(sd["classifier.bias"])
    return p


def load_crepe(path: str):
    from tpu_rvc.ckpt.torch_pth import load_pth
    from tpu_rvc.models.crepe import Crepe

    sd = load_pth(path)
    return Crepe(), {"params": crepe_params_from_torch(sd)}

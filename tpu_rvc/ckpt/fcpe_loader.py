"""torchfcpe checkpoint loader (torch-free).

The reference loads the bundled FCPE model via
`torchfcpe.spawn_bundled_infer_model` (rvc/f0/fcpe.py:26-30); the bundled
.pt is a torch zip checkpoint `{"config_dict"|"config": {...}, "model":
state_dict}`.  This loader reads it with tpu_rvc.ckpt.torch_pth, builds the
matching CFNaiveMelPE config, and maps the conv-only conformer weights into
the channel-last flax layout (torch conv (Cout, Cin, K) -> (K, Cin, Cout);
the weight-normed output Linear is folded to a dense (in, out) matrix).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from tpu_rvc.models.fcpe import CFNaiveMelPE
from .torch_pth import load_pth


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32),
                                             (2, 1, 0)))


def _model_config(ckpt: dict) -> dict:
    cfg = ckpt.get("config_dict") or ckpt.get("config") or {}
    m = cfg.get("model", cfg) if isinstance(cfg, dict) else {}
    return m if isinstance(m, dict) else {}


def fcpe_params_from_torch(sd: Dict[str, np.ndarray], n_layers: int) -> dict:
    """Map a CFNaiveMelPE torch state_dict to flax params."""
    # newer torch parametrization naming -> classic weight_g/weight_v
    sd = {k.replace("parametrizations.weight.original0", "weight_g")
           .replace("parametrizations.weight.original1", "weight_v"): v
          for k, v in sd.items()}
    f32 = lambda k: np.asarray(sd[k], np.float32)
    p = {
        "stem0_w": _conv_w(sd["input_stem.0.weight"]),
        "stem0_b": f32("input_stem.0.bias"),
        "stem_gn": {"scale": f32("input_stem.1.weight"),
                    "bias": f32("input_stem.1.bias")},
        "stem1_w": _conv_w(sd["input_stem.3.weight"]),
        "stem1_b": f32("input_stem.3.bias"),
        "norm_g": f32("norm.weight"),
        "norm_b": f32("norm.bias"),
    }
    for i in range(n_layers):
        base = f"net.encoder_layers.{i}.conformer.net"
        dw_key = (f"{base}.4.conv.weight" if f"{base}.4.conv.weight" in sd
                  else f"{base}.4.weight")
        dw_b = (f"{base}.4.conv.bias" if f"{base}.4.conv.bias" in sd
                else f"{base}.4.bias")
        p[f"layer_{i}"] = {
            "ln_g": f32(f"{base}.0.weight"),
            "ln_b": f32(f"{base}.0.bias"),
            "pw1_w": _conv_w(sd[f"{base}.2.weight"]),
            "pw1_b": f32(f"{base}.2.bias"),
            "dw_w": _conv_w(sd[dw_key]),
            "dw_b": f32(dw_b),
            "pw2_w": _conv_w(sd[f"{base}.6.weight"]),
            "pw2_b": f32(f"{base}.6.bias"),
        }
    # weight-normed Linear: w = g * v / ||v||_row, rows are out-features
    if "output_proj.weight_v" in sd:
        v = f32("output_proj.weight_v")
        g = f32("output_proj.weight_g").reshape(-1, 1)
        w = g * v / np.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = f32("output_proj.weight")
    p["proj_w"] = np.ascontiguousarray(w.T)
    p["proj_b"] = f32("output_proj.bias")
    return p


def load_fcpe(path: str) -> Tuple[CFNaiveMelPE, dict]:
    """Load a torchfcpe bundled checkpoint -> (module, variables)."""
    ckpt = load_pth(path)
    sd = ckpt.get("model") or ckpt.get("model_state_dict") or ckpt
    sd = {k: np.asarray(v) for k, v in sd.items()
          if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    mcfg = _model_config(ckpt)
    n_layers = int(mcfg.get("n_layers", 6))
    if not mcfg.get("conv_only", True):
        raise NotImplementedError(
            "only the conv-only bundled FCPE configuration is supported")
    model = CFNaiveMelPE(
        in_dims=int(mcfg.get("input_channel", mcfg.get("in_dims", 128))),
        hidden_dims=int(mcfg.get("hidden_dims", 512)),
        out_dims=int(mcfg.get("out_dims", 360)),
        n_layers=n_layers,
        f0_min=float(mcfg.get("f0_min", 32.70)),
        f0_max=float(mcfg.get("f0_max", 1975.5)),
    )
    params = fcpe_params_from_torch(sd, n_layers)
    return model, {"params": params}

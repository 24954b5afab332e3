"""Load HuBERT weights into tpu_rvc.models.hubert.Hubert params.

Two source schemas:
  - fairseq `hubert_base.pt` (the asset the reference downloads;
    rvc/hubert.py:265 loads it via fairseq) — keys under ['model'].
  - HuggingFace transformers HubertModel state_dict (used as an independent
    test oracle; same architecture).

Both map onto the flax tree defined in models/hubert.py.  All torch-free:
numpy in, numpy out.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w):  # torch Linear (out, in) -> (in, out)
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # torch conv1d (out, in, k) -> (k, in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def hubert_params_from_fairseq(sd: Dict[str, np.ndarray],
                               output_layer: int = 12,
                               final_proj: bool = False) -> Dict[str, Any]:
    """fairseq HubertModel state_dict -> flax params tree."""
    p: Dict[str, Any] = {}
    fe = {}
    n_conv = sum(1 for key in sd if key.startswith("feature_extractor.conv_layers")
                 and key.endswith(".0.weight"))
    for i in range(n_conv):
        fe[f"conv_{i}"] = _conv(sd[f"feature_extractor.conv_layers.{i}.0.weight"])
    fe["gn_scale"] = np.asarray(sd["feature_extractor.conv_layers.0.2.weight"])
    fe["gn_bias"] = np.asarray(sd["feature_extractor.conv_layers.0.2.bias"])
    p["feature_extractor"] = fe
    p["layer_norm_pre"] = {"scale": np.asarray(sd["layer_norm.weight"]),
                           "bias": np.asarray(sd["layer_norm.bias"])}
    p["post_extract_w"] = _t(sd["post_extract_proj.weight"])
    p["post_extract_b"] = np.asarray(sd["post_extract_proj.bias"])

    # pos conv: weight-norm dim=2 — torch weight_v (768, 48, 128) g (1, 1, 128)
    def k(name_new, name_old):
        return sd.get(name_new, sd.get(name_old))

    gv = k("encoder.pos_conv.0.parametrizations.weight.original0",
           "encoder.pos_conv.0.weight_g")
    vv = k("encoder.pos_conv.0.parametrizations.weight.original1",
           "encoder.pos_conv.0.weight_v")
    p["pos_conv_v"] = _conv(vv)                      # (128, 48, 768)
    p["pos_conv_g"] = np.transpose(np.asarray(gv), (2, 1, 0))  # (128, 1, 1)
    p["pos_conv_b"] = np.asarray(sd["encoder.pos_conv.0.bias"])
    p["encoder_layer_norm"] = {"scale": np.asarray(sd["encoder.layer_norm.weight"]),
                               "bias": np.asarray(sd["encoder.layer_norm.bias"])}
    for i in range(output_layer):
        b = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "self_attn": {
                "q_w": _t(sd[f"{b}.self_attn.q_proj.weight"]),
                "q_b": np.asarray(sd[f"{b}.self_attn.q_proj.bias"]),
                "k_w": _t(sd[f"{b}.self_attn.k_proj.weight"]),
                "k_b": np.asarray(sd[f"{b}.self_attn.k_proj.bias"]),
                "v_w": _t(sd[f"{b}.self_attn.v_proj.weight"]),
                "v_b": np.asarray(sd[f"{b}.self_attn.v_proj.bias"]),
                "out_w": _t(sd[f"{b}.self_attn.out_proj.weight"]),
                "out_b": np.asarray(sd[f"{b}.self_attn.out_proj.bias"]),
            },
            "self_attn_layer_norm": {
                "scale": np.asarray(sd[f"{b}.self_attn_layer_norm.weight"]),
                "bias": np.asarray(sd[f"{b}.self_attn_layer_norm.bias"]),
            },
            "fc1_w": _t(sd[f"{b}.fc1.weight"]),
            "fc1_b": np.asarray(sd[f"{b}.fc1.bias"]),
            "fc2_w": _t(sd[f"{b}.fc2.weight"]),
            "fc2_b": np.asarray(sd[f"{b}.fc2.bias"]),
            "final_layer_norm": {
                "scale": np.asarray(sd[f"{b}.final_layer_norm.weight"]),
                "bias": np.asarray(sd[f"{b}.final_layer_norm.bias"]),
            },
        }
    if final_proj:
        p["final_proj_w"] = _t(sd["final_proj.weight"])
        p["final_proj_b"] = np.asarray(sd["final_proj.bias"])
    return p


def hubert_params_from_transformers(sd: Dict[str, np.ndarray],
                                    output_layer: int = 12) -> Dict[str, Any]:
    """HuggingFace HubertModel state_dict -> flax params tree (test oracle)."""
    ren: Dict[str, np.ndarray] = {}
    n_conv = sum(1 for k in sd if k.startswith("feature_extractor.conv_layers")
                 and k.endswith(".conv.weight"))
    fair: Dict[str, np.ndarray] = {}
    for i in range(n_conv):
        fair[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
    fair["feature_extractor.conv_layers.0.2.weight"] = \
        sd["feature_extractor.conv_layers.0.layer_norm.weight"]
    fair["feature_extractor.conv_layers.0.2.bias"] = \
        sd["feature_extractor.conv_layers.0.layer_norm.bias"]
    fair["layer_norm.weight"] = sd["feature_projection.layer_norm.weight"]
    fair["layer_norm.bias"] = sd["feature_projection.layer_norm.bias"]
    fair["post_extract_proj.weight"] = sd["feature_projection.projection.weight"]
    fair["post_extract_proj.bias"] = sd["feature_projection.projection.bias"]
    for a, b_ in (("weight_g", "original0"), ("weight_v", "original1")):
        key_new = f"encoder.pos_conv_embed.conv.parametrizations.weight.{b_}"
        key_old = f"encoder.pos_conv_embed.conv.{a}"
        if key_new in sd:
            fair[f"encoder.pos_conv.0.{a}"] = sd[key_new]
        elif key_old in sd:
            fair[f"encoder.pos_conv.0.{a}"] = sd[key_old]
    fair["encoder.pos_conv.0.bias"] = sd["encoder.pos_conv_embed.conv.bias"]
    fair["encoder.layer_norm.weight"] = sd["encoder.layer_norm.weight"]
    fair["encoder.layer_norm.bias"] = sd["encoder.layer_norm.bias"]
    for i in range(output_layer):
        src = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            fair[f"{src}.self_attn.{proj}.weight"] = sd[f"{src}.attention.{proj}.weight"]
            fair[f"{src}.self_attn.{proj}.bias"] = sd[f"{src}.attention.{proj}.bias"]
        fair[f"{src}.self_attn_layer_norm.weight"] = sd[f"{src}.layer_norm.weight"]
        fair[f"{src}.self_attn_layer_norm.bias"] = sd[f"{src}.layer_norm.bias"]
        fair[f"{src}.fc1.weight"] = sd[f"{src}.feed_forward.intermediate_dense.weight"]
        fair[f"{src}.fc1.bias"] = sd[f"{src}.feed_forward.intermediate_dense.bias"]
        fair[f"{src}.fc2.weight"] = sd[f"{src}.feed_forward.output_dense.weight"]
        fair[f"{src}.fc2.bias"] = sd[f"{src}.feed_forward.output_dense.bias"]
        fair[f"{src}.final_layer_norm.weight"] = sd[f"{src}.final_layer_norm.weight"]
        fair[f"{src}.final_layer_norm.bias"] = sd[f"{src}.final_layer_norm.bias"]
    return hubert_params_from_fairseq(fair, output_layer, final_proj=False)


def load_hubert_base(path: str, version: str = "v2"):
    """Load hubert_base.pt (fairseq checkpoint) -> (Hubert module, variables).

    Reference: rvc/hubert.py:265 get_hubert + :327 infer (layer 9 vs 12 tap).
    """
    from tpu_rvc.ckpt.torch_pth import load_pth
    from tpu_rvc.models.hubert import hubert_for_version

    ckpt = load_pth(path)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.startswith(("label_embs", "mask_emb"))}
    mod = hubert_for_version(version)
    params = hubert_params_from_fairseq(
        sd, output_layer=mod.output_layer, final_proj=mod.final_proj)
    return mod, {"params": params}

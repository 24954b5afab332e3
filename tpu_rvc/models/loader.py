"""Synthesizer construction from RVC `.pth` small models
(reference rvc/synthesizer.py:10 get_synthesizer / :31 load_synthesizer).

The small-model format (infer/lib/train/process_ckpt.py:15-57) is:
  {"weight": state_dict, "config": [spec_channels, segment_size,
   inter, hidden, filter, n_heads, n_layers, kernel, p_dropout, resblock,
   resblock_kernel_sizes, resblock_dilation_sizes, upsample_rates,
   upsample_initial_channel, upsample_kernel_sizes, spk_embed_dim, gin, sr],
   "f0": 0|1, "version": "v1"|"v2", "sr": "32k|40k|48k", "info": ..., ...}
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.ckpt.torch_pth import load_pth
from tpu_rvc.ckpt.convert import synthesizer_params_from_state_dict

SR_MAP = {"32k": 32000, "40k": 40000, "48k": 48000}


def synthesizer_from_config(config, version: str, use_f0: bool,
                            weight_norm: bool = False) -> Synthesizer:
    (spec_channels, segment_size, inter, hidden, filt, n_heads, n_layers,
     kernel, p_drop, resblock, res_k, res_d, ups, up_init, up_k,
     spk_dim, gin, sr) = config
    if isinstance(sr, str):
        sr = SR_MAP[sr]
    return Synthesizer(
        spec_channels=int(spec_channels), segment_size=int(segment_size),
        inter_channels=int(inter), hidden_channels=int(hidden),
        filter_channels=int(filt), n_heads=int(n_heads),
        n_layers=int(n_layers), kernel_size=int(kernel),
        p_dropout=float(p_drop), resblock=str(resblock),
        resblock_kernel_sizes=tuple(res_k),
        resblock_dilation_sizes=tuple(tuple(d) for d in res_d),
        upsample_rates=tuple(ups), upsample_initial_channel=int(up_init),
        upsample_kernel_sizes=tuple(up_k), spk_embed_dim=int(spk_dim),
        gin_channels=int(gin), sr=int(sr),
        encoder_dim=256 if version == "v1" else 768,
        use_f0=bool(use_f0), weight_norm=weight_norm,
    )


def load_synthesizer(path: str) -> Tuple[Synthesizer, Dict[str, Any], Dict]:
    """Load an RVC small model -> (module, variables, metadata).

    Weight-norm (g, v) pairs in the checkpoint are folded to plain kernels
    (the reference also removes weight norm for inference,
    rvc/layers/synthesizers.py:115).
    """
    cpt = load_pth(path)
    meta = {k: v for k, v in cpt.items() if k != "weight"}
    version = cpt.get("version", "v1")
    use_f0 = bool(cpt.get("f0", 1))
    config = list(cpt["config"])
    # reference quirk (rvc/synthesizer.py:15): spk_embed_dim is overwritten
    # by the actual emb_g shape since merged models may disagree
    sd = cpt["weight"]
    config[-3] = sd["emb_g.weight"].shape[0]
    mod = synthesizer_from_config(config, version, use_f0, weight_norm=False)
    # small models store fp16 on disk; compute dtype is set by the caller
    # (bf16/f32) — f16 params would leak into kernels TPU Mosaic rejects
    params = synthesizer_params_from_state_dict(
        {k: np.asarray(v, np.float32) for k, v in sd.items()},
        n_layers=mod.n_layers,
        n_ups=len(mod.upsample_rates),
        num_kernels=len(mod.resblock_kernel_sizes),
        use_f0=use_f0, has_enc_q=False, fold_weight_norm=True, strict=False)
    return mod, {"params": params}, meta

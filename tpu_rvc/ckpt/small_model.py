"""Small-model export, extract, merge, and info editing
(reference infer/lib/train/process_ckpt.py:15,60,197,209).

Small models are the ecosystem-interchange format: fp16 inference weights
(enc_q stripped) + positional `config` list + metadata.  Files written here
load in the stock reference (verified via torch.load in tests).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from tpu_rvc.core.config import HParams
from .torch_pth import load_pth, save_pth


def config_list_from_hparams(hp: HParams) -> List:
    """The positional config list (process_ckpt.py:23-42)."""
    m, d = hp.model, hp.data
    return [
        d.filter_length // 2 + 1,
        32,
        m.inter_channels,
        m.hidden_channels,
        m.filter_channels,
        m.n_heads,
        m.n_layers,
        m.kernel_size,
        m.p_dropout,
        m.resblock,
        list(m.resblock_kernel_sizes),
        [list(x) for x in m.resblock_dilation_sizes],
        list(m.upsample_rates),
        m.upsample_initial_channel,
        list(m.upsample_kernel_sizes),
        m.spk_embed_dim,
        m.gin_channels,
        d.sampling_rate,
    ]


def _strip_and_half(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v).astype(np.float16) for k, v in sd.items()
            if "enc_q" not in k}


def save_small_model(state_dict: Dict[str, np.ndarray], sr: str, if_f0: int,
                     name: str, epoch, version: str, hp: HParams,
                     out_path: Optional[str] = None,
                     author: str = "") -> str:
    """Export an inference small model (reference save_small_model,
    process_ckpt.py:15).  state_dict uses reference key names (use
    ckpt.convert.state_dict_from_synthesizer_params for flax params)."""
    opt: Dict[str, Any] = {"weight": _strip_and_half(state_dict)}
    opt["config"] = config_list_from_hparams(hp)
    opt["info"] = f"{epoch}epoch"
    opt["name"] = name
    opt["timestamp"] = int(time.time())
    if author:
        opt["author"] = author
    opt["sr"] = sr
    opt["f0"] = int(if_f0)
    opt["version"] = version
    try:
        from .hash import model_hash_ckpt, hash_id
        h = model_hash_ckpt(opt)
        opt["hash"] = h
        opt["id"] = hash_id(h)
    except Exception:
        pass
    path = out_path or f"assets/weights/{name}.pth"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_pth(opt, path)
    return path


def extract_small_model(train_ckpt_path: str, name: str, sr: str, if_f0: int,
                        info: str, version: str, hp: HParams,
                        out_path: Optional[str] = None,
                        author: str = "") -> str:
    """Derive a small model from a full training checkpoint
    (reference extract_small_model, process_ckpt.py:60)."""
    ckpt = load_pth(train_ckpt_path)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    opt: Dict[str, Any] = {"weight": _strip_and_half(sd)}
    opt["config"] = config_list_from_hparams(hp)
    opt["info"] = info or "extracted"
    opt["name"] = name
    opt["timestamp"] = int(time.time())
    if author:
        opt["author"] = author
    opt["sr"] = sr
    opt["f0"] = int(if_f0)
    opt["version"] = version
    path = out_path or f"assets/weights/{name}.pth"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_pth(opt, path)
    return path


def change_info(path: str, info: str, name: str, out_dir: str = ".") -> str:
    """Edit small-model metadata (reference change_info, process_ckpt.py:197)."""
    ckpt = load_pth(path)
    ckpt["info"] = info
    if not name:
        name = os.path.basename(path)
    out = os.path.join(out_dir, name)
    save_pth(ckpt, out)
    return out


def merge(path1: str, path2: str, alpha1: float, sr: str, f0: int,
          info: str, name: str, version: str,
          out_path: Optional[str] = None) -> str:
    """Weighted fusion of two small models (reference merge,
    process_ckpt.py:209), including the emb_g min-shape slice."""

    def get_weights(ckpt):
        sd = ckpt["model"] if "model" in ckpt else ckpt["weight"]
        return {k: np.asarray(v) for k, v in sd.items() if "enc_q" not in k}

    ckpt1_full = load_pth(path1)
    ckpt2_full = load_pth(path2)
    cfg = ckpt1_full["config"]
    w1, w2 = get_weights(ckpt1_full), get_weights(ckpt2_full)
    if sorted(w1) != sorted(w2):
        raise ValueError("model architectures are not the same")
    merged = {}
    for k in w1:
        a, b = w1[k].astype(np.float32), w2[k].astype(np.float32)
        if k == "emb_g.weight" and a.shape != b.shape:
            n = min(a.shape[0], b.shape[0])
            merged[k] = (alpha1 * a[:n] + (1 - alpha1) * b[:n]).astype(np.float16)
        else:
            merged[k] = (alpha1 * a + (1 - alpha1) * b).astype(np.float16)

    a1 = ckpt1_full.get("author", "")
    a2 = ckpt2_full.get("author", "")
    author = a1 if a1 == a2 else f"{a1 or 'Unknown'} & {a2 or 'Unknown'}"
    opt: Dict[str, Any] = {
        "weight": merged, "config": cfg, "name": name,
        "timestamp": int(time.time()), "sr": sr, "f0": int(f0),
        "version": version, "info": info,
    }
    if author:
        opt["author"] = author
    path = out_path or f"assets/weights/{name}.pth"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_pth(opt, path)
    return path

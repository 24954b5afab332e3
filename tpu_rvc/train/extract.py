"""f0 + HuBERT feature extraction (reference
infer/modules/train/extract_f0_print.py and extract_feature_print.py).

Outputs per utterance (same layout the reference trainer consumes):
  2a_f0/<name>.npy       coarse pitch (int), mel-quantized 1..255
  2b-f0nsf/<name>.npy    continuous f0 (Hz)
  3_feature{256,768}/<name>.npy  HuBERT features (T, D)

On TPU the feature pass batches utterances into padded buckets and runs one
jitted HuBERT forward per bucket; the reference instead shards files across
per-GPU processes (extract_feature_print.py:122).  `part/n_parts` sharding
is kept for multi-host runs.
"""

from __future__ import annotations

import os
import traceback
from typing import List, Optional, Tuple

import numpy as np

from tpu_rvc.audio.io import load_audio
from tpu_rvc.f0.gen import Generator as F0Generator


def extract_f0(exp_dir: str, f0_method: str = "rmvpe", n_workers: int = 1,
               part: int = 0, n_parts: int = 1,
               rmvpe_root: str = "assets/rmvpe") -> List[str]:
    """Extract coarse+continuous f0 for every 16k wav in the experiment."""
    inp = os.path.join(exp_dir, "1_16k_wavs")
    out_coarse = os.path.join(exp_dir, "2a_f0")
    out_cont = os.path.join(exp_dir, "2b-f0nsf")
    os.makedirs(out_coarse, exist_ok=True)
    os.makedirs(out_cont, exist_ok=True)
    gen = F0Generator(rmvpe_root, window=160, sr=16000)
    logs = []
    names = sorted(os.listdir(inp))[part::n_parts]
    for name in names:
        try:
            c_path = os.path.join(out_coarse, name + ".npy")
            f_path = os.path.join(out_cont, name + ".npy")
            if os.path.exists(c_path) and os.path.exists(f_path):
                continue
            audio = load_audio(os.path.join(inp, name), 16000)
            coarse, cont = gen.calculate(audio, audio.shape[0] // 160, 0,
                                         f0_method, 3)
            if np.isnan(cont).any():
                logs.append(f"{name} -> NaN f0, skipped")
                continue
            np.save(c_path, coarse, allow_pickle=False)
            np.save(f_path, cont, allow_pickle=False)
        except Exception:
            logs.append(f"{name} -> {traceback.format_exc()}")
    return logs


def extract_features(exp_dir: str, version: str = "v2",
                     hubert_path: str = "assets/hubert/hubert_base.pt",
                     part: int = 0, n_parts: int = 1,
                     hubert=None, hubert_vars=None,
                     dtype=None) -> List[str]:
    """Extract HuBERT features for every 16k wav
    (reference extract_feature_print.py:80-160)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
                 else jnp.float32)
    if hubert is None:
        from tpu_rvc.ckpt.hubert_loader import load_hubert_base
        hubert, hubert_vars = load_hubert_base(hubert_path, version)

    inp = os.path.join(exp_dir, "1_16k_wavs")
    out_dir = os.path.join(
        exp_dir, "3_feature256" if version == "v1" else "3_feature768")
    os.makedirs(out_dir, exist_ok=True)

    jitted = {}

    def run(wav: np.ndarray) -> np.ndarray:
        # bucket to whole seconds for compile reuse
        L = len(wav)
        bucket = ((L - 1) // 16000 + 1) * 16000
        if bucket not in jitted:
            def f(hv, w, true_len):
                pm = jnp.arange(bucket) >= true_len
                return hubert.apply(hv, w[None].astype(dtype),
                                    pm[None]).astype(jnp.float32)
            jitted[bucket] = jax.jit(f)
        pad = np.zeros(bucket, np.float32)
        pad[:L] = wav
        feats = np.asarray(jitted[bucket](hubert_vars, jnp.asarray(pad),
                                          jnp.asarray(L)))[0]
        n_true = (L - 400) // 320 + 1
        return feats[:n_true]

    logs = []
    names = sorted(os.listdir(inp))[part::n_parts]
    for name in names:
        try:
            out_path = os.path.join(out_dir, name.replace("wav", "npy"))
            if os.path.exists(out_path):
                continue
            wav = load_audio(os.path.join(inp, name), 16000)
            feats = run(wav)
            if np.isnan(feats).any():
                logs.append(f"{name} -> NaN features, skipped")
                continue
            np.save(out_path, feats, allow_pickle=False)
        except Exception:
            logs.append(f"{name} -> {traceback.format_exc()}")
    return logs

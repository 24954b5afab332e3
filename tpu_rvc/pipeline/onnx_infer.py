"""ONNX-graph voice conversion (reference rvc/onnx/infer.py).

The reference runs an exported synthesizer + a ContentVec encoder through
onnxruntime (infer.py:11-25,49-62).  Here both graphs execute through
`tpu_rvc.models.onnx_exec.OnnxModule` — jax.numpy ops, so the same code
path runs on CPU or TPU with no onnxruntime dependency.  Graphs exported
by `tpu_rvc.ckpt.jax2onnx` are static-shaped; inputs are padded to the
graph length and the output is trimmed (mirroring the pipeline's bucket
padding rather than onnxruntime's dynamic axes).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from tpu_rvc.models.onnx_exec import OnnxModule


class ContentVec:
    """HuBERT/ContentVec features from an ONNX graph
    (reference rvc/onnx/infer.py:28-46)."""

    def __init__(self, vec_path: str):
        self.model = OnnxModule.from_file(vec_path)
        self._fn = self.model.jit()  # one XLA program per call
        info = self.model.graph.input_info.get(self.model.graph.inputs[0])
        self.shape = info[1] if info else None

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        if wav.ndim == 2:  # stereo -> mono (reference infer.py:40)
            wav = wav.mean(-1)
        n = len(wav)
        t_model = None
        if self.shape is not None:
            t_model = int(self.shape[-1]) if isinstance(self.shape[-1], int) \
                else None
        if t_model is not None and n < t_model:
            wav = np.pad(wav, (0, t_model - n))
        elif t_model is not None:
            wav = wav[:t_model]
        feats = np.asarray(self._fn(wav.reshape(1, -1).astype(np.float32)))
        if feats.ndim == 2:
            feats = feats[None]
        return feats  # (1, T_frames, C) channel-last


class OnnxRVC:
    """End-to-end conversion through exported ONNX graphs
    (reference rvc/onnx/infer.py:49 `RVC`)."""

    def __init__(self, model_path: str, hop_len: int = 512,
                 model_sr: int = 40000,
                 vec_path: Optional[str] = None):
        self.model = OnnxModule.from_file(model_path)
        self._fn = self.model.jit()
        self.hop_len = hop_len
        self.model_sr = model_sr
        self.vec = ContentVec(vec_path) if vec_path and \
            os.path.exists(vec_path) else None
        info = self.model.graph.input_info.get("phone")
        self.t_model = int(info[1][1]) if info else None
        self.inter = int(self.model.graph.input_info["rnd"][1][-1]) \
            if "rnd" in self.model.graph.input_info else 192
        # speaker-mix graphs (reference spkmixmap, rvc/onnx/synthesizer.py:60)
        # declare ds as float (1, T, n_speakers) instead of int (1,)
        ds_info = self.model.graph.input_info.get("ds")
        self.spk_mix = bool(ds_info and len(ds_info[1]) == 3)
        self.n_speakers = int(ds_info[1][-1]) if self.spk_mix else None

    def forward(self, hubert, hubert_length, pitch, pitchf, ds, rnd):
        """Raw graph invocation; returns int16 audio
        (reference infer.py:97-118 scales by 32767)."""
        ds = (np.asarray(ds, np.float32) if self.spk_mix
              else np.asarray(ds, np.int32))
        out = np.asarray(self._fn(
            hubert.astype(np.float32),
            np.asarray([hubert_length], np.int32),
            pitch.astype(np.int32), pitchf.astype(np.float32),
            ds, rnd.astype(np.float32)))
        return (out.reshape(-1) * 32767).astype(np.int16)

    def infer(self, wav: np.ndarray, wav_sr: int, sid: int = 0,
              f0_method: str = "dio", f0_up_key: int = 0,
              seed: int = 0) -> np.ndarray:
        """Convert `wav` (reference infer.py:63-95): resample to 16k,
        ContentVec features 2x-repeated, f0, random `rnd`, graph forward."""
        from tpu_rvc.audio.io import _resample_host
        from tpu_rvc.f0.gen import Generator

        org_length = len(wav)
        if org_length / wav_sr > 50.0:
            raise RuntimeError("wav max length exceeded")
        wav16 = _resample_host(wav.astype(np.float32), wav_sr, 16000)

        if self.vec is not None:
            feats = self.vec(wav16)
        else:
            raise RuntimeError("no ContentVec ONNX model configured")
        feats = np.repeat(feats, 2, axis=1)  # 2x time upsample
        t = feats.shape[1]
        if self.t_model is not None:
            if t < self.t_model:
                feats = np.pad(feats, ((0, 0), (0, self.t_model - t), (0, 0)))
            else:
                feats = feats[:, :self.t_model]
                t = self.t_model
        hubert_length = feats.shape[1]

        gen = Generator(window=self.hop_len, sr=self.model_sr)
        pitch, pitchf = gen.calculate(wav.astype(np.float32), hubert_length,
                                      f0_up_key, f0_method, None)
        pitch = pitch.reshape(1, -1)[:, :hubert_length]
        pitchf = pitchf.reshape(1, -1)[:, :hubert_length].astype(np.float32)
        if pitch.shape[1] < hubert_length:
            pad = hubert_length - pitch.shape[1]
            pitch = np.pad(pitch, ((0, 0), (0, pad)))
            pitchf = np.pad(pitchf, ((0, 0), (0, pad)))

        rnd = np.random.default_rng(seed).standard_normal(
            (1, hubert_length, self.inter)).astype(np.float32)
        if self.spk_mix:
            # sid may be an int (one-hot mix), a (n_speakers,) static mix,
            # or a (T, n_speakers) per-frame mix trajectory
            if np.isscalar(sid) or np.ndim(sid) == 0:
                mix = np.zeros((1, hubert_length, self.n_speakers),
                               np.float32)
                mix[:, :, int(sid)] = 1.0
            else:
                sid = np.asarray(sid, np.float32)
                if sid.ndim == 1:
                    mix = np.broadcast_to(
                        sid, (1, hubert_length, self.n_speakers)).copy()
                else:
                    mix = sid[None, :hubert_length]
                    if mix.shape[1] < hubert_length:
                        mix = np.pad(mix, ((0, 0),
                                           (0, hubert_length - mix.shape[1]),
                                           (0, 0)), mode="edge")
            ds = mix
        else:
            ds = np.asarray([sid], np.int32)

        out = self.forward(feats, hubert_length, pitch, pitchf, ds, rnd)
        out = np.pad(out, (0, 2 * self.hop_len))
        n_out = int(round(org_length / wav_sr * self.model_sr))
        # valid samples = true (unpadded) frames * samples-per-frame
        valid = t * (out.shape[0] // max(hubert_length, 1))
        return out[:min(n_out, valid)]

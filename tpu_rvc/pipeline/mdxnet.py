"""MDX-Net dereverb/separation pipeline (reference infer/modules/uvr5/
mdxnet.py).

The Conv-TDF model arrives as an ONNX graph (onnx_dereverb_By_FoxJoy);
here it executes through the dependency-free ONNX-to-JAX executor
(models/onnx_exec.py) instead of onnxruntime.  The surrounding machinery
reproduces the reference exactly:

  - stereo STFT packed as (B, 4, n_bins, dim_t) real/imag x L/R
    (ConvTDFNetTrim.stft, mdxnet.py:42)
  - chunked demix with `margin` overlap (demix, mdxnet.py:108)
  - optional denoise trick: 0.5*(f(x) - f(-x))  (mdxnet.py:166-170)
  - trim n_fft//2 from each window edge, overlap-free concat
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.ops.stft import stft as _stft, istft as _istft, hann_window
from tpu_rvc.audio.io import load_audio, save_audio


class ConvTDFSpec:
    """STFT <-> packed-spectrogram transforms (ConvTDFNetTrim role)."""

    def __init__(self, dim_f: int = 3072, dim_t: int = 9, n_fft: int = 6144,
                 hop: int = 1024):
        self.dim_f = dim_f
        self.dim_t = 2 ** dim_t
        self.n_fft = n_fft
        self.hop = hop
        self.n_bins = n_fft // 2 + 1
        self.chunk_size = hop * (self.dim_t - 1)
        self.trim = n_fft // 2

    def stft(self, x: jax.Array) -> jax.Array:
        """(B, 2, chunk_size) -> (B, 4, dim_f, dim_t)."""
        B = x.shape[0]
        flat = x.reshape(-1, self.chunk_size)
        pad = self.n_fft // 2
        xp = jnp.pad(flat, ((0, 0), (pad, pad)), mode="reflect")
        spec = _stft(xp, self.n_fft, self.hop)  # (B*2, n_bins, dim_t)
        ri = jnp.stack([spec.real, spec.imag], axis=1)  # (B*2, 2, F, T)
        packed = ri.reshape(B, 4, self.n_bins, self.dim_t)
        return packed[:, :, : self.dim_f]

    def istft(self, x: jax.Array) -> jax.Array:
        """(B, 4, dim_f, dim_t) -> (B, 2, chunk_size)."""
        B = x.shape[0]
        pad_f = self.n_bins - self.dim_f
        x = jnp.concatenate(
            [x, jnp.zeros((B, 4, pad_f, self.dim_t), x.dtype)], axis=2)
        ri = x.reshape(B * 2, 2, self.n_bins, self.dim_t)
        spec = ri[:, 0] + 1j * ri[:, 1]
        y = _istft(spec, self.n_fft, self.hop)
        pad = self.n_fft // 2
        y = y[:, pad: pad + self.chunk_size]
        return y.reshape(B, 2, self.chunk_size)


class MDXPredictor:
    """Chunked demix driver (reference Predictor, mdxnet.py:90)."""

    def __init__(self, model_fn: Callable, spec: ConvTDFSpec,
                 chunks: int = 15, margin: int = 44100,
                 denoise: bool = True):
        self.model_fn = model_fn
        self.spec = spec
        self.chunks = chunks
        self.margin = margin
        self.denoise = denoise
        self._jit = jax.jit(self._run_window)

    def _run_window(self, waves: jax.Array) -> jax.Array:
        spek = self.spec.stft(waves)
        if self.denoise:
            pred = (-self.model_fn(-spek) * 0.5 + self.model_fn(spek) * 0.5)
        else:
            pred = self.model_fn(spek)
        return self.spec.istft(pred)

    def demix_base(self, mixes: Dict[int, np.ndarray],
                   margin_size: int) -> np.ndarray:
        chunked = []
        keys = list(mixes)
        for mix_key in keys:
            cmix = mixes[mix_key]
            n_sample = cmix.shape[1]
            trim = self.spec.trim
            gen_size = self.spec.chunk_size - 2 * trim
            pad = gen_size - n_sample % gen_size
            mix_p = np.concatenate(
                (np.zeros((2, trim), np.float32), cmix.astype(np.float32),
                 np.zeros((2, pad), np.float32),
                 np.zeros((2, trim), np.float32)), axis=1)
            waves = []
            i = 0
            while i < n_sample + pad:
                waves.append(mix_p[:, i: i + self.spec.chunk_size])
                i += gen_size
            batch = jnp.asarray(np.stack(waves))
            tar = np.asarray(self._jit(batch))  # (B, 2, chunk)
            tar_signal = tar[:, :, trim:-trim].transpose(1, 0, 2).reshape(
                2, -1)[:, :-pad]
            start = 0 if mix_key == 0 else margin_size
            end = None if mix_key == keys[-1] else -margin_size
            if margin_size == 0:
                end = None
            chunked.append([tar_signal[:, start:end]])
        return np.concatenate([c[0] for c in chunked], axis=-1)[None]

    def demix(self, mix: np.ndarray) -> np.ndarray:
        samples = mix.shape[-1]
        margin = self.margin
        chunk_size = self.chunks * 44100
        assert margin != 0, "margin cannot be zero"
        if margin > chunk_size:
            margin = chunk_size
        if self.chunks == 0 or samples < chunk_size:
            chunk_size = samples
        segmented = {}
        counter = -1
        for skip in range(0, samples, chunk_size):
            counter += 1
            s_margin = 0 if counter == 0 else margin
            end = min(skip + chunk_size + margin, samples)
            segmented[skip] = mix[:, skip - s_margin: end].copy()
            if end == samples:
                break
        return self.demix_base(segmented, margin_size=margin)


class MDXNetDereverb:
    """Facade (reference MDXNetDereverb, mdxnet.py:225)."""

    def __init__(self, onnx_dir: str =
                 "assets/uvr5_weights/onnx_dereverb_By_FoxJoy",
                 chunks: int = 15, model_fn: Optional[Callable] = None):
        spec = ConvTDFSpec(dim_f=3072, dim_t=9, n_fft=6144)
        if model_fn is None:
            from tpu_rvc.models.onnx_exec import OnnxModule
            path = os.path.join(onnx_dir, "vocals.onnx")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"MDX model not found at {path}; download the "
                    "onnx_dereverb_By_FoxJoy asset")
            model_fn = OnnxModule.from_file(path)
        self.pred = MDXPredictor(model_fn, spec, chunks=chunks,
                                 margin=44100, denoise=True)

    def _path_audio_(self, input_path: str, vocal_root: str,
                     others_root: str, format: str = "wav") -> None:
        os.makedirs(vocal_root, exist_ok=True)
        os.makedirs(others_root, exist_ok=True)
        basename = os.path.basename(input_path)
        mono = load_audio(input_path, 44100)
        mix = np.stack([mono, mono]) if mono.ndim == 1 else mono
        opt = self.pred.demix(mix)[0]
        save_audio(os.path.join(vocal_root, f"vocal_{basename}.wav"),
                   (mix - opt).T, 44100)
        save_audio(os.path.join(others_root, f"instrument_{basename}.wav"),
                   opt.T, 44100)

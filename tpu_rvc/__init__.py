"""tpu_rvc — TPU-native Retrieval-based Voice Conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fumiama/Retrieval-based-Voice-Conversion-WebUI (the "reference"):
VITS-derived any-to-one voice conversion with HuBERT content encoding,
f0 estimation (RMVPE/CREPE/PM/...), on-device feature retrieval, an
NSF-HiFiGAN vocoder, GAN training, and offline/streaming pipelines.

Layer map (bottom -> top), mirroring SURVEY.md §1:
  core/       config, hparams, mesh & dtype policy            (C1, C2)
  ops/        conv/stft/mel/resample primitives + Pallas      (C8, C9)
  nn/         flax modules: attention, WN, flows, generators  (C11-C18, C20)
  models/     HuBERT, Synthesizer, RMVPE, CREPE, UVR5         (C10, C19, C26, C43)
  f0/         pitch estimator dispatch + estimators           (C21-C29)
  retrieval/  on-device matmul kNN index                      (C30)
  audio/      io, slicer, SOLA, denoise                       (C5-C7, C45)
  pipeline/   offline + realtime conversion engines           (C31-C34)
  train/      data, GAN losses, pjit DP train step            (C35-C39)
  ckpt/       .pth interchange, merge, hash, export           (C40-C42, C46)
  parallel/   mesh construction and sharding rules            (C39)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TPU_RVC_PLATFORM"):
    # Force the JAX backend before first use.  Exists because some TPU
    # attachment plugins register themselves regardless of JAX_PLATFORMS,
    # and host-only work (ONNX export, ckpt surgery, dataset prep) should
    # not pay remote-device tracing costs.  Same role as the reference's
    # device override flags (configs/config.py:71-105 --device/--cpu).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TPU_RVC_PLATFORM"])

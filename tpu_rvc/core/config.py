"""Static configuration for tpu_rvc.

TPU-first re-design of the reference's config layer:
  - configs/config.py:35 (`Config` singleton, device/half detection, VRAM-tier
    pipeline pads) -> `RuntimeConfig` dataclass driven by `jax.devices()`.
  - configs/v{1,2}/{32,40,48}k.json hyperparameter files -> frozen dataclasses
    with the same field values, importable without filesystem access
    (`hparams_for("v2", 48000)`), still JSON-loadable for user overrides.

All hyperparameter values below reproduce the reference JSONs
(/root/reference/configs/v1/*.json, /root/reference/configs/v2/*.json).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class TrainConfig:
    log_interval: int = 200
    seed: int = 1234
    epochs: int = 20000
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    batch_size: int = 4
    fp16_run: bool = True  # on TPU this selects bfloat16 compute
    lr_decay: float = 0.999875
    segment_size: int = 12800
    init_lr_ratio: float = 1.0
    warmup_epochs: int = 0
    c_mel: float = 45.0
    c_kl: float = 1.0


@dataclass(frozen=True)
class DataConfig:
    max_wav_value: float = 32768.0
    sampling_rate: int = 40000
    filter_length: int = 2048
    hop_length: int = 400
    win_length: int = 2048
    n_mel_channels: int = 125
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = None

    @property
    def spec_channels(self) -> int:
        return self.filter_length // 2 + 1


@dataclass(frozen=True)
class ModelConfig:
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.0
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    upsample_rates: Tuple[int, ...] = (10, 10, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    use_spectral_norm: bool = False
    gin_channels: int = 256
    spk_embed_dim: int = 109

    @property
    def upsample_total(self) -> int:
        u = 1
        for r in self.upsample_rates:
            u *= r
        return u


@dataclass(frozen=True)
class HParams:
    version: str = "v2"  # "v1" (256-d features) | "v2" (768-d features)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)

    @property
    def encoder_dim(self) -> int:
        return 256 if self.version == "v1" else 768

    @property
    def sr(self) -> int:
        return self.data.sampling_rate


def _mk(version, sr, hop, nfft, win, nmel, seg, ups, ukern) -> HParams:
    return HParams(
        version=version,
        train=TrainConfig(segment_size=seg),
        data=DataConfig(
            sampling_rate=sr,
            filter_length=nfft,
            hop_length=hop,
            win_length=win,
            n_mel_channels=nmel,
        ),
        model=ModelConfig(
            upsample_rates=tuple(ups), upsample_kernel_sizes=tuple(ukern)
        ),
    )


# Values: /root/reference/configs/v1/{32k,40k,48k}.json, configs/v2/{32k,48k}.json.
# v2@40k has no JSON upstream and falls back to the v1 template
# (reference web.py:455); we mirror that.
_PRESETS = {
    ("v1", 32000): _mk("v1", 32000, 320, 1024, 1024, 80, 12800,
                       (10, 4, 2, 2, 2), (16, 16, 4, 4, 4)),
    ("v1", 40000): _mk("v1", 40000, 400, 2048, 2048, 125, 12800,
                       (10, 10, 2, 2), (16, 16, 4, 4)),
    ("v1", 48000): _mk("v1", 48000, 480, 2048, 2048, 128, 11520,
                       (10, 6, 2, 2, 2), (16, 16, 4, 4, 4)),
    ("v2", 32000): _mk("v2", 32000, 320, 1024, 1024, 80, 12800,
                       (10, 8, 2, 2), (20, 16, 4, 4)),
    ("v2", 48000): _mk("v2", 48000, 480, 2048, 2048, 128, 17280,
                       (12, 10, 2, 2), (24, 20, 4, 4)),
}


def hparams_for(version: str, sr: int) -> HParams:
    """Built-in hyperparameters for a (version, sample-rate) pair."""
    key = (version, int(sr))
    if key == ("v2", 40000):  # v2-40k falls back to v1 template (web.py:455)
        base = _PRESETS[("v1", 40000)]
        return dataclasses.replace(base, version="v2")
    if key not in _PRESETS:
        raise KeyError(f"no hparams preset for version={version} sr={sr}")
    return _PRESETS[key]


def load_hparams(path: str, version: str = "v2") -> HParams:
    """Load reference-format hparams JSON (configs/v*/{sr}.json schema)."""
    with open(path) as f:
        d = json.load(f)
    t, da, m = d["train"], d["data"], d["model"]
    return HParams(
        version=version,
        train=TrainConfig(
            log_interval=t.get("log_interval", 200),
            seed=t.get("seed", 1234),
            epochs=t.get("epochs", 20000),
            learning_rate=t.get("learning_rate", 1e-4),
            betas=tuple(t.get("betas", (0.8, 0.99))),
            eps=t.get("eps", 1e-9),
            batch_size=t.get("batch_size", 4),
            fp16_run=t.get("fp16_run", True),
            lr_decay=t.get("lr_decay", 0.999875),
            segment_size=t["segment_size"],
            c_mel=t.get("c_mel", 45.0),
            c_kl=t.get("c_kl", 1.0),
        ),
        data=DataConfig(
            max_wav_value=da.get("max_wav_value", 32768.0),
            sampling_rate=da["sampling_rate"],
            filter_length=da["filter_length"],
            hop_length=da["hop_length"],
            win_length=da["win_length"],
            n_mel_channels=da["n_mel_channels"],
            mel_fmin=da.get("mel_fmin", 0.0),
            mel_fmax=da.get("mel_fmax", None),
        ),
        model=ModelConfig(
            inter_channels=m["inter_channels"],
            hidden_channels=m["hidden_channels"],
            filter_channels=m["filter_channels"],
            n_heads=m["n_heads"],
            n_layers=m["n_layers"],
            kernel_size=m["kernel_size"],
            p_dropout=float(m["p_dropout"]),
            resblock=str(m["resblock"]),
            resblock_kernel_sizes=tuple(m["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(x) for x in m["resblock_dilation_sizes"]
            ),
            upsample_rates=tuple(m["upsample_rates"]),
            upsample_initial_channel=m["upsample_initial_channel"],
            upsample_kernel_sizes=tuple(m["upsample_kernel_sizes"]),
            use_spectral_norm=m.get("use_spectral_norm", False),
            gin_channels=m.get("gin_channels", 256),
            spk_embed_dim=m.get("spk_embed_dim", 109),
        ),
    )


@dataclass
class RuntimeConfig:
    """Runtime/device configuration (reference configs/config.py:35 role).

    The reference sizes its offline chunking pads by VRAM tier
    (configs/config.py:219-236).  On TPU the compiled graphs use bucketed
    static shapes, so we keep the largest ("6GB fp16") tier as the default
    chunking geometry and expose it for override.
    """

    # Chunking geometry in seconds (configs/config.py:219-227 fp16 tier).
    x_pad: float = 3.0
    x_query: float = 10.0
    x_center: float = 60.0
    x_max: float = 65.0
    # Compute dtype policy: bfloat16 on TPU plays the role of fp16 on CUDA.
    is_half: bool = True
    preprocess_per: float = 3.7

    @classmethod
    def create(cls, is_half: Optional[bool] = None) -> "RuntimeConfig":
        import jax

        platform = jax.devices()[0].platform
        if is_half is None:
            is_half = platform not in ("cpu",)
        if is_half:
            return cls(is_half=True)
        # fp32 tier mirrors configs/config.py:228-231
        return cls(x_pad=1.0, x_query=6.0, x_center=38.0, x_max=41.0,
                   is_half=False)

    @property
    def pads(self) -> Tuple[float, float, float, float]:
        return (self.x_pad, self.x_query, self.x_center, self.x_max)

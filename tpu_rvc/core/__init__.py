from .config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    HParams,
    load_hparams,
    hparams_for,
    RuntimeConfig,
)
from .mesh import make_mesh, default_mesh

__all__ = [
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "HParams",
    "load_hparams",
    "hparams_for",
    "RuntimeConfig",
    "make_mesh",
    "default_mesh",
]

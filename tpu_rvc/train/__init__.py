from .losses import (
    discriminator_loss,
    generator_loss,
    feature_loss,
    kl_loss,
)
from .step import TrainState, create_train_state, make_train_step

__all__ = [
    "discriminator_loss", "generator_loss", "feature_loss", "kl_loss",
    "TrainState", "create_train_state", "make_train_step",
]

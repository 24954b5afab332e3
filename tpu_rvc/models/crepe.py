"""CREPE 'full' pitch model in flax (reference rvc/f0/crepe.py:10 wraps
torchcrepe).

Architecture (Kim et al. 2018, torchcrepe layout): 1024-sample frames at
16 kHz, six conv blocks (filters 1024/128/128/128/256/512, widths
512/64/64/64/64/64, first stride 4), each followed by BatchNorm, ReLU and
max-pool 2, then a 2048->360 sigmoid classifier over 20-cent pitch bins.

BatchNorm is folded at load (ckpt.crepe_loader).  Frames are standardized
per-frame (mean/std) exactly like torchcrepe.preprocess.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu_rvc.models.rmvpe import FoldedBN

WINDOW = 1024
FILTERS = (1024, 128, 128, 128, 256, 512)
WIDTHS = (512, 64, 64, 64, 64, 64)
STRIDES = (4, 1, 1, 1, 1, 1)
N_BINS = 360
CENTS_MAPPING = 20 * np.arange(360) + 1997.3794084376191


class Crepe(nn.Module):
    @nn.compact
    def __call__(self, frames):
        # frames: (N, 1024) standardized
        x = frames[:, :, None]  # (N, 1024, 1)
        for i, (f, w, s) in enumerate(zip(FILTERS, WIDTHS, STRIDES)):
            # torchcrepe pads so out_len = ceil(in_len / stride) ("same")
            wgt = self.param(f"conv{i}_w", nn.initializers.he_normal(),
                             (w, x.shape[-1], f))
            b = self.param(f"conv{i}_b", nn.initializers.zeros, (f,))
            in_len = x.shape[1]
            out_len = -(-in_len // s)
            pad_total = max((out_len - 1) * s + w - in_len, 0)
            # torchcrepe pads (254, 254) style: evenly, extra at the start
            pad_l = pad_total - pad_total // 2
            pad_r = pad_total // 2
            x = jax.lax.conv_general_dilated(
                x, wgt.astype(x.dtype), window_strides=(s,),
                padding=[(pad_l, pad_r)],
                dimension_numbers=("NHC", "HIO", "NHC")) + b.astype(x.dtype)
            x = jax.nn.relu(x)
            x = FoldedBN(f, name=f"bn{i}")(x)
            x = nn.max_pool(x, (2,), strides=(2,))
        x = x.reshape(x.shape[0], -1)  # (N, 2048)
        wf = self.param("fc_w", nn.initializers.xavier_uniform(),
                        (x.shape[-1], N_BINS))
        bf = self.param("fc_b", nn.initializers.zeros, (N_BINS,))
        return jax.nn.sigmoid(x @ wf.astype(x.dtype) + bf.astype(x.dtype))

"""GAN losses (reference infer/lib/train/losses.py:4-62).

LSGAN adversarial terms, feature matching (x2), and the VITS KL divergence.
All reductions in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_loss(fmap_r: Sequence[Sequence[jax.Array]],
                 fmap_g: Sequence[Sequence[jax.Array]]) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss = loss + jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real: Sequence[jax.Array],
                       disc_gen: Sequence[jax.Array]
                       ) -> Tuple[jax.Array, List, List]:
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: Sequence[jax.Array]
                   ) -> Tuple[jax.Array, List]:
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def kl_loss(z_p: jax.Array, logs_q: jax.Array, m_p: jax.Array,
            logs_p: jax.Array, z_mask: jax.Array) -> jax.Array:
    """VITS prior/posterior KL (channel-last tensors here)."""
    z_p, logs_q = z_p.astype(jnp.float32), logs_q.astype(jnp.float32)
    m_p, logs_p = m_p.astype(jnp.float32), logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)

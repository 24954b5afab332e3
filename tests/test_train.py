"""Training stack tests: loss parity vs reference formulas, a full GAN step
on a tiny config, and the data-parallel step over a virtual 8-device mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.core.config import HParams, TrainConfig, DataConfig, ModelConfig
from tpu_rvc.train.losses import (discriminator_loss, generator_loss,
                                  feature_loss, kl_loss)
from tpu_rvc.train.step import create_train_state, make_train_step


TINY_HP = HParams(
    version="v1",
    train=TrainConfig(segment_size=1600, batch_size=2, fp16_run=False),
    data=DataConfig(sampling_rate=16000, filter_length=256, hop_length=160,
                    win_length=256, n_mel_channels=32),
    model=ModelConfig(
        inter_channels=32, hidden_channels=32, filter_channels=64,
        n_heads=2, n_layers=1, kernel_size=3,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        upsample_rates=(10, 16), upsample_initial_channel=64,
        upsample_kernel_sizes=(20, 32), gin_channels=16, spk_embed_dim=4),
)
# tiny hubert dim stand-in: v1 -> encoder_dim 256


def make_batch(hp, B=2, T=32, rng=None):
    rng = rng or np.random.default_rng(0)
    seg = hp.train.segment_size
    return {
        "phone": rng.standard_normal((B, T, hp.encoder_dim)).astype(np.float32),
        "phone_lengths": np.full((B,), T, np.int32),
        "pitch": rng.integers(1, 255, (B, T)).astype(np.int32),
        "pitchf": rng.uniform(100, 300, (B, T)).astype(np.float32),
        "spec": rng.standard_normal((B, T, hp.data.spec_channels)).astype(np.float32),
        "spec_lengths": np.full((B,), T, np.int32),
        "wave": rng.standard_normal((B, T * hp.data.hop_length, 1)).astype(np.float32) * 0.1,
        "sid": np.zeros((B,), np.int32),
    }


def test_losses_match_reference_formulas(rng):
    import torch
    dr = [torch.randn(2, 10), torch.randn(2, 7)]
    dg = [torch.randn(2, 10), torch.randn(2, 7)]
    # torch oracle per reference losses.py
    ref_d = sum(torch.mean((1 - r) ** 2) + torch.mean(g ** 2)
                for r, g in zip(dr, dg))
    ours_d, _, _ = discriminator_loss(
        [jnp.asarray(x.numpy()) for x in dr],
        [jnp.asarray(x.numpy()) for x in dg])
    np.testing.assert_allclose(float(ours_d), float(ref_d), rtol=1e-5)

    ref_g = sum(torch.mean((1 - g) ** 2) for g in dg)
    ours_g, _ = generator_loss([jnp.asarray(x.numpy()) for x in dg])
    np.testing.assert_allclose(float(ours_g), float(ref_g), rtol=1e-5)

    fr = [[torch.randn(2, 4, 4)], [torch.randn(2, 3, 3)]]
    fg = [[torch.randn(2, 4, 4)], [torch.randn(2, 3, 3)]]
    ref_fm = 2 * sum(torch.mean(torch.abs(r - g))
                     for R, G in zip(fr, fg) for r, g in zip(R, G))
    ours_fm = feature_loss(
        [[jnp.asarray(x.numpy()) for x in R] for R in fr],
        [[jnp.asarray(x.numpy()) for x in G] for G in fg])
    np.testing.assert_allclose(float(ours_fm), float(ref_fm), rtol=1e-5)

    z_p, logs_q = torch.randn(2, 8, 10), torch.randn(2, 8, 10) * 0.1
    m_p, logs_p = torch.randn(2, 8, 10), torch.randn(2, 8, 10) * 0.1
    mask = torch.ones(2, 1, 10)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * torch.exp(-2.0 * logs_p)
    ref_kl = torch.sum(kl * mask) / torch.sum(mask)
    # ours is channel-last: transpose inputs and mask (B, T, 1)
    ours_kl = kl_loss(
        jnp.asarray(z_p.numpy().transpose(0, 2, 1)),
        jnp.asarray(logs_q.numpy().transpose(0, 2, 1)),
        jnp.asarray(m_p.numpy().transpose(0, 2, 1)),
        jnp.asarray(logs_p.numpy().transpose(0, 2, 1)),
        jnp.ones((2, 10, 1)))
    np.testing.assert_allclose(float(ours_kl), float(ref_kl), rtol=2e-5)


def test_gan_train_step_runs_and_learns():
    state, net_g, net_d = create_train_state(TINY_HP, jax.random.PRNGKey(0))
    step = make_train_step(net_g, net_d, TINY_HP, donate=False)
    batch = {k: jnp.asarray(v) for k, v in make_batch(TINY_HP).items()}
    m0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        if m0 is None:
            m0 = metrics
    assert int(state.step) == 3
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
    # slice mels for image logging ride along (reference train.py:620-633)
    seg_frames = TINY_HP.train.segment_size // TINY_HP.data.hop_length
    assert metrics["mel_org"].shape == metrics["mel_gen"].shape
    assert metrics["mel_org"].shape[0] == seg_frames
    # discriminator should be improving on a fixed batch
    assert float(metrics["loss_disc"]) < float(m0["loss_disc"]) + 1.0


def test_dp_train_step_over_mesh():
    """Full GAN step sharded over the 8-device virtual CPU mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpu_rvc.core.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state, net_g, net_d = create_train_state(TINY_HP, jax.random.PRNGKey(0))
    step = make_train_step(net_g, net_d, TINY_HP, donate=False)
    batch_np = make_batch(TINY_HP, B=8)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    batch = {k: jax.device_put(jnp.asarray(v), data_sh)
             for k, v in batch_np.items()}
    state = jax.device_put(state, repl)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_gen_all"]))
    # params stay replicated after the step
    leaf = jax.tree.leaves(state.g_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_mel_image_rendering():
    """mel_image: (T, M) -> (3, M, T) float image in [0, 1], low
    frequencies at the bottom (reference plot_spectrogram_to_numpy role,
    utils.py:110-126)."""
    from tpu_rvc.train.loop import mel_image

    mel = np.linspace(-8.0, 2.0, 24 * 80).reshape(24, 80)
    img = mel_image(mel)
    assert img.shape == (3, 80, 24)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # constant input must not divide by zero
    flat = mel_image(np.zeros((10, 8)))
    assert np.isfinite(flat).all()

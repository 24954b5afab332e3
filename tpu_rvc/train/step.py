"""The GAN train step (reference infer/modules/train/train.py:508-663).

One jitted SPMD program per step:
  1. generator forward (random latent slice)
  2. discriminator update on (real slice, stop_grad(fake))
  3. generator update against the *updated* discriminator (matching the
     reference's optimizer ordering), loss = adv + feat-match + 45*L1(mel)
     + KL

Parallelism: pure data parallelism — batch sharded over the mesh's "data"
axis, params replicated.  Gradients are reduced by XLA's SPMD partitioner
(the mean over the sharded batch inserts the psum); no explicit collectives
needed — this replaces the reference's DDP/NCCL machinery (train.py:102-217).

bfloat16 policy: forward in bf16 when hp.train.fp16_run, losses and
parameters in fp32 (replacing torch AMP + GradScaler; bf16's range makes the
loss-scaler unnecessary).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tpu_rvc.core.config import HParams
from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.nn.discriminators import MultiPeriodDiscriminator
from tpu_rvc.ops.mel import mel_filterbank, dynamic_range_compression, mel_spectrogram
from .losses import (discriminator_loss, feature_loss, generator_loss,
                     kl_loss)


class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array


def _register_export_serialization() -> None:
    """Make train-step graphs AOT-serializable (utils/aot.AOTGraphCache):
    jax.export refuses PyTreeDefs with unregistered NamedTuple nodes, and
    the train step's signature carries TrainState + optax states.

    Best-effort at import time: AOT caching is an optional warm-start
    layer — a jax version without `export.register_namedtuple_serialization`
    must not break `import tpu_rvc.train`.
    """
    from tpu_rvc.utils.aot import register_optax_export_serialization

    register_optax_export_serialization()
    try:
        from jax import export as jexport
        jexport.register_namedtuple_serialization(
            TrainState, serialized_name="tpu_rvc.train.TrainState")
    except (ImportError, AttributeError):
        pass  # no jax.export on this version; AOT layer degrades to live
    except ValueError:
        pass  # already registered


_register_export_serialization()


def make_optimizers(hp: HParams, steps_per_epoch: int = 100):
    """AdamW(lr, betas, eps) with per-epoch exponential decay
    (reference train.py:253-298 + ExponentialLR gamma=lr_decay)."""
    t = hp.train

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return t.learning_rate * (t.lr_decay ** epoch)

    def mk():
        return optax.adamw(learning_rate=schedule, b1=t.betas[0],
                           b2=t.betas[1], eps=t.eps, weight_decay=0.01)

    return mk(), mk()


def create_train_state(hp: HParams, rng: jax.Array,
                       steps_per_epoch: int = 100,
                       g_params=None, d_params=None, use_f0: bool = True
                       ) -> Tuple[TrainState, Synthesizer,
                                  MultiPeriodDiscriminator]:
    """Initialize generator/discriminator/optimizers.

    use_f0=False builds the f0-less synthesizer variant (plain HiFiGAN
    decoder, reference Synthesizer*NoF0, synthesizers.py:252,344) whose
    batches carry no pitch/pitchf."""
    from tpu_rvc.models.synthesizer import make_synthesizer

    net_g = make_synthesizer(hp, weight_norm=True, use_f0=use_f0)
    net_d = MultiPeriodDiscriminator(version=hp.version)
    seg_frames = hp.train.segment_size // hp.data.hop_length
    T = max(seg_frames + 16, 64)
    if g_params is None:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        pitch_args = ((jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)))
                      if use_f0 else ())
        g_vars = net_g.init(
            {"params": k1, "noise": k2, "slice": k3},
            jnp.zeros((1, T, hp.encoder_dim)),
            jnp.asarray([T]),
            jnp.zeros((1, T, hp.data.spec_channels)),
            jnp.asarray([T]),
            jnp.asarray([0]),
            *pitch_args,
        )
        g_params = g_vars["params"]
    if d_params is None:
        k5 = jax.random.fold_in(rng, 5)
        d_vars = net_d.init(k5, jnp.zeros((1, hp.train.segment_size, 1)),
                            jnp.zeros((1, hp.train.segment_size, 1)))
        d_params = d_vars["params"]
    opt_g, opt_d = make_optimizers(hp, steps_per_epoch)
    state = TrainState(
        g_params=g_params, d_params=d_params,
        g_opt=opt_g.init(g_params), d_opt=opt_d.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, net_g, net_d


def make_train_step(net_g: Synthesizer, net_d: MultiPeriodDiscriminator,
                    hp: HParams, steps_per_epoch: int = 100,
                    donate: bool = True):
    """Build the jitted GAN step: (state, batch, rng) -> (state, metrics).

    batch dict (channel-last, fixed bucket shapes):
      phone (B, T, D), phone_lengths (B,), pitch (B, T) int32,
      pitchf (B, T), spec (B, T, F), spec_lengths (B,),
      wave (B, T*hop, 1), sid (B,)
    """
    t, d = hp.train, hp.data
    opt_g, opt_d = make_optimizers(hp, steps_per_epoch)
    seg_frames = t.segment_size // d.hop_length
    compute_dtype = jnp.bfloat16 if t.fp16_run else jnp.float32

    def spec_to_mel(spec_bft):
        basis = jnp.asarray(mel_filterbank(
            d.sampling_rate, d.filter_length, d.n_mel_channels,
            d.mel_fmin, d.mel_fmax))
        mel = jnp.einsum("mf,btf->btm", basis, spec_bft)
        return dynamic_range_compression(mel)

    def g_forward(g_params, batch, rngs):
        # f0-less batches carry no pitch keys (reference TextAudioLoader
        # vs TextAudioLoaderMultiNSFsid, data_utils.py)
        pitch_args = ((batch["pitch"], batch["pitchf"].astype(compute_dtype))
                      if net_g.use_f0 else ())
        # pin_* keys (test/debug only) pin every stochastic draw so one
        # step is numerically comparable to the reference trainer on
        # identical inputs (train.py:508-602): latent slice start,
        # posterior eps; sine rand-phase/noise become zero (the oracle
        # pins the matching torch draws the same way).  Dict-key presence
        # is static at trace time.
        pins = {}
        if "pin_ids_slice" in batch:
            pins["ids_slice"] = batch["pin_ids_slice"]
        if "pin_noise_eps" in batch:
            pins["noise_eps"] = batch["pin_noise_eps"].astype(compute_dtype)
        if pins:
            pins["deterministic"] = True
        return net_g.apply(
            {"params": g_params},
            batch["phone"].astype(compute_dtype),
            batch["phone_lengths"],
            batch["spec"].astype(compute_dtype),
            batch["spec_lengths"],
            batch["sid"],
            *pitch_args,
            rngs=rngs,
            **pins,
        )

    def slice_wave(wave, ids_slice):
        def take(w, start):
            return jax.lax.dynamic_slice_in_dim(
                w, start * d.hop_length, t.segment_size, axis=0)
        return jax.vmap(take)(wave, ids_slice)

    def step_fn(state: TrainState, batch: Dict[str, jax.Array],
                rng: jax.Array):
        k_noise, k_slice = jax.random.split(jax.random.fold_in(rng, state.step))
        rngs = {"noise": k_noise, "slice": k_slice}

        # ---- generator forward (once, for the D update) ----
        y_hat, ids_slice, x_mask, z_mask, latents = g_forward(
            state.g_params, batch, rngs)
        wave_slice = slice_wave(batch["wave"][..., 0], ids_slice)[..., None]

        # ---- discriminator update ----
        def d_loss_fn(d_params):
            y_dr, y_dg, _, _ = net_d.apply(
                {"params": d_params}, wave_slice.astype(compute_dtype),
                jax.lax.stop_gradient(y_hat))
            loss_disc, _, _ = discriminator_loss(y_dr, y_dg)
            return loss_disc

        loss_disc, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = opt_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update (against the updated discriminator) ----
        mel = spec_to_mel(batch["spec"].astype(jnp.float32))

        def g_loss_fn(g_params):
            y_hat2, ids2, _, z_mask2, (z, z_p, m_p, logs_p, m_q, logs_q) = \
                g_forward(g_params, batch, rngs)  # same rngs -> same slice
            y_mel = jax.vmap(
                lambda m, s: jax.lax.dynamic_slice_in_dim(
                    m, s, seg_frames, axis=0))(mel, ids2)
            y_hat_mel = mel_spectrogram(
                y_hat2[..., 0].astype(jnp.float32), d.filter_length,
                d.n_mel_channels, d.sampling_rate, d.hop_length,
                d.win_length, d.mel_fmin, d.mel_fmax)
            y_hat_mel = jnp.swapaxes(y_hat_mel, 1, 2)  # (B, T, M)
            y_dr, y_dg, fmap_r, fmap_g = net_d.apply(
                {"params": d_params}, wave_slice.astype(compute_dtype),
                y_hat2)
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * t.c_mel
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, z_mask2) * t.c_kl
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, _ = generator_loss(y_dg)
            total = loss_gen + loss_fm + loss_mel + loss_kl
            return total, ({"loss_gen": loss_gen, "loss_fm": loss_fm,
                            "loss_mel": loss_mel, "loss_kl": loss_kl},
                           y_mel, y_hat_mel)

        (loss_gen_all, (parts, y_mel, y_hat_mel)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = opt_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"loss_disc": loss_disc, "loss_gen_all": loss_gen_all,
                   "grad_norm_g": optax.global_norm(g_grads),
                   "grad_norm_d": optax.global_norm(d_grads), **parts,
                   # first-sample slice mels for image logging at
                   # log_interval (reference train.py:604-633 slice/mel_org,
                   # slice/mel_gen); tiny (seg_frames x n_mel), popped by
                   # the loop before scalar logging
                   "mel_org": y_mel[0].astype(jnp.float32),
                   "mel_gen": y_hat_mel[0].astype(jnp.float32)}
        new_state = TrainState(g_params, d_params, g_opt, d_opt,
                               state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

"""The VITS synthesizer (reference rvc/layers/synthesizers.py:18 and the four
named variants :206,:252,:298,:344, unified by (encoder_dim, use_f0, sr)).

One flax module covers training forward and inference:
  train():  enc_p + enc_q -> flow -> random latent slice -> decoder
  infer():  enc_p -> sample prior (0.66666 * noise) -> flow reverse -> decoder
            with static skip_head / return_length / return_length2 for the
            streaming contract (synthesizers.py:160-203): the flow sees a
            24-frame pre-roll ahead of the decoded tail.

All tensors channel-last.  phone: (B, T, encoder_dim); pitch: (B, T) int32;
pitchf: (B, T) float Hz; sid: (B,) int32.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_rvc.core.config import HParams
from tpu_rvc.nn.encoders import TextEncoder, PosteriorEncoder
from tpu_rvc.nn.flows import ResidualCouplingBlock
from tpu_rvc.nn.generators import Generator, NSFGenerator

FLOW_PREROLL = 24  # flow pre-roll frames in streaming mode (synthesizers.py:176)


class Synthesizer(nn.Module):
    spec_channels: int
    segment_size: int
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: Tuple[int, ...]
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...]
    upsample_rates: Tuple[int, ...]
    upsample_initial_channel: int
    upsample_kernel_sizes: Tuple[int, ...]
    spk_embed_dim: int
    gin_channels: int
    sr: int
    encoder_dim: int
    use_f0: bool
    weight_norm: bool = True  # train ckpts carry (g, v); folded for inference

    def setup(self):
        self.enc_p = TextEncoder(
            self.inter_channels, self.hidden_channels, self.filter_channels,
            self.n_heads, self.n_layers, self.kernel_size, self.p_dropout,
            f0=self.use_f0,
        )
        dec_kwargs = dict(
            initial_channel=self.inter_channels,
            resblock=self.resblock,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            upsample_rates=self.upsample_rates,
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            gin_channels=self.gin_channels,
            weight_norm=self.weight_norm,
        )
        if self.use_f0:
            self.dec = NSFGenerator(sr=self.sr, **dec_kwargs)
        else:
            self.dec = Generator(**dec_kwargs)
        self.enc_q = PosteriorEncoder(
            self.spec_channels, self.inter_channels, self.hidden_channels,
            5, 1, 16, gin_channels=self.gin_channels,
            weight_norm=self.weight_norm,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, 3,
            gin_channels=self.gin_channels, weight_norm=self.weight_norm,
        )
        self.emb_g = nn.Embed(self.spk_embed_dim, self.gin_channels,
                              embedding_init=nn.initializers.normal(1.0))

    def _speaker(self, sid):
        return self.emb_g(sid)[:, None, :]  # (B, 1, gin)

    def __call__(self, phone, phone_lengths, y, y_lengths, ds,
                 pitch=None, pitchf=None, ids_slice=None, noise_eps=None,
                 deterministic: bool = False):
        """Training forward (reference synthesizers.py:132).

        ids_slice / noise_eps / deterministic pin every stochastic term
        (latent slice start, posterior eps, sine rand-phase/noise) so
        step-level loss parity vs the reference torch trainer is testable
        on identical draws (train.py:508-602 role)."""
        g = self._speaker(ds)
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g, eps=noise_eps)
        z_p = self.flow(z, y_mask, g=g)

        # random latent slice (reference rand_slice_segments_on_last_dim)
        seg_frames = self.segment_size // math.prod(self.upsample_rates)
        if ids_slice is None:
            key = self.make_rng("slice")
            max_start = jnp.maximum(y_lengths - seg_frames - 1, 1)
            ids_slice = (jax.random.uniform(key, (z.shape[0],)) *
                         max_start.astype(jnp.float32)).astype(jnp.int32)

        def take(t, start):  # t: (T, C) or (T,)
            return jax.lax.dynamic_slice_in_dim(t, start, seg_frames, axis=0)

        z_slice = jax.vmap(take)(z, ids_slice)
        if self.use_f0 and pitchf is not None:
            pitchf_slice = jax.vmap(take)(pitchf, ids_slice)
            o = self.dec(z_slice, pitchf_slice, g=g,
                         deterministic=deterministic)
        else:
            o = self.dec(z_slice, g=g, deterministic=deterministic)
        return o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)

    def infer(self, phone, phone_lengths, sid, pitch=None, pitchf=None,
              skip_head: Optional[int] = None,
              return_length: Optional[int] = None,
              return_length2: Optional[int] = None,
              noise_scale: float = 0.66666,
              deterministic: bool = False,
              noise: Optional[jax.Array] = None):
        """Inference (reference synthesizers.py:160). skip_head/return_length
        are static ints (bucketed by the pipeline).  deterministic=True zeroes
        all stochastic terms (prior noise, sine rand-phase/noise) for golden
        tests and reproducible exports.  `noise` supplies the prior eps
        externally — the ONNX-export contract (reference
        rvc/onnx/synthesizer.py:82 takes `rnd` as a graph input)."""
        g = self._speaker(sid)
        if deterministic:
            key = jax.random.PRNGKey(0)
        else:
            key = self.make_rng("noise")
        if skip_head is not None and return_length is not None:
            head, length = int(skip_head), int(return_length)
            flow_head = max(head - FLOW_PREROLL, 0)
            dec_head = head - flow_head
            m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths,
                                             skip_head=flow_head)
            eps = (noise if noise is not None
                   else jnp.zeros_like(m_p) if deterministic
                   else jax.random.normal(key, m_p.shape, m_p.dtype))
            z_p = (m_p + jnp.exp(logs_p) * eps * noise_scale) * x_mask
            z = self.flow(z_p, x_mask, g=g, reverse=True)
            z = z[:, dec_head:dec_head + length]
            x_mask = x_mask[:, dec_head:dec_head + length]
            if pitchf is not None:
                pitchf = pitchf[:, head:head + length]
        else:
            m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
            eps = (noise if noise is not None
                   else jnp.zeros_like(m_p) if deterministic
                   else jax.random.normal(key, m_p.shape, m_p.dtype))
            z_p = (m_p + jnp.exp(logs_p) * eps * noise_scale) * x_mask
            z = self.flow(z_p, x_mask, g=g, reverse=True)
        if self.use_f0 and pitchf is not None:
            o = self.dec(z * x_mask, pitchf, g=g, n_res=return_length2,
                         deterministic=deterministic)
        else:
            o = self.dec(z * x_mask, g=g, n_res=return_length2)
        return o

    def infer_mix(self, phone, phone_lengths, g_mix, pitch=None, pitchf=None,
                  noise=None):
        """Speaker-MIX inference (reference rvc/onnx/synthesizer.py:60-81
        construct_spkmixmap + forward): instead of one integer sid, `g_mix`
        (B, T, n_speakers) gives per-frame mixing weights over the speaker
        embedding table, so exported graphs can morph between speakers
        mid-utterance.  The conditioning vector becomes time-varying
        (B, T, gin) — every cond_layer is a 1x1 conv, so per-frame g
        broadcasts through WN/flow/decoder unchanged.  Noise is external
        (`rnd` in the ONNX contract) and the decoder is deterministic,
        matching the reference's export forward."""
        emb = self.emb_g.embedding  # (n_speakers, gin)
        g = jnp.einsum("bts,sh->bth", g_mix, emb.astype(g_mix.dtype))
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        eps = noise if noise is not None else jnp.zeros_like(m_p)
        z_p = (m_p + jnp.exp(logs_p) * eps) * x_mask
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        if self.use_f0 and pitchf is not None:
            return self.dec(z * x_mask, pitchf, g=g, deterministic=True)
        return self.dec(z * x_mask, g=g, deterministic=True)


def make_synthesizer(hp: HParams, weight_norm: bool = True,
                     use_f0: bool = True) -> Synthesizer:
    """Construct a Synthesizer from HParams (reference rvc/synthesizer.py:10)."""
    m, d, t = hp.model, hp.data, hp.train
    return Synthesizer(
        spec_channels=d.spec_channels,
        segment_size=t.segment_size,
        inter_channels=m.inter_channels,
        hidden_channels=m.hidden_channels,
        filter_channels=m.filter_channels,
        n_heads=m.n_heads,
        n_layers=m.n_layers,
        kernel_size=m.kernel_size,
        p_dropout=m.p_dropout,
        resblock=m.resblock,
        resblock_kernel_sizes=tuple(m.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(x) for x in m.resblock_dilation_sizes),
        upsample_rates=tuple(m.upsample_rates),
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=tuple(m.upsample_kernel_sizes),
        spk_embed_dim=m.spk_embed_dim,
        gin_channels=m.gin_channels,
        sr=d.sampling_rate,
        encoder_dim=hp.encoder_dim,
        use_f0=use_f0,
        weight_norm=weight_norm,
    )

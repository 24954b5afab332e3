"""SPMD batched inference over the virtual 8-device mesh: each row of the
sharded batch must reproduce the single-utterance fused graph exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.core.mesh import make_mesh
from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.models.hubert import Hubert
from tpu_rvc.pipeline.vc import Pipeline
from tpu_rvc.parallel import batch_convert

from tests.test_pipeline import SMALL_HUBERT, SMALL_SYNTH, tone


@pytest.fixture(scope="module")
def pipe():
    hub = Hubert(**SMALL_HUBERT)
    hv = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = Synthesizer(**SMALL_SYNTH)
    T = 20
    sv = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 64)), jnp.asarray([T]), jnp.asarray([0]),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)),
        method=Synthesizer.infer)
    return Pipeline(16000, hubert=hub, hubert_vars=hv, synth=syn,
                    synth_vars=sv, version="v2", x_pad=0.5)


def test_batch_convert_dp_matches_single(pipe):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    B = 8
    rows = [tone(180.0 + 25 * i, dur=1.0) for i in range(B)]
    pad = pipe.t_pad
    batch = np.stack([np.pad(r, (pad, pad), mode="reflect") for r in rows])

    out = batch_convert(pipe, batch, sids=np.zeros(B, np.int32), mesh=mesh,
                        f0_method="pm", rms_mix_rate=1.0, protect=0.33)
    assert out.shape[0] == B and out.dtype == np.int16

    # row 3 vs the single-utterance fused graph with the same noise key
    L = batch.shape[1]
    graph = pipe._full_graph(L, True, False, True, "pm")
    single = np.asarray(graph(
        pipe.hubert_vars, pipe.synth_vars, {},
        jnp.asarray(batch[3]), jnp.asarray(0.0), jnp.asarray(0),
        jnp.zeros((1, 768), jnp.float32), jnp.zeros((1,), jnp.float32),
        jnp.asarray(0.0), jnp.asarray(0.33), jnp.asarray(1.0),
        jax.random.PRNGKey(3)))
    assert single.shape == out[3].shape
    # int16 outputs: identical math modulo reduction-order rounding
    assert np.mean(np.abs(out[3].astype(np.int32)
                          - single.astype(np.int32)) <= 1) > 0.999


def test_convert_long_chunk_parallel_matches_sequential(pipe):
    """convert_long: silence-split chunks of ONE utterance sharded over the
    mesh must reproduce the sequential multi-chunk pipeline."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from tpu_rvc.parallel import convert_long
    from tpu_rvc.pipeline.vc import Pipeline, silence_chunk_bounds

    # small chunking geometry: ~11 s audio -> 2 cuts -> 3 chunks
    p = Pipeline(16000, hubert=pipe.hubert, hubert_vars=pipe.hubert_vars,
                 synth=pipe.synth, synth_vars=pipe.synth_vars, version="v2",
                 x_pad=0.5, x_query=1.0, x_center=4.0, x_max=5.0)
    rng = np.random.default_rng(0)
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(11 * 16000) / 16000)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 *
                                   np.arange(11 * 16000) / 16000))
             ).astype(np.float32)
    assert len(silence_chunk_bounds(audio, p.t_center, p.t_query,
                                    p.t_max)) >= 2

    mesh = make_mesh(n_data=8)
    par = convert_long(p, 0, audio.copy(), mesh, f0_method="pm",
                       rms_mix_rate=1.0, protect=0.33, noise_seed=5)
    seq = p.pipeline(0, audio.copy(), [0.0, 0.0, 0.0], 0, "pm", None, 0.0,
                     1, 3, 0, 1.0, 0.33, noise_seed=5)
    assert par.shape == seq.shape and par.dtype == np.int16
    # Chunks whose sequential bucket equals the parallel common bucket are
    # numerically identical modulo one int16 round-trip.  The LAST chunk
    # legitimately differs: it is shorter, the sequential path buckets it
    # smaller, and the synthesizer noise draw is shape-dependent (same
    # property as the reference's torch.rand) — so compare up to it.
    bounds = silence_chunk_bounds(audio, p.t_center, p.t_query, p.t_max)
    upsample = int(np.prod(p.synth.upsample_rates))
    kept, s = 0, 0
    for t in bounds:  # same chunk arithmetic as convert_long / pipeline
        t = t // 160 * 160
        chunk_len = t + p.t_pad2 + 160 - s
        kept += (chunk_len // 160) * upsample - 2 * p.t_pad_tgt
        s = t
    head_par, head_seq = par[:kept].astype(np.int32), \
        seq[:kept].astype(np.int32)
    close = np.abs(head_par - head_seq) <= 4
    assert np.mean(close) > 0.999, f"only {np.mean(close):.4f} close"
    # the tail is still real audio: finite, nonzero, right length
    assert np.abs(par[kept:]).max() > 0

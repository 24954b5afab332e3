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

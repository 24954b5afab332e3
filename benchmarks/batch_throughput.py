#!/usr/bin/env python
"""Chip serving throughput: B utterances per dispatch through the vmapped
full-quality conversion graph (parallel.make_batch_graph on a 1-chip
mesh).  Metric: audio-seconds per second per chip — the serving-side
complement of bench.py's single-stream RTF.

Usage: python benchmarks/batch_throughput.py [B ...]   (default 1 2 4)
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tpu_rvc.core.config import hparams_for
from tpu_rvc.models.synthesizer import make_synthesizer
from tpu_rvc.models.hubert import hubert_for_version
from tpu_rvc.pipeline.vc import Pipeline
from tpu_rvc.retrieval.index import build_index
from tpu_rvc.f0.rmvpe import RMVPE
from tpu_rvc.models.rmvpe import E2E
from tpu_rvc.parallel import batch_convert


def main(batches):
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    hp = hparams_for("v2", 48000)
    hub = hubert_for_version("v2")
    hv = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = make_synthesizer(hp, weight_norm=False, use_f0=True)
    T0 = 50
    sv = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T0, 768)), jnp.asarray([T0]), jnp.asarray([0]),
        jnp.zeros((1, T0), jnp.int32), jnp.zeros((1, T0)),
        method=syn.infer)
    pipe = Pipeline(48000, hubert=hub, hubert_vars=hv, synth=syn,
                    synth_vars=sv, version="v2", dtype=dtype)
    rv = E2E().init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 32)))
    pipe.f0_gen._estimators["rmvpe"] = RMVPE(variables=rv, dtype=dtype)
    rng = np.random.default_rng(0)
    index = build_index(rng.standard_normal((10_000, 768)).astype(np.float32))

    dur_s, sr = 10.0, 16000
    t = np.arange(int(sr * dur_s)) / sr
    base = (0.4 * np.sin(2 * np.pi * 220 * t) *
            (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    pad = pipe.t_pad
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))

    for B in batches:
        rows = np.stack([np.pad(base * (0.8 + 0.05 * i), (pad, pad),
                                mode="reflect") for i in range(B)])
        def convert():
            return batch_convert(pipe, rows, sids=np.zeros(B, np.int32),
                                 mesh=mesh, f0_method="rmvpe", index=index,
                                 index_rate=0.75, protect=0.33,
                                 rms_mix_rate=0.25)
        t0 = time.time()
        out = convert()
        print(f"B={B}: compile+first {time.time()-t0:.0f}s "
              f"out {out.shape}", flush=True)
        walls = []
        for _ in range(6):
            t0 = time.time()
            convert()
            walls.append(time.time() - t0)
        med = statistics.median(walls[1:])
        thr = B * dur_s / med
        print(f"B={B}: {med*1e3:7.1f} ms/dispatch -> "
              f"{thr:6.1f} audio-s/s/chip ({thr/B:5.1f}x per stream)",
              flush=True)


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [1, 2, 4])

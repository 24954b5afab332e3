#!/usr/bin/env python
"""Multi-stream realtime serving capacity: N concurrent voice-changer
sessions per chip, each on 160 ms blocks through the single-dispatch
FusedStreamGraph (RMVPE f0 in-graph), batched over a stream axis.

Usage: python benchmarks/streaming_capacity.py [B ...]   (default 1 4 8 16)

Weights are random-init (FLOP-identical to trained).  A configuration is
viable when p50 block wall < 160 ms; capacity = the largest viable N.
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tpu_rvc.core.config import hparams_for
from tpu_rvc.models.synthesizer import make_synthesizer
from tpu_rvc.models.hubert import hubert_for_version
from tpu_rvc.pipeline.rt import RealtimeVC, FusedStreamGraph
from tpu_rvc.f0.rmvpe import RMVPE
from tpu_rvc.models.rmvpe import E2E


def main(batches):
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    hp = hparams_for("v2", 48000)
    hub = hubert_for_version("v2")
    hv = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = make_synthesizer(hp, weight_norm=False, use_f0=True)
    sv = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 50, 768)), jnp.asarray([50]), jnp.asarray([0]),
        jnp.zeros((1, 50), jnp.int32), jnp.zeros((1, 50)),
        method=syn.infer)
    eng = RealtimeVC(hubert=hub, hubert_vars=hv, synth=syn, synth_vars=sv,
                     version="v2", if_f0=1, dtype=dtype)
    eng.f0_gen._estimators["rmvpe"] = RMVPE(
        variables=E2E().init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 32))),
        dtype=dtype)

    sr = 48000
    zc = sr // 100
    block = 16 * zc                       # 160 ms
    total = (250 + 16 + 5 + 1) * zc       # gui defaults: extra 2.5 s window
    return_length = 16 + 5 + 1

    for B in batches:
        fused = FusedStreamGraph(eng, stream_sr=sr, block_frame=block,
                                 ctx_frame=2 * zc, total_len=total,
                                 skip_head=250, return_length=return_length,
                                 f0method="rmvpe", n_streams=B)
        state = fused.init_state()
        t = np.arange(block + 2 * zc) / sr
        seg1 = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        seg = seg1 if B == 1 else np.stack([seg1] * B)
        t0 = time.time()
        out, state = fused(state, seg)
        compile_s = time.time() - t0
        walls = []
        for _ in range(15):
            t0 = time.time()
            out, state = fused(state, seg)
            walls.append(time.time() - t0)
        walls = sorted(walls)
        p50 = statistics.median(walls)
        p90 = walls[int(0.9 * len(walls)) - 1]
        print(f"B={B:3d}: compile {compile_s:.0f}s, "
              f"p50 {p50 * 1000:.1f} ms, p90 {p90 * 1000:.1f} ms per "
              f"160 ms block ({'OK' if p50 < 0.16 else 'OVER'})",
              flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 4, 8, 16])

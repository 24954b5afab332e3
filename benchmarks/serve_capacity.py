#!/usr/bin/env python
"""End-to-end serving capacity through SlotScheduler (apps/serve.py core).

streaming_capacity.py measures the raw batched graph; this measures the
actual serving path per tick — block pop, batched dispatch, per-slot SOLA
merge, queue push — for N fully-loaded slots.  A configuration is viable
when p50 tick wall < block time (160 ms): every client gets its block
back within cadence.

Usage: python benchmarks/serve_capacity.py [N ...]   (default 1 4 8 16)
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
from tpu_rvc.pipeline.rt import RealtimeVC
from tpu_rvc.pipeline.serve import SlotScheduler
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
    for N in batches:
        sched = SlotScheduler(eng, n_slots=N, samplerate=sr,
                              block_time=0.16, crossfade_time=0.05,
                              extra_time=2.5, f0method="rmvpe")
        bf = sched.block_frame
        slots = [sched.attach() for _ in range(N)]
        t = np.arange(bf) / sr
        for rep, s in enumerate(slots):
            sched.submit(s, (0.4 * np.sin(
                2 * np.pi * (200 + 30 * rep) * t)).astype(np.float32))
        t0 = time.time()
        sched.tick()
        compile_s = time.time() - t0
        walls = []
        for _ in range(15):
            for s in slots:
                sched.submit(s, (0.4 * np.sin(2 * np.pi * 220 * t))
                             .astype(np.float32))
                sched.collect(s)
            t0 = time.time()
            sched.tick()
            walls.append(time.time() - t0)
        walls = sorted(walls)
        p50 = statistics.median(walls)
        p90 = walls[int(0.9 * len(walls)) - 1]
        st = sched.stats()
        print(f"N={N:3d}: compile {compile_s:.0f}s, tick p50 "
              f"{p50 * 1000:.1f} ms, p90 {p90 * 1000:.1f} ms per 160 ms "
              f"block x {N} clients "
              f"({'OK' if p50 < 0.16 else 'OVER'}; underruns "
              f"{sum(st['underruns'])})", flush=True)


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [1, 4, 8, 16])

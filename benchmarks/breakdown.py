#!/usr/bin/env python
"""Per-stage timing of the offline conversion path: HuBERT vs RMVPE f0 vs
synthesizer, each as its own jitted program, timed fetch-inclusive (the
only reliable sync on the remote-attached backend — see CLAUDE.md).

Usage: python benchmarks/breakdown.py [seconds_of_audio]   (default 10)
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
from tpu_rvc.models.rmvpe import E2E
from tpu_rvc.f0.device import rmvpe_f0_device


def timeit(fn, n=7):
    fn()  # compile
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn())  # fetch = sync
        walls.append(time.time() - t0)
    return statistics.median(walls)


def main(dur_s: float):
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    hp = hparams_for("v2", 48000)
    L16 = int(16000 * dur_s)
    p_len = L16 // 160
    rng = np.random.default_rng(0)

    hub = hubert_for_version("v2")
    hv = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    wav = jnp.asarray(rng.standard_normal((1, L16)) * 0.1, dtype)

    hub_fn = jax.jit(lambda v, w: hub.apply(v, w))
    t_hub = timeit(lambda: hub_fn(hv, wav))

    e2e = E2E()
    rv = e2e.init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 32)))
    f0_fn = jax.jit(lambda v, w: rmvpe_f0_device(
        w, p_len, 0.0, e2e, v, dtype=dtype)[1])
    t_f0 = timeit(lambda: f0_fn(rv, wav[0].astype(jnp.float32)))

    syn = make_synthesizer(hp, weight_norm=False, use_f0=True)
    sv = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 50, 768)), jnp.asarray([50]), jnp.asarray([0]),
        jnp.zeros((1, 50), jnp.int32), jnp.zeros((1, 50)),
        method=syn.infer)
    phone = jnp.asarray(rng.standard_normal((1, p_len, 768)), dtype)
    pitch = jnp.asarray(rng.integers(1, 255, (1, p_len)), jnp.int32)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, p_len)), dtype)

    syn_fn = jax.jit(lambda v, ph, pi, pf, k: syn.apply(
        v, ph, jnp.asarray([p_len]), jnp.asarray([0]), pi, pf,
        rngs={"noise": k}, method=syn.infer))
    t_syn = timeit(lambda: syn_fn(sv, phone, pitch, pitchf,
                                  jax.random.PRNGKey(9)))

    tot = t_hub + t_f0 + t_syn
    print(f"{dur_s:.0f}s utterance ({p_len} frames), separate dispatches:")
    for name, t in (("hubert", t_hub), ("rmvpe_f0", t_f0),
                    ("synth", t_syn)):
        print(f"  {name:9s} {t * 1000:7.1f} ms  ({100 * t / tot:4.1f}%)")
    print(f"  sum       {tot * 1000:7.1f} ms  (fused single-dispatch "
          f"conversion is faster: shared upload + one sync)")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)

#!/usr/bin/env python
"""A/B of the whole-stage Pallas kernel inside the FULL decoder graph,
amplified-in-scan (tunnel-noise-immune).  Builds the v2/48k decoder with
PALLAS_STAGE_CHANNELS toggled per variant in one process.

Usage: python benchmarks/stage_ab.py [seconds] [repeats]
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tpu_rvc.core.config import hparams_for
from tpu_rvc.models.synthesizer import make_synthesizer, Synthesizer
from tpu_rvc.nn import modules as mods


def timeit(jfn, *args, n=5):
    np.asarray(jfn(*args))
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jfn(*args))
        walls.append(time.time() - t0)
    return statistics.median(walls), min(walls)


def main(dur_s: float, R: int):
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    hp = hparams_for("v2", 48000)
    rng = np.random.default_rng(0)
    T = int(dur_s * 100)

    syn = make_synthesizer(hp, weight_norm=False, use_f0=True)
    sv = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 50, 768)), jnp.asarray([50]), jnp.asarray([0]),
        jnp.zeros((1, 50), jnp.int32), jnp.zeros((1, 50)),
        method=Synthesizer.infer)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, T)), dtype)
    sid = jnp.asarray([0])
    z = jnp.asarray(rng.standard_normal((1, T, hp.model.inter_channels)),
                    dtype)
    key = jax.random.PRNGKey(7)

    floor, _ = timeit(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))), z)
    print(f"floor: {floor*1e3:.1f} ms", flush=True)

    def build(stage_channels, tile, scratch_ks=None):
        import os
        os.environ["PALLAS_STAGE_TILE"] = str(tile)
        if scratch_ks is not None:
            import tpu_rvc.ops.pallas.resblock as rk
            import functools as ft
            orig = rk.fused_stage
            def patched(*a, **k):
                k.setdefault("scratch_ks", scratch_ks)
                return orig(*a, **k)
            rk.fused_stage = patched

        def dec_det(s, vars, z, pitchf):
            def tap(m, z, pitchf):
                return m.dec(z * s, pitchf, g=m._speaker(sid),
                             deterministic=True)
            o = syn.apply(vars, z, pitchf, method=tap)
            return jnp.sum(o.astype(jnp.float32))

        def rep(*args):
            def step(acc, i):
                return acc + dec_det(1 + 1e-6 * i, *args), None
            return jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(R, dtype=dtype))[0]

        jfn = jax.jit(rep)
        # trace with the toggle set (trace-time flag)
        prev = mods.PALLAS_STAGE_CHANNELS
        mods.PALLAS_STAGE_CHANNELS = frozenset(stage_channels)
        try:
            out = jfn.lower(sv, z, pitchf).compile()
        finally:
            mods.PALLAS_STAGE_CHANNELS = prev
        return out

    variants = [
        ("xla (no stage kernel)", (), 1024, None),
        ("C=128 tile=1024", (128,), 1024, None),
        ("C=128 tile=1536", (128,), 1536, None),
        ("C=128 t=1024 scr{3,7}", (128,), 1024, (3, 7)),
        ("C=128 t=1024 scr{}", (128,), 1024, ()),
        ("C=128,256 tile=1024", (128, 256), 1024, None),
    ]
    import tpu_rvc.ops.pallas.resblock as rk
    orig_fs = rk.fused_stage
    for name, chans, tile, scr in variants:
        rk.fused_stage = orig_fs
        try:
            jfn = build(chans, tile, scr)
            med, lo = timeit(jfn, sv, z, pitchf)
            print(f"  {name:24s} {(med - floor)/R*1e3:8.2f} ms/iter "
                  f"(min {(lo - floor)/R*1e3:.2f})", flush=True)
        except Exception as e:
            print(f"  {name:24s} FAILED: {str(e)[:160]}", flush=True)
    rk.fused_stage = orig_fs


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)

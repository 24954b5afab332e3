#!/usr/bin/env python
"""Module-level split of the v2/48k synthesizer's inference cost.

Times (amplified xR inside one jit, floor-subtracted — see
synth_stages.py): full infer, enc_p+flow reverse, the NSF decoder, its
deterministic variant (no RNG), and the standalone NSF source math.

Usage: python benchmarks/synth_split.py [seconds] [repeats]
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
from tpu_rvc.nn.generators import f0_to_sine_phases
from tpu_rvc.ops.resample import nearest_upsample


def timeit(jfn, *args, n=5):
    np.asarray(jfn(*args))
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jfn(*args))
        walls.append(time.time() - t0)
    return statistics.median(walls)


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

    phone = jnp.asarray(rng.standard_normal((1, T, 768)), dtype)
    pitch = jnp.asarray(rng.integers(1, 255, (1, T)), jnp.int32)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, T)), dtype)
    lens = jnp.asarray([T])
    sid = jnp.asarray([0])
    z = jnp.asarray(rng.standard_normal((1, T, hp.model.inter_channels)),
                    dtype)

    floor = timeit(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))), phone)
    print(f"floor: {floor*1e3:.1f} ms", flush=True)

    def amp(body):
        def rep(*args):
            def step(acc, i):
                return acc + body(1 + 1e-6 * i, *args), None
            return jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(R, dtype=dtype))[0]
        return jax.jit(rep)

    def full(s, vars, phone, pitch, pitchf, key):
        o = syn.apply(vars, phone * s, lens, sid, pitch, pitchf,
                      rngs={"noise": key}, method=syn.infer)
        return jnp.sum(o.astype(jnp.float32))

    def encflow(s, vars, phone, pitch, key):
        def tap(m, phone, pitch):
            g = m._speaker(sid)
            m_p, logs_p, x_mask = m.enc_p(phone, pitch, lens)
            eps = jax.random.normal(key, m_p.shape, m_p.dtype)
            z_p = (m_p + jnp.exp(logs_p) * eps * 0.66666) * x_mask
            return m.flow(z_p, x_mask, g=g, reverse=True)
        o = syn.apply(vars, phone * s, pitch, method=tap)
        return jnp.sum(o.astype(jnp.float32))

    def dec_only(s, vars, z, pitchf, key):
        def tap(m, z, pitchf):
            return m.dec(z * s, pitchf, g=m._speaker(sid))
        o = syn.apply(vars, z, pitchf, rngs={"noise": key}, method=tap)
        return jnp.sum(o.astype(jnp.float32))

    def dec_det(s, vars, z, pitchf):
        def tap(m, z, pitchf):
            return m.dec(z * s, pitchf, g=m._speaker(sid),
                         deterministic=True)
        o = syn.apply(vars, z, pitchf, method=tap)
        return jnp.sum(o.astype(jnp.float32))

    def source_math(s, pitchf, key):
        ph = f0_to_sine_phases(pitchf * s, 480, 48000, 1, None)
        sines = jnp.sin(2 * jnp.pi * ph) * 0.1
        uv = (pitchf > 0).astype(pitchf.dtype)[:, :, None]
        uv = nearest_upsample(uv.swapaxes(1, 2), 480).swapaxes(1, 2)
        amp_ = uv * 0.003 + (1 - uv) * 0.1 / 3
        noise = amp_ * jax.random.normal(key, sines.shape, sines.dtype)
        return jnp.sum((sines * uv + noise).astype(jnp.float32))

    key = jax.random.PRNGKey(7)
    items = [
        ("full infer", amp(full), (sv, phone, pitch, pitchf, key)),
        ("enc_p + flow reverse", amp(encflow), (sv, phone, pitch, key)),
        ("NSF decoder (z->wave)", amp(dec_only), (sv, z, pitchf, key)),
        ("NSF decoder deterministic", amp(dec_det), (sv, z, pitchf)),
        ("sine source math only", amp(source_math), (pitchf, key)),
    ]
    for name, jfn, args in items:
        t = (timeit(jfn, *args) - floor) / R
        print(f"  {name:28s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)

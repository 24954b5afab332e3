#!/usr/bin/env python
"""Amplified GAN train-step throughput on the attached chip.

The full v2/48k training step (G fwd at bucket length, D update, G update
vs the updated D — train/step.py) scanned R times inside ONE jit dispatch,
so the measurement is on-device steady state, immune to the ~30 ms tunnel
RTT (see benchmarks/README.md).

Reference role: infer/modules/train/train.py:399-663 per-step loop (the
reference publishes no training throughput numbers; this records ours).

Usage: python benchmarks/train_throughput.py [batch] [frames] [repeats]
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tpu_rvc.core.config import hparams_for
from tpu_rvc.train.step import create_train_state, make_train_step


def main(B: int, T: int, R: int):
    hp = hparams_for("v2", 48000)
    platform = jax.devices()[0].platform
    print(f"platform={platform} B={B} T={T} frames "
          f"({T * hp.data.hop_length / hp.data.sampling_rate:.1f}s each) "
          f"R={R}", flush=True)

    state, net_g, net_d = create_train_state(hp, jax.random.PRNGKey(0))
    step = make_train_step(net_g, net_d, hp, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "phone": jnp.asarray(
            rng.standard_normal((B, T, hp.encoder_dim)), jnp.float32),
        "phone_lengths": jnp.full((B,), T, jnp.int32),
        "pitch": jnp.asarray(rng.integers(1, 255, (B, T)), jnp.int32),
        "pitchf": jnp.asarray(rng.uniform(100, 300, (B, T)), jnp.float32),
        "spec": jnp.asarray(rng.standard_normal(
            (B, T, hp.data.spec_channels)) ** 2 * 0.1, jnp.float32),
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "wave": jnp.asarray(rng.standard_normal(
            (B, T * hp.data.hop_length, 1)) * 0.1, jnp.float32),
        "sid": jnp.zeros((B,), jnp.int32),
    }

    def many(state, batch, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = step(st, batch, sub)
            return (st, k), metrics["loss_gen_all"]
        (state, _), losses = jax.lax.scan(
            body, (state, key), jnp.arange(R))
        return state, losses

    jfn = jax.jit(many)
    t0 = time.time()
    st2, losses = jfn(state, batch, jax.random.PRNGKey(1))
    l0 = np.asarray(losses)
    print(f"compile+first: {time.time() - t0:.1f}s  "
          f"losses[0]={l0[0]:.2f} [-1]={l0[-1]:.2f} finite={np.isfinite(l0).all()}",
          flush=True)

    walls = []
    for _ in range(5):
        t0 = time.time()
        st2, losses = jfn(state, batch, jax.random.PRNGKey(2))
        np.asarray(losses)  # fetch-sync (block_until_ready unreliable here)
        walls.append(time.time() - t0)
    med = statistics.median(walls)
    per_step = med / R
    utt_s = B * T * hp.data.hop_length / hp.data.sampling_rate
    print(f"per-step: {per_step * 1e3:.1f} ms median "
          f"(min {min(walls) / R * 1e3:.1f})  "
          f"= {1 / per_step:.2f} steps/s  "
          f"= {utt_s / per_step:.1f} utterance-seconds trained per second",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 400,
         int(sys.argv[3]) if len(sys.argv) > 3 else 8)

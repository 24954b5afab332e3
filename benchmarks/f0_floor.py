#!/usr/bin/env python
"""RMVPE f0-stage floor analysis + measurement reconciliation.

Round-3 left two irreconciled numbers for the same stage: 13.6 ms
("amplified on-chip", docs/en/performance.md) vs 45.2 ms ("amortized",
BENCH_BREAKDOWN.json).  This harness measures BOTH METHODS in ONE session
on the SAME graphs, plus a sub-stage split of the full device-side chain
(reference stack: rvc/f0/rmvpe.py:96 compute_f0 -> e2e.py:44 E2E ->
rmvpe.py:119 decode), so the two columns are directly comparable:

  - amplified-in-scan: R reps inside one jitted lax.scan (data-dependent
    perturbation defeats CSE), minus the dispatch+sync floor, /R.  This is
    pure on-chip compute.
  - amortized: 8 back-to-back async dispatches, one fetch of the last,
    wall/8 — on-chip compute + per-dispatch host/tunnel issue overhead.
    This is what BENCH_BREAKDOWN.json records.

Also A/Bs the GRU recurrence's lax.scan unroll factor (the only
sequential op in the whole inference path) at the real 10 s shapes.

Writes F0_FLOOR.json.  Usage: python benchmarks/f0_floor.py [secs] [reps]
"""

import json
import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import tpu_rvc.models.rmvpe as rmvpe_mod
from tpu_rvc.models.rmvpe import E2E, DeepUnet, BiGRU, N_MELS
from tpu_rvc.f0.rmvpe import rmvpe_mel
from tpu_rvc.f0.device import (rmvpe_f0_device, to_local_average_cents_jax,
                               resize_f0_jax, interpolate_f0_jax,
                               post_process_jax)

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "F0_FLOOR.json")


def fetch_timed(fn, n=5):
    """Median fetch-inclusive wall of an already-compiled thunk."""
    np.asarray(fn())  # compile/warm
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn())
        walls.append(time.time() - t0)
    return statistics.median(walls), min(walls)


def amortized(fn, reps=8):
    """bench.py's amortized column: reps async dispatches, one fetch."""
    np.asarray(fn())
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    np.asarray(outs[-1])
    return (time.time() - t0) / reps


def amplified(make_body, R, floor_s, *ops):
    """R reps of make_body inside one jitted scan; subtract floor, /R.
    make_body(i, *ops) must return a scalar-reducible array and DEPEND
    on i.  Weights/inputs MUST flow through *ops: anything closed over
    becomes a graph constant shipped in the remote-compile payload, and
    weight-tree-sized constants blow the axon service's HTTP body limit
    (CLAUDE.md gotcha; observed as HTTP 413)."""

    def rep(*ops):
        def body(acc, i):
            y = make_body(i, *ops)
            return acc + jnp.sum(y.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(R, dtype=jnp.float32))[0]

    jfn = jax.jit(rep)
    t, _ = fetch_timed(lambda: jfn(*ops))
    return max(t - floor_s, 0.0) / R


def main(dur_s: float, R: int):
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    L16 = int(16000 * dur_s)
    p_len = L16 // 160
    report = {"platform": jax.devices()[0].platform,
              "utterance_s": dur_s, "amplify_reps": R,
              "gru_unroll_default": rmvpe_mod.GRU_SCAN_UNROLL}

    wav32 = jnp.asarray(rng.standard_normal(L16) * 0.1, jnp.float32)
    np.asarray(wav32)  # force upload now

    e2e = E2E()
    rv = e2e.init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 32)))

    # shapes of the real chain
    mel = rmvpe_mel(wav32[None])
    n_frames = int(mel.shape[-1])
    Tp = 32 * ((n_frames - 1) // 32 + 1)
    melp = jnp.asarray(np.asarray(
        jnp.pad(mel, ((0, 0), (0, 0), (0, Tp - n_frames)))), dtype)
    np.asarray(melp)

    # dispatch floor
    floor, _ = fetch_timed(jax.jit(
        lambda x=wav32: jnp.sum(x.astype(jnp.float32))))
    report["dispatch_sync_floor_ms"] = round(floor * 1e3, 1)
    print(f"dispatch+sync floor: {floor * 1e3:.1f} ms", flush=True)

    # ---- sub-stages, amplified-in-scan --------------------------------
    sub = {}

    sub["mel_frontend"] = amplified(
        lambda i, w: rmvpe_mel(w[None] * (1 + 1e-6 * i)), R, floor, wav32)

    unet = DeepUnet()
    uv = {"params": rv["params"]["unet"]}
    x_unet = jnp.swapaxes(melp, 1, 2)[..., None]  # (1, Tp, 128, 1)
    sub["unet"] = amplified(
        lambda i, v, x: unet.apply(v, x * (1 + 1e-6 * i)), R, floor,
        uv, x_unet)

    gru = BiGRU(3 * N_MELS, 256)
    gv = {"params": rv["params"]["gru"]}
    x_gru = jnp.asarray(
        rng.standard_normal((1, Tp, 3 * N_MELS)) * 0.1, dtype)
    np.asarray(x_gru)
    sub["bigru"] = amplified(
        lambda i, v, x: gru.apply(v, x * (1 + 1e-6 * i)), R, floor,
        gv, x_gru)

    sal = jnp.asarray(rng.random((Tp, 360)), jnp.float32)
    np.asarray(sal)

    def decode_tail(s):
        cents = to_local_average_cents_jax(s[:n_frames], 0.03)
        f0 = 10.0 * (2.0 ** (cents / 1200.0))
        f0 = jnp.where(f0 == 10.0, 0.0, f0)
        f0 = resize_f0_jax(f0, p_len)
        f0 = interpolate_f0_jax(f0)
        return post_process_jax(f0, 0.0)[1]

    sub["decode_tail"] = amplified(
        lambda i, s_: decode_tail(s_ * (1 + 1e-6 * i)), R, floor, sal)

    full_fn = jax.jit(lambda v, w: rmvpe_f0_device(
        w, p_len, 0.0, e2e, v, dtype=dtype)[1])
    sub["full_chain"] = amplified(
        lambda i, v, w: full_fn(v, w * (1 + 1e-6 * i)), max(R // 2, 4),
        floor, rv, wav32)

    report["amplified_ms"] = {k: round(v * 1e3, 2) for k, v in sub.items()}
    for k, v in report["amplified_ms"].items():
        print(f"  amplified {k:13s} {v:7.2f} ms", flush=True)

    # ---- full chain: the two disputed methods side by side -------------
    disp_med, disp_min = fetch_timed(lambda: full_fn(rv, wav32))
    report["full_dispatch_inclusive_ms"] = {
        "median": round(disp_med * 1e3, 1), "min": round(disp_min * 1e3, 1)}
    report["full_amortized_ms"] = round(amortized(
        lambda: full_fn(rv, wav32)) * 1e3, 1)
    print(f"  full chain: amplified {report['amplified_ms']['full_chain']} "
          f"ms | amortized {report['full_amortized_ms']} ms | "
          f"dispatch-inclusive {report['full_dispatch_inclusive_ms']}",
          flush=True)

    # ---- GRU unroll A/B at real shapes ---------------------------------
    ab = {}
    for unroll in (1, 4, 8, 16, 32):
        rmvpe_mod.GRU_SCAN_UNROLL = unroll
        t = amplified(
            lambda i, v, x: gru.apply(v, x * (1 + 1e-6 * i)), R, floor,
            gv, x_gru)
        ab[str(unroll)] = round(t * 1e3, 2)
        print(f"  bigru unroll={unroll:2d}: {t * 1e3:7.2f} ms", flush=True)
    report["bigru_unroll_ab_ms"] = ab
    rmvpe_mod.GRU_SCAN_UNROLL = report["gru_unroll_default"]

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 16)

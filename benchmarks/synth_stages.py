#!/usr/bin/env python
"""Per-stage microbenchmark of the v2/48k NSF-HiFiGAN decoder shapes.

Each stage runs as its own jitted program returning a scalar checksum
(8-byte fetch — timing is compute + dispatch, no payload transfer; see
CLAUDE.md on the remote-attached backend).  Identifies which decoder
stage eats the synthesizer's time budget.

Usage: python benchmarks/synth_stages.py [seconds_of_audio]  (default 10)
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tpu_rvc.ops.conv import conv1d, conv1d_im2col, conv_transpose1d_poly
from tpu_rvc.nn.modules import LRELU_SLOPE


def timeit(fn, *args, n=7):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))  # compile
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jfn(*args))
        walls.append(time.time() - t0)
    return statistics.median(walls)


def resblock(x, ws, bs, k, dilations):
    # ResBlock1: for d in dilations: x += c2(lrelu(c1_d(lrelu(x))))
    for i, d in enumerate(dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = conv1d_im2col(xt, ws[2 * i], bs[2 * i],
                           padding=(k - 1) // 2 * d, dilation=d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d_im2col(xt, ws[2 * i + 1], bs[2 * i + 1],
                           padding=(k - 1) // 2)
        x = x + xt
    return x


def main(dur_s: float):
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    rng = np.random.default_rng(0)
    frames = int(dur_s * 100)  # 48k, hop 480
    ups = [(frames, 512, 256, 24, 12), (frames * 12, 256, 128, 20, 10),
           (frames * 120, 128, 64, 4, 2), (frames * 240, 64, 32, 4, 2)]
    rows = []

    for T, cin, cout, k, u in ups:
        x = jnp.asarray(rng.standard_normal((1, T, cin)) * 0.1, dtype)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.02, dtype)
        b = jnp.zeros((cout,), dtype)
        t = timeit(lambda x, w, b: jnp.sum(
            conv_transpose1d_poly(x, w, b, stride=u,
                                  padding=(k - u) // 2).astype(jnp.float32)),
            x, w, b)
        fl = 2 * T * u * cin * cout * -(-k // u)
        rows.append((f"convT {T}x{cin}->{cout} k{k} s{u}", t, fl))

    for T, cin, cout, k, u in ups:
        To = T * u
        for kk in (3, 7, 11):
            ws = tuple(jnp.asarray(rng.standard_normal((kk, cout, cout)) * .02,
                                   dtype) for _ in range(6))
            bs = tuple(jnp.zeros((cout,), dtype) for _ in range(6))
            x = jnp.asarray(rng.standard_normal((1, To, cout)) * 0.1, dtype)
            t = timeit(lambda x, ws, bs: jnp.sum(
                resblock(x, ws, bs, kk, (1, 3, 5)).astype(jnp.float32)),
                x, ws, bs)
            fl = 6 * 2 * To * kk * cout * cout
            rows.append((f"resblock k{kk} {To}x{cout}", t, fl))

    tot = sum(t for _, t, _ in rows)
    print(f"{dur_s:.0f}s of 48k audio ({frames} frames):")
    for name, t, fl in rows:
        print(f"  {name:32s} {t * 1e3:7.2f} ms  "
              f"{fl / t / 1e12:6.2f} TF/s  ({100 * t / tot:4.1f}%)")
    print(f"  {'TOTAL (decoder conv work)':32s} {tot * 1e3:7.2f} ms")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)

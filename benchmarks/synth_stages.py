#!/usr/bin/env python
"""Per-stage microbenchmark of the v2/48k NSF-HiFiGAN decoder shapes.

The remote-attached backend has a ~30 ms per-dispatch RTT floor, so a
single op is unmeasurable.  Each stage therefore runs R times inside ONE
jitted lax.scan (data-dependent carry, no CSE) and the floor (timed with
an empty-ish program) is subtracted:  t_op = (t - floor) / R.

Usage: python benchmarks/synth_stages.py [seconds] [repeats]
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


def timeit(jfn, *args, n=5):
    np.asarray(jfn(*args))  # compile
    walls = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jfn(*args))
        walls.append(time.time() - t0)
    return statistics.median(walls)


def resblock(x, ws, bs, k, dilations):
    for i, d in enumerate(dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = conv1d_im2col(xt, ws[2 * i], bs[2 * i],
                           padding=(k - 1) // 2 * d, dilation=d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d_im2col(xt, ws[2 * i + 1], bs[2 * i + 1],
                           padding=(k - 1) // 2)
        x = x + xt
    return x


def main(dur_s: float, R: int):
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    rng = np.random.default_rng(0)
    frames = int(dur_s * 100)  # 48k, hop 480
    ups = [(frames, 512, 256, 24, 12), (frames * 12, 256, 128, 20, 10),
           (frames * 120, 128, 64, 4, 2), (frames * 240, 64, 32, 4, 2)]

    xbig = jnp.asarray(rng.standard_normal((1, frames * 480, 8)) * .1, dtype)
    floor = timeit(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))), xbig)
    print(f"dispatch+sync floor: {floor * 1e3:.1f} ms", flush=True)
    rows = []

    for T, cin, cout, k, u in ups:
        x = jnp.asarray(rng.standard_normal((1, T, cin)) * 0.1, dtype)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.02, dtype)
        b = jnp.zeros((cout,), dtype)

        def rep(x, w, b):
            def body(acc, i):
                y = conv_transpose1d_poly(
                    x * (1 + 1e-6 * i), w, b, stride=u, padding=(k - u) // 2)
                return acc + jnp.sum(y.astype(jnp.float32)), None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(R, dtype=jnp.float32))[0]

        t = (timeit(jax.jit(rep), x, w, b) - floor) / R
        fl = 2 * T * u * cin * cout * -(-k // u)
        rows.append((f"convT {T}x{cin}->{cout} k{k} s{u}", t, fl))
        print(f"  {rows[-1][0]:32s} {t*1e3:7.2f} ms  {fl/t/1e12:6.2f} TF/s",
              flush=True)

    for T, cin, cout, k, u in ups:
        To = T * u
        for kk in (3, 7, 11):
            ws = tuple(jnp.asarray(rng.standard_normal((kk, cout, cout)) * .02,
                                   dtype) for _ in range(6))
            bs = tuple(jnp.zeros((cout,), dtype) for _ in range(6))
            x = jnp.asarray(rng.standard_normal((1, To, cout)) * 0.1, dtype)

            def rep(x, ws, bs):
                def body(c, _):
                    return resblock(c, ws, bs, kk, (1, 3, 5)), None
                return jnp.sum(jax.lax.scan(body, x, None, length=R)[0]
                               .astype(jnp.float32))

            t = (timeit(jax.jit(rep), x, ws, bs) - floor) / R
            fl = 6 * 2 * To * kk * cout * cout
            rows.append((f"resblock k{kk} {To}x{cout}", t, fl))
            print(f"  {rows[-1][0]:32s} {t*1e3:7.2f} ms  "
                  f"{fl/t/1e12:6.2f} TF/s", flush=True)

    tot = sum(t for _, t, _ in rows)
    fls = sum(f for _, _, f in rows)
    print(f"  {'TOTAL decoder conv work':32s} {tot * 1e3:7.2f} ms  "
          f"{fls/tot/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)

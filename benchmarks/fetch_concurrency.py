#!/usr/bin/env python
"""Probe: does the remote-attached TPU tunnel allow CONCURRENT
device->host fetches from multiple Python threads?

Motivation: the depth-3 pipelined conversion loop (bench.py) is
fetch-dominated — the 0.96 MB int16 output costs ~54-72 ms to fetch
while the on-chip compute for a 10 s utterance is ~67 ms amplified
(docs/en/performance.md). Every fetch currently happens serially on
the main thread. If N threads can overlap transfers (RTT and/or
bandwidth), the serving loop's steady state drops toward
max(on-chip, fetch/N).

Usage: python benchmarks/fetch_concurrency.py [n_bufs] [size_mb]
Prints serial vs threaded (2/4 workers) total wall for fetching
n_bufs fresh device buffers.
"""

import concurrent.futures as cf
import statistics
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n_bufs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 0.96
    n_elem = int(size_mb * 1e6 / 2)  # int16

    @jax.jit
    def make(i):
        # cheap on-chip op producing a fresh buffer each call so the
        # host cache can't serve the fetch
        return (jnp.arange(n_elem, dtype=jnp.int32) + i).astype(jnp.int16)

    # warm compile
    np.asarray(make(jnp.int32(0)))

    def fresh_bufs():
        bufs = [make(jnp.int32(i + 1000 * time.monotonic_ns() % 977))
                for i in range(n_bufs)]
        # ensure dispatch completes so we time ONLY the fetch: fetch a
        # tiny sentinel dependent on the last buffer
        np.asarray(bufs[-1][:1])
        return bufs

    results = {}
    for mode, workers in (("serial", 1), ("threads2", 2), ("threads4", 4)):
        walls = []
        for _ in range(3):
            bufs = fresh_bufs()
            t0 = time.time()
            if workers == 1:
                for b in bufs:
                    np.asarray(b)
            else:
                with cf.ThreadPoolExecutor(workers) as ex:
                    list(ex.map(np.asarray, bufs))
            walls.append(time.time() - t0)
        med = statistics.median(walls)
        results[mode] = med
        print(f"{mode:9s}: {med*1000:7.1f} ms total for {n_bufs} x "
              f"{size_mb:.2f} MB  ({med*1000/n_bufs:6.1f} ms/buf)  "
              f"walls={[round(w*1000) for w in walls]}")

    speedup = results["serial"] / min(results["threads2"],
                                      results["threads4"])
    print(f"best threaded speedup: {speedup:.2f}x "
          f"({'CONCURRENT fetches help' if speedup > 1.25 else 'no real concurrency'})")


if __name__ == "__main__":
    main()

"""Benchmark: single-stream 48 kHz conversion RTF on one chip.

Runs the full-quality offline path (BASELINE.md config 2): 10 s of
16 kHz input -> HuBERT-base (v2, 768-d) -> exact top-8 retrieval over a
10k x 768 HBM index -> device-resident RMVPE f0 (DeepUnet + BiGRU +
local-average-cents decode, fused into the same dispatch) -> v2/48k
synthesizer (enc_p + reverse flow + NSF-HiFiGAN) -> 48 kHz audio.

Weights are randomly initialized (no pretrained assets in this environment);
FLOPs and memory traffic are identical to trained weights, so RTF is
representative.  Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "x_realtime", "vs_baseline": RTF/50}
(the driver-set baseline target is >=50x realtime per chip, BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu_rvc.core.config import hparams_for
    from tpu_rvc.models.synthesizer import make_synthesizer
    from tpu_rvc.models.hubert import hubert_for_version
    from tpu_rvc.pipeline.vc import Pipeline
    from tpu_rvc.retrieval.index import build_index

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    hp = hparams_for("v2", 48000)
    rng = jax.random.PRNGKey(0)

    print(f"[bench] platform={platform} dtype={dtype.__name__}",
          file=sys.stderr)

    hub = hubert_for_version("v2")
    hub_vars = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = make_synthesizer(hp, weight_norm=False, use_f0=True)
    T0 = 50
    syn_vars = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T0, 768)), jnp.asarray([T0]), jnp.asarray([0]),
        jnp.zeros((1, T0), jnp.int32), jnp.zeros((1, T0)),
        method=syn.infer)

    pipe = Pipeline(48000, hubert=hub, hubert_vars=hub_vars,
                    synth=syn, synth_vars=syn_vars, version="v2",
                    dtype=dtype)

    # device-resident RMVPE (BASELINE config 2's f0 method); random-init
    # weights are FLOP- and traffic-identical to the published rmvpe.pt
    from tpu_rvc.f0.rmvpe import RMVPE
    from tpu_rvc.models.rmvpe import E2E
    rmvpe_vars = E2E().init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 32)))
    pipe.f0_gen._estimators["rmvpe"] = RMVPE(variables=rmvpe_vars,
                                             dtype=dtype)

    # 10k x 768 retrieval index (the post-kmeans size for big datasets)
    np_rng = np.random.default_rng(0)
    index = build_index(np_rng.standard_normal((10_000, 768)).astype(np.float32))

    dur_s = 10.0
    sr = 16000
    t = np.arange(int(sr * dur_s)) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t) *
             (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    def convert(fetch=True):
        times = [0.0, 0.0, 0.0]
        return pipe.pipeline(0, audio, times, 0, "rmvpe", index, 0.75, 1, 3,
                             0, 0.25, 0.33, fetch=fetch)

    # warmup/compile
    t0 = time.time()
    out = convert()
    print(f"[bench] compile+first run: {time.time() - t0:.1f}s, "
          f"out={len(out)} samples @48k", file=sys.stderr)

    # steady-state throughput with depth-1 pipelining: utterance i+1's
    # graph is dispatched before fetching utterance i (the metric is
    # audio-seconds per second per chip)
    n_iter = 14
    times = []
    prev = None
    for _ in range(n_iter):
        t0 = time.time()
        y = convert(fetch=False)
        if prev is not None:
            np.asarray(prev)  # fetch previous result, overlapped
        prev = y
        times.append(time.time() - t0)
    np.asarray(prev)
    import statistics
    elapsed = statistics.median(times[1:])
    rtf = dur_s / elapsed
    print(f"[bench] pipelined median {elapsed * 1000:.1f} ms per 10 s "
          f"utterance (min {min(times[1:])*1000:.0f}, "
          f"max {max(times[1:])*1000:.0f})", file=sys.stderr)

    # ---- per-stage breakdown artifact (BENCH_BREAKDOWN.json) ----
    # Separate-dispatch stage timings so round-over-round regressions are
    # attributable (tunnel RTT swings the headline RTF 66-89x between
    # sessions; the min wall and the stage split are the stable signals).
    try:
        breakdown = _stage_breakdown(pipe, audio, dur_s, prev)
        breakdown.update({
            "platform": platform,
            "pipelined_ms_median": round(elapsed * 1000, 1),
            "pipelined_ms_min": round(min(times[1:]) * 1000, 1),
            "pipelined_ms_all": [round(x * 1000, 1) for x in times],
            "rtf": round(rtf, 2),
        })
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_BREAKDOWN.json")
        with open(path, "w") as f:
            json.dump(breakdown, f, indent=2)
        print(f"[bench] stage split (ms): "
              + ", ".join(f"{k}={v}" for k, v in
                          breakdown["stages_ms"].items()), file=sys.stderr)
    except Exception as e:  # never let the artifact break the headline
        print(f"[bench] breakdown failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "48kHz_conversion_RTF_full_quality_single_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


def _stage_breakdown(pipe, audio, dur_s, out_dev, n=5):
    """Median fetch-inclusive wall per stage, separate dispatches
    (fetch is the only reliable sync on this backend, CLAUDE.md)."""
    import statistics
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpu_rvc.f0.device import rmvpe_f0_device

    def timeit(fn):
        fn()  # compile / warm
        walls = []
        for i in range(n):
            t0 = time.time()
            np.asarray(fn())
            walls.append(time.time() - t0)
        return round(statistics.median(walls) * 1000, 1)

    dtype = pipe.dtype
    L16 = len(audio)
    p_len = L16 // 160
    wav = jnp.asarray(audio[None], dtype)
    hub_fn = jax.jit(lambda v, w: pipe.hubert.apply(v, w))
    t_hub = timeit(lambda: hub_fn(pipe.hubert_vars, wav))

    est = pipe.f0_gen._estimators["rmvpe"]
    f0_fn = jax.jit(lambda v, w: rmvpe_f0_device(
        w, p_len, 0.0, est.model, v, dtype=dtype)[1])
    t_f0 = timeit(lambda: f0_fn(est.variables,
                                jnp.asarray(audio, jnp.float32)))

    rng = np.random.default_rng(1)
    phone = jnp.asarray(rng.standard_normal((1, p_len, 768)), dtype)
    pitch = jnp.asarray(rng.integers(1, 255, (1, p_len)), jnp.int32)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, p_len)), dtype)
    syn_fn = jax.jit(lambda v, ph, pi, pf, k: pipe.synth.apply(
        v, ph, jnp.asarray([p_len]), jnp.asarray([0]), pi, pf,
        rngs={"noise": k}, method=pipe.synth.infer))
    t_syn = timeit(lambda: syn_fn(pipe.synth_vars, phone, pitch, pitchf,
                                  jax.random.PRNGKey(9)))

    # D2H of the int16 output: each iteration fetches a FRESH device
    # buffer (np.asarray of an already-fetched array returns the cached
    # host copy in 0 ms)
    d2h = []
    for i in range(n):
        y = jnp.asarray(out_dev) + np.int16(i)  # fresh buffer, cheap op
        t0 = time.time()
        np.asarray(y)
        d2h.append(time.time() - t0)
    t_d2h = round(statistics.median(d2h) * 1000, 1)

    return {"utterance_s": dur_s,
            "stages_ms": {"hubert": t_hub, "rmvpe_f0": t_f0,
                          "synth": t_syn, "d2h_int16": t_d2h},
            "note": "separate dispatches, fetch-inclusive medians of "
                    f"{n}; the fused pipeline overlaps these"}


if __name__ == "__main__":
    main()

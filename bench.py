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
    n_iter = 8
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

    print(json.dumps({
        "metric": "48kHz_conversion_RTF_full_quality_single_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Full-pipeline, FULL-SIZE oracle MCD: the strongest offline stand-in for
published-weight validation (the asset mirror is unreachable — see
ASSETS_r03.json).

A seeded FULL-SIZE v2/48k stack (HuBERT-base 12-layer/768-d + the complete
v2/48k synthesizer, ~72M params inference subset) is built ONCE in torch,
then:
  reference path: /root/reference Pipeline.pipeline end-to-end
    (infer/modules/vc/pipeline.py:186 — filtfilt high-pass, reflect pads,
    HuBERT extract, 2x upsample, protect mask, net_g.infer per chunk, RMS
    mix, int16 scaling) on CPU torch;
  tpu_rvc path:  the same weights converted through ckpt.convert /
    ckpt.hubert_loader, the same speech-like fixture through
    pipeline.vc.Pipeline (the fused single-dispatch graph).

Identical inputs: a formant-rich synthetic speech fixture, one shared f0
track (our native dio) fed to both sides via the precomputed-f0 contract
(if_f0=2, reference pipeline.py:268), retrieval off, and all prior noise
zeroed (torch.randn_like monkeypatched; noise_scale=0 on ours).  The
BASELINE acceptance metric is MCD <= 0.1 dB; the result is written to
MCD_r03.json.

Usage: python benchmarks/mcd_oracle.py [--small] [--out PATH]
  --small shrinks the model for a fast CI-style run (same code path).
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REF = "/root/reference"

SMALL = "--small" in sys.argv
OUT = (sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv
       else os.path.join(REPO, "MCD_r03.json"))


def _stub_modules():
    """Stub numba/librosa/faiss so the reference pipeline imports.
    librosa.feature.rms delegates to our librosa-equivalent rms_envelope
    (itself parity-tested in test_pipeline)."""
    import importlib.machinery
    import numpy as np
    from tpu_rvc.audio.dsp import rms_envelope

    def _spec(mod):
        # transformers probes importlib.util.find_spec(name): a stub with
        # __spec__=None raises ValueError there
        mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
        return mod

    if "numba" not in sys.modules:
        numba = _spec(types.ModuleType("numba"))
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    if "librosa" not in sys.modules:
        lib = _spec(types.ModuleType("librosa"))
        feat = _spec(types.ModuleType("librosa.feature"))

        def _rms(*, y, frame_length, hop_length):
            return rms_envelope(np.asarray(y, np.float32), frame_length,
                                hop_length)[None]

        feat.rms = _rms
        lib.feature = feat
        sys.modules["librosa"] = lib
        sys.modules["librosa.feature"] = feat
    if "faiss" not in sys.modules:
        sys.modules["faiss"] = _spec(types.ModuleType("faiss"))
    if "pybase16384" not in sys.modules:
        from tpu_rvc.utils.base16384 import (encode_to_string,
                                             decode_from_string)
        b16 = _spec(types.ModuleType("pybase16384"))
        b16.encode_to_string = encode_to_string
        b16.decode_from_string = decode_from_string
        sys.modules["pybase16384"] = b16
    if "fairseq" not in sys.modules:
        # vc.utils imports fairseq for its hubert loader; the oracle
        # injects a transformers-backed adapter instead
        fs = _spec(types.ModuleType("fairseq"))
        fs.checkpoint_utils = types.SimpleNamespace()
        fs.data = types.SimpleNamespace()
        sys.modules["fairseq"] = fs
    if "av" not in sys.modules:
        # infer.modules.vc.__init__ pulls modules.py -> infer.lib.audio,
        # which imports PyAV at module level; only Pipeline is used here
        av = _spec(types.ModuleType("av"))
        av_audio = _spec(types.ModuleType("av.audio"))
        av_res = _spec(types.ModuleType("av.audio.resampler"))
        av_frame = _spec(types.ModuleType("av.audio.frame"))
        av_res.AudioResampler = type("AudioResampler", (), {})
        av_frame.AudioFrame = type("AudioFrame", (), {})
        av.audio = av_audio
        av_audio.resampler = av_res
        av_audio.frame = av_frame
        for name, mod in (("av", av), ("av.audio", av_audio),
                          ("av.audio.resampler", av_res),
                          ("av.audio.frame", av_frame)):
            sys.modules[name] = mod


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # bit-exact vs torch CPU
    import numpy as np
    import jax.numpy as jnp

    _stub_modules()
    sys.path.insert(0, REF)
    os.environ.setdefault("rmvpe_root", "/tmp")  # lazy, never loaded here
    os.chdir(REF)  # reference i18n/config use cwd-relative paths (read-only)
    import torch
    from transformers import HubertConfig, HubertModel
    from rvc.layers.synthesizers import SynthesizerTrnMsNSFsid as RefSynth
    from infer.modules.vc.pipeline import Pipeline as RefPipeline

    from test_f0 import _speech_like
    from tpu_rvc.core.config import hparams_for
    from tpu_rvc.models.synthesizer import make_synthesizer
    from tpu_rvc.models.hubert import Hubert
    from tpu_rvc.ckpt.convert import synthesizer_params_from_state_dict
    from tpu_rvc.ckpt.hubert_loader import hubert_params_from_transformers
    from tpu_rvc.pipeline.vc import Pipeline
    from tpu_rvc.f0.dio import Dio
    from tpu_rvc.f0.base import post_process
    from tpu_rvc.utils.mcd import mcd

    t_start = time.time()
    report = {"mode": "small" if SMALL else "full_size",
              "config": "v2/48k seeded-oracle weights",
              "fixture": "formant-rich synthetic speech (test_f0 generator)"}

    # ---- shared seeded torch models ----------------------------------
    hp = hparams_for("v2", 48000)
    if SMALL:
        import dataclasses
        hp = dataclasses.replace(hp, model=dataclasses.replace(
            hp.model, inter_channels=32, hidden_channels=32,
            filter_channels=64, n_heads=2, n_layers=1,
            upsample_initial_channel=64))
    m, d = hp.model, hp.data
    torch.manual_seed(20240817)
    ref_g = RefSynth(
        d.spec_channels, hp.train.segment_size // d.hop_length,
        m.inter_channels, m.hidden_channels, m.filter_channels, m.n_heads,
        m.n_layers, m.kernel_size, 0.0, m.resblock,
        list(m.resblock_kernel_sizes),
        [list(x) for x in m.resblock_dilation_sizes],
        list(m.upsample_rates), m.upsample_initial_channel,
        list(m.upsample_kernel_sizes), m.spk_embed_dim, m.gin_channels,
        d.sampling_rate, 768, True).eval()
    n_params = sum(p.numel() for p in ref_g.parameters())
    report["synth_params_M"] = round(n_params / 1e6, 1)

    if SMALL:
        hub_cfg = HubertConfig(
            hidden_size=768, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=256, conv_dim=(64, 64, 64),
            conv_stride=(5, 8, 8), conv_kernel=(10, 8, 8), conv_bias=False,
            feat_extract_norm="group", do_stable_layer_norm=False,
            feat_proj_layer_norm=True, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=2, hidden_dropout=0.0,
            attention_dropout=0.0, feat_proj_dropout=0.0,
            activation_dropout=0.0, layerdrop=0.0)
        ours_hub = Hubert(output_layer=2, final_proj=False, embed=768,
                          ffn_dim=256, n_heads=2, pos_conv_k=16,
                          pos_conv_groups=2,
                          conv_layers=((64, 10, 5), (64, 8, 8), (64, 8, 8)))
        n_hub_layers = 2
    else:
        # the real hubert_base architecture (12 layers, 768-d, 7-conv
        # extractor — rvc/hubert.py:265 role)
        hub_cfg = HubertConfig(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, conv_dim=(512,) * 7,
            conv_stride=(5, 2, 2, 2, 2, 2, 2),
            conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_bias=False,
            feat_extract_norm="group", do_stable_layer_norm=False,
            feat_proj_layer_norm=True, num_conv_pos_embeddings=128,
            num_conv_pos_embedding_groups=16, hidden_dropout=0.0,
            attention_dropout=0.0, feat_proj_dropout=0.0,
            activation_dropout=0.0, layerdrop=0.0)
        ours_hub = Hubert(output_layer=12, final_proj=False)
        n_hub_layers = 12
    torch.manual_seed(11)
    ref_hub = HubertModel(hub_cfg).eval()
    report["hubert_params_M"] = round(
        sum(p.numel() for p in ref_hub.parameters()) / 1e6, 1)

    class FairseqAdapter:
        """Presents the fairseq interface Pipeline.vc expects
        (pipeline.py:102-110)."""

        def __init__(self, hm):
            self.hm = hm

        def extract_features(self, source, padding_mask, output_layer):
            return (self.hm(source).last_hidden_state,)

    # ---- weight conversion (torch -> flax) ----------------------------
    g_sd = {k: v.detach().numpy().copy()
            for k, v in ref_g.state_dict().items()}
    g_params = synthesizer_params_from_state_dict(
        g_sd, n_layers=m.n_layers, n_ups=len(m.upsample_rates),
        num_kernels=len(m.resblock_kernel_sizes), use_f0=True,
        has_enc_q=True, fold_weight_norm=True, strict=True)
    hub_sd = {k: v.detach().numpy().copy()
              for k, v in ref_hub.state_dict().items()}
    hub_params = hubert_params_from_transformers(hub_sd,
                                                 output_layer=n_hub_layers)

    syn = make_synthesizer(hp, weight_norm=False, use_f0=True)

    # ---- fixture + shared f0 track ------------------------------------
    dur = 2.0 if SMALL else 6.0
    wav16, _ = _speech_like(sr=16000, dur=dur)
    report["fixture_seconds"] = dur

    x_pad, x_query, x_center, x_max = 1, 6, 38, 41  # fp32 tier pads
    t_pad = 16000 * x_pad
    audio_pad = np.pad(wav16, (t_pad, t_pad), mode="reflect")
    p_len = audio_pad.shape[0] // 160
    f0 = Dio(hop_length=160, sampling_rate=16000).compute_f0(
        audio_pad.astype(np.float64), p_len)
    coarse, cont = post_process(100, f0, 0, x_pad)
    coarse, cont = coarse[:p_len], np.asarray(cont, np.float32)[:p_len]

    # ---- reference path ------------------------------------------------
    cfg = types.SimpleNamespace(x_pad=x_pad, x_query=x_query,
                                x_center=x_center, x_max=x_max,
                                is_half=False, device="cpu")
    ref_pipe = RefPipeline(48000, cfg)
    real_randn_like, real_rand = torch.randn_like, torch.rand
    torch.randn_like = lambda t: torch.zeros_like(t)  # prior + sine noise

    def _zero_rand(*a, **k):  # SineGenerator rand_ini (generators.py:164)
        k.pop("device", None)
        return torch.zeros(*a, **k)

    torch.rand = _zero_rand
    try:
        t0 = time.time()
        out_ref = ref_pipe.pipeline(
            FairseqAdapter(ref_hub), ref_g, 0, wav16.copy(),
            [0, 0, 0], 0, (coarse.copy(), cont.copy()), "", 0.0, 2, 3,
            48000, 0, 1.0, "v2", 0.33, f0_file=None)
        report["reference_wall_s"] = round(time.time() - t0, 1)
    finally:
        torch.randn_like, torch.rand = real_randn_like, real_rand

    # ---- tpu_rvc path ---------------------------------------------------
    hub_vars = {"params": hub_params}
    syn_vars = {"params": g_params}
    pipe = Pipeline(48000, hubert=ours_hub, hubert_vars=hub_vars,
                    synth=syn, synth_vars=syn_vars, version="v2",
                    x_pad=x_pad, x_query=x_query, x_center=x_center,
                    x_max=x_max, is_half=False, dtype=jnp.float32,
                    noise_scale=0.0, deterministic=True)
    t0 = time.time()
    out_ours = pipe.pipeline(0, wav16.copy(), [0, 0, 0], 0,
                             (coarse.copy(), cont.copy()), None, 0.0, 2,
                             3, 0, 1.0, 0.33)
    report["tpu_rvc_wall_s"] = round(time.time() - t0, 1)
    out_ours = np.asarray(out_ours)

    # ---- compare --------------------------------------------------------
    n = min(len(out_ref), len(out_ours))
    report["len_ref"] = int(len(out_ref))
    report["len_ours"] = int(len(out_ours))
    a = out_ref[:n].astype(np.float64) / 32768.0
    b = out_ours[:n].astype(np.float64) / 32768.0
    report["mcd_db_all_frames"] = round(mcd(b, a, 48000), 6)
    # speech-frame MCD (reference-frame RMS >= -50 dBFS): in digital
    # silence the residual is int16 quantization noise, unbounded in
    # log-spectral distance and unrelated to model parity
    try:
        report["mcd_db"] = round(
            mcd(b, a, 48000, energy_floor=10 ** (-50 / 20)), 6)
    except ValueError as e:
        # an all-silent reference makes the energy gate raise (utils/mcd.py
        # fail-loud contract); record the degenerate input instead of
        # aborting the whole oracle report
        report["mcd_db"] = None
        report["mcd_db_error"] = str(e)
    report["max_abs_sample_diff"] = float(np.abs(a - b).max())
    report["rms_ref"] = float(np.sqrt((a ** 2).mean()))
    report["rms_ours"] = float(np.sqrt((b ** 2).mean()))
    report["mcd_target_db"] = 0.1
    report["pass"] = bool(report["mcd_db"] is not None
                          and report["mcd_db"] <= 0.1)
    report["total_wall_s"] = round(time.time() - t_start, 1)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

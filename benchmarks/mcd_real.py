#!/usr/bin/env python
"""REAL-weight MCD harness: the moment the asset mirror becomes reachable,
this converts downloaded weights into proof in one command.

    python benchmarks/mcd_real.py \
        --hubert assets/hubert/hubert_base.pt \
        --model  assets/weights/<voice>.pth \
        [--rmvpe assets/rmvpe/rmvpe.pt] \
        [--vocals-onnx assets/uvr5_weights/onnx_dereverb_By_FoxJoy/vocals.onnx] \
        [--out MCD_real.json]

Both sides run the published weights end-to-end on an identical fixture
with pinned stochastics:
  reference: /root/reference Pipeline.pipeline (pipeline.py:186) with the
    fairseq hubert_base checkpoint loaded into a transformers HubertModel
    (fairseq is not installed; the name mapping below is the inverse of
    ckpt/hubert_loader.hubert_params_from_transformers) and the .pth
    synthesizer via the reference config-list contract
    (rvc/synthesizer.py:10-28);
  tpu_rvc: ckpt.hubert_loader.load_hubert_base + models.loader
    .load_synthesizer through the fused pipeline.vc.Pipeline.

Optional extras when the assets exist:
  --rmvpe: cross-checks our dio/harvest trackers against real-RMVPE f0 on
    the fixture (closes the synthetic-only accuracy bar, r03 Weak #7).
  --vocals-onnx: drives the published MDX-Net payload through
    ckpt.onnx_reader -> models.onnx_exec -> pipeline.mdxnet demix and
    records output stats (closes C44's real-payload gap).

`--selftest DIR` fabricates seeded assets in the exact on-disk formats
(fairseq-layout hubert .pt, small-model .pth) and runs the same loaders +
comparison — proving the harness end-to-end without network access.
"""

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REF = "/root/reference"

# transformers-name -> fairseq-name mapping (encoder layer part), the
# inverse of ckpt/hubert_loader.hubert_params_from_transformers
_LAYER_MAP = (
    ("attention.q_proj", "self_attn.q_proj"),
    ("attention.k_proj", "self_attn.k_proj"),
    ("attention.v_proj", "self_attn.v_proj"),
    ("attention.out_proj", "self_attn.out_proj"),
    ("layer_norm", "self_attn_layer_norm"),
    ("feed_forward.intermediate_dense", "fc1"),
    ("feed_forward.output_dense", "fc2"),
    ("final_layer_norm", "final_layer_norm"),
)


def fairseq_sd_to_transformers(sd, n_layers=12):
    """fairseq HubertModel state_dict (numpy) -> transformers HubertModel
    state_dict (torch), so the reference-side oracle can run the published
    hubert_base.pt without fairseq installed."""
    import torch

    out = {}

    def put(k, v):
        out[k] = torch.from_numpy(v.copy())

    n_conv = sum(1 for k in sd if k.startswith("feature_extractor.conv_layers")
                 and k.endswith(".0.weight"))
    for i in range(n_conv):
        put(f"feature_extractor.conv_layers.{i}.conv.weight",
            sd[f"feature_extractor.conv_layers.{i}.0.weight"])
    put("feature_extractor.conv_layers.0.layer_norm.weight",
        sd["feature_extractor.conv_layers.0.2.weight"])
    put("feature_extractor.conv_layers.0.layer_norm.bias",
        sd["feature_extractor.conv_layers.0.2.bias"])
    put("feature_projection.layer_norm.weight", sd["layer_norm.weight"])
    put("feature_projection.layer_norm.bias", sd["layer_norm.bias"])
    put("feature_projection.projection.weight",
        sd["post_extract_proj.weight"])
    put("feature_projection.projection.bias", sd["post_extract_proj.bias"])
    for a, b in (("weight_g", "original0"), ("weight_v", "original1")):
        put(f"encoder.pos_conv_embed.conv.parametrizations.weight.{b}",
            sd[f"encoder.pos_conv.0.{a}"])
    put("encoder.pos_conv_embed.conv.bias", sd["encoder.pos_conv.0.bias"])
    put("encoder.layer_norm.weight", sd["encoder.layer_norm.weight"])
    put("encoder.layer_norm.bias", sd["encoder.layer_norm.bias"])
    for i in range(n_layers):
        for tname, fname in _LAYER_MAP:
            for p in ("weight", "bias"):
                put(f"encoder.layers.{i}.{tname}.{p}",
                    sd[f"encoder.layers.{i}.{fname}.{p}"])
    return out


def _hubert_cfg():
    from transformers import HubertConfig
    return HubertConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, conv_dim=(512,) * 7,
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_bias=False,
        feat_extract_norm="group", do_stable_layer_norm=False,
        feat_proj_layer_norm=True, num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0)


def make_selftest_assets(outdir):
    """Seeded stand-ins in the exact published on-disk formats."""
    import numpy as np
    import torch
    from transformers import HubertModel
    from tpu_rvc.core.config import hparams_for
    from tpu_rvc.ckpt.small_model import save_small_model

    os.makedirs(outdir, exist_ok=True)
    torch.manual_seed(11)
    hub = HubertModel(_hubert_cfg()).eval()
    # save in FAIRSEQ layout under ['model'] like the published asset
    from tpu_rvc.ckpt import hubert_loader as hl
    t_sd = {k: v.detach().numpy() for k, v in hub.state_dict().items()}
    fair = {}
    n_conv = 7
    for i in range(n_conv):
        fair[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            t_sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
    fair["feature_extractor.conv_layers.0.2.weight"] = \
        t_sd["feature_extractor.conv_layers.0.layer_norm.weight"]
    fair["feature_extractor.conv_layers.0.2.bias"] = \
        t_sd["feature_extractor.conv_layers.0.layer_norm.bias"]
    fair["layer_norm.weight"] = t_sd["feature_projection.layer_norm.weight"]
    fair["layer_norm.bias"] = t_sd["feature_projection.layer_norm.bias"]
    fair["post_extract_proj.weight"] = \
        t_sd["feature_projection.projection.weight"]
    fair["post_extract_proj.bias"] = \
        t_sd["feature_projection.projection.bias"]
    for a, b in (("weight_g", "original0"), ("weight_v", "original1")):
        fair[f"encoder.pos_conv.0.{a}"] = \
            t_sd[f"encoder.pos_conv_embed.conv.parametrizations.weight.{b}"]
    fair["encoder.pos_conv.0.bias"] = \
        t_sd["encoder.pos_conv_embed.conv.bias"]
    fair["encoder.layer_norm.weight"] = t_sd["encoder.layer_norm.weight"]
    fair["encoder.layer_norm.bias"] = t_sd["encoder.layer_norm.bias"]
    for i in range(12):
        for tname, fname in _LAYER_MAP:
            for p in ("weight", "bias"):
                fair[f"encoder.layers.{i}.{fname}.{p}"] = \
                    t_sd[f"encoder.layers.{i}.{tname}.{p}"]
    hub_path = os.path.join(outdir, "hubert_base.pt")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in fair.items()}}, hub_path)

    # seeded v2/48k synthesizer -> reference small-model .pth
    sys.path.insert(0, REF)
    from rvc.layers.synthesizers import SynthesizerTrnMsNSFsid as RefSynth
    hp = hparams_for("v2", 48000)
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
    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}
    model_path = os.path.join(outdir, "oracle_voice.pth")
    save_small_model(sd, "48k", 1, "oracle", 0, "v2", hp,
                     out_path=model_path)
    return hub_path, model_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    ap.add_argument("--model", default="")
    ap.add_argument("--rmvpe", default="")
    ap.add_argument("--vocals-onnx", default="")
    ap.add_argument("--out", default=os.path.join(REPO, "MCD_real.json"))
    ap.add_argument("--selftest", default="",
                    help="dir: fabricate seeded assets there and run on them")
    ap.add_argument("--dur", type=float, default=6.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # bit-exact vs torch CPU
    import numpy as np
    import jax.numpy as jnp

    from mcd_oracle import _stub_modules
    _stub_modules()
    sys.path.insert(0, REF)
    os.environ.setdefault("rmvpe_root", "/tmp")
    cwd = os.getcwd()
    os.chdir(REF)
    import torch
    from transformers import HubertModel
    from rvc.layers.synthesizers import SynthesizerTrnMsNSFsid as RefSynth
    from infer.modules.vc.pipeline import Pipeline as RefPipeline

    from test_f0 import _speech_like
    from tpu_rvc.ckpt.hubert_loader import load_hubert_base
    from tpu_rvc.ckpt.torch_pth import load_pth
    from tpu_rvc.models.loader import load_synthesizer
    from tpu_rvc.pipeline.vc import Pipeline
    from tpu_rvc.f0.dio import Dio
    from tpu_rvc.f0.base import post_process
    from tpu_rvc.utils.mcd import mcd

    report = {"generated_unix": int(time.time()),
              "mode": "selftest" if args.selftest else "real_assets"}
    t_start = time.time()

    if args.selftest:
        hub_path, model_path = make_selftest_assets(
            os.path.join(cwd, args.selftest))
    else:
        hub_path, model_path = args.hubert, args.model
        if not model_path:
            ap.error("--model is required outside --selftest")
    for p in (hub_path, model_path):
        if not os.path.isabs(p):
            p2 = os.path.join(cwd, p)
            if os.path.exists(p2):
                continue
        if not os.path.exists(p):
            raise SystemExit(f"asset not found: {p}")
    hub_path = hub_path if os.path.isabs(hub_path) else os.path.join(
        cwd, hub_path)
    model_path = model_path if os.path.isabs(model_path) else os.path.join(
        cwd, model_path)
    report["hubert"] = hub_path
    report["model"] = model_path

    # ---- our side: torch-free loaders ---------------------------------
    ours_hub, hub_vars = load_hubert_base(hub_path, version="v2")
    mod, variables, meta = load_synthesizer(model_path)
    version = meta.get("version", "v2")
    tgt_sr = {"32k": 32000, "40k": 40000, "48k": 48000}[meta["sr"]]
    report["model_meta"] = {k: str(v) for k, v in meta.items()
                            if k in ("sr", "f0", "version", "info")}

    # ---- reference side: same published files through torch ------------
    raw = load_pth(hub_path)
    fair_sd = {k: np.asarray(v) for k, v in raw["model"].items()
               if not k.startswith(("label_embs", "mask_emb"))}
    ref_hub = HubertModel(_hubert_cfg()).eval()
    missing, unexpected = ref_hub.load_state_dict(
        fairseq_sd_to_transformers(fair_sd), strict=False)
    report["hubert_load"] = {"missing": len(missing),
                             "unexpected": len(unexpected)}

    # reference loader contract (rvc/synthesizer.py:10-28)
    cpt = load_pth(model_path)
    cfg = list(cpt["config"])
    cfg[-3] = np.asarray(cpt["weight"]["emb_g.weight"]).shape[0]
    ref_g = RefSynth(*cfg, encoder_dim=768 if version == "v2" else 256,
                     use_f0=int(cpt.get("f0", 1)) == 1)
    del ref_g.enc_q
    ref_g.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32).copy())
         for k, v in cpt["weight"].items()}, strict=False)
    ref_g = ref_g.float().eval()
    ref_g.remove_weight_norm()

    class FairseqAdapter:
        def __init__(self, hm):
            self.hm = hm

        def extract_features(self, source, padding_mask, output_layer):
            return (self.hm(source).last_hidden_state,)

    # ---- fixture + shared f0 -------------------------------------------
    wav16, _ = _speech_like(sr=16000, dur=args.dur)
    x_pad, x_query, x_center, x_max = 1, 6, 38, 41
    t_pad = 16000 * x_pad
    audio_pad = np.pad(wav16, (t_pad, t_pad), mode="reflect")
    p_len = audio_pad.shape[0] // 160
    f0 = Dio(hop_length=160, sampling_rate=16000).compute_f0(
        audio_pad.astype(np.float64), p_len)
    coarse, cont = post_process(100, f0, 0, x_pad)
    coarse, cont = coarse[:p_len], np.asarray(cont, np.float32)[:p_len]

    cfg_ns = types.SimpleNamespace(x_pad=x_pad, x_query=x_query,
                                   x_center=x_center, x_max=x_max,
                                   is_half=False, device="cpu")
    ref_pipe = RefPipeline(tgt_sr, cfg_ns)
    real_randn_like, real_rand = torch.randn_like, torch.rand
    torch.randn_like = lambda t: torch.zeros_like(t)

    def _zero_rand(*a, **k):
        k.pop("device", None)
        return torch.zeros(*a, **k)

    torch.rand = _zero_rand
    try:
        t0 = time.time()
        out_ref = ref_pipe.pipeline(
            FairseqAdapter(ref_hub), ref_g, 0, wav16.copy(),
            [0, 0, 0], 0, (coarse.copy(), cont.copy()), "", 0.0, 2, 3,
            tgt_sr, 0, 1.0, version, 0.33, f0_file=None)
        report["reference_wall_s"] = round(time.time() - t0, 1)
    finally:
        torch.randn_like, torch.rand = real_randn_like, real_rand

    pipe = Pipeline(tgt_sr, hubert=ours_hub, hubert_vars=hub_vars,
                    synth=mod, synth_vars=variables, version=version,
                    x_pad=x_pad, x_query=x_query, x_center=x_center,
                    x_max=x_max, is_half=False, dtype=jnp.float32,
                    noise_scale=0.0, deterministic=True)
    t0 = time.time()
    out_ours = np.asarray(pipe.pipeline(
        0, wav16.copy(), [0, 0, 0], 0, (coarse.copy(), cont.copy()),
        None, 0.0, 2, 3, 0, 1.0, 0.33))
    report["tpu_rvc_wall_s"] = round(time.time() - t0, 1)

    n = min(len(out_ref), len(out_ours))
    a = np.asarray(out_ref[:n], np.float64) / 32768.0
    b = np.asarray(out_ours[:n], np.float64) / 32768.0
    report["mcd_db_all_frames"] = round(mcd(b, a, tgt_sr), 6)
    try:
        report["mcd_db"] = round(
            mcd(b, a, tgt_sr, energy_floor=10 ** (-50 / 20)), 6)
    except ValueError as e:
        report["mcd_db"], report["mcd_db_error"] = None, str(e)
    report["max_abs_sample_diff"] = float(np.abs(a - b).max())
    report["mcd_target_db"] = 0.1
    report["pass"] = bool(report["mcd_db"] is not None
                          and report["mcd_db"] <= 0.1)

    # ---- optional: real-RMVPE f0 cross-check ---------------------------
    if args.rmvpe:
        rp = args.rmvpe if os.path.isabs(args.rmvpe) else os.path.join(
            cwd, args.rmvpe)
        from tpu_rvc.f0.rmvpe import RMVPE
        from tpu_rvc.f0.harvest import Harvest
        est = RMVPE(model_path=rp)
        f0_rm = est.compute_f0(wav16.astype(np.float64), p_len)
        f0_hv = Harvest(hop_length=160, sampling_rate=16000).compute_f0(
            wav16.astype(np.float64), p_len)
        both = (f0_rm > 0) & (f0_hv > 0)
        cents = 1200 * np.abs(np.log2(
            np.maximum(f0_rm[both], 1e-6) / np.maximum(f0_hv[both], 1e-6)))
        report["rmvpe_vs_harvest_median_cents"] = float(np.median(cents))

    # ---- optional: real vocals.onnx through reader->executor->demix ----
    if args.vocals_onnx:
        vp = (args.vocals_onnx if os.path.isabs(args.vocals_onnx)
              else os.path.join(cwd, args.vocals_onnx))
        from tpu_rvc.pipeline.mdxnet import MDXNetDereverb
        mdx = MDXNetDereverb(os.path.dirname(vp))
        t44 = np.arange(int(44100 * 2)) / 44100
        mix = np.stack([0.3 * np.sin(2 * np.pi * 220 * t44)] * 2)
        res = mdx.demix(mix.astype(np.float32))
        report["vocals_onnx"] = {
            "output_shape": list(np.asarray(res).shape),
            "finite": bool(np.isfinite(res).all()),
            "rms": float(np.sqrt((np.asarray(res) ** 2).mean())),
        }

    report["total_wall_s"] = round(time.time() - t_start, 1)
    out_path = args.out if os.path.isabs(args.out) else os.path.join(
        cwd, args.out)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

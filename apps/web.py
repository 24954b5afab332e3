#!/usr/bin/env python
"""WebUI backend (reference web.py role, C49).

Exposes the reference's named API endpoints (web.py:845-1536):
  infer_convert, infer_convert_batch, uvr_convert, train_preprocess,
  train_extract_f0_feature, train_index, train_start, ckpt_merge,
  ckpt_modify, ckpt_show, ckpt_extract

Two frontends over one `Api` class:
  - gradio Blocks when gradio is importable (same tab structure as the
    reference), else
  - a stdlib JSON-over-HTTP server (POST /api/<endpoint>) so the backend is
    usable in minimal environments like this one.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import traceback
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_rvc.utils.i18n import I18nAuto

i18n = I18nAuto()


class Api:
    def __init__(self, weight_root: str = "assets/weights",
                 index_root: str = "logs",
                 hubert_path: str = "assets/hubert/hubert_base.pt",
                 rmvpe_root: str = "assets/rmvpe"):
        self.weight_root = weight_root
        self.index_root = index_root
        self.hubert_path = hubert_path
        self.rmvpe_root = rmvpe_root
        self._vc = None

    # ---------------- inference tab ----------------
    def _get_vc(self, model_name: str):
        from tpu_rvc.pipeline.vc import VC
        if self._vc is None:
            self._vc = VC(hubert_path=self.hubert_path,
                          rmvpe_root=self.rmvpe_root)
        path = (model_name if os.path.exists(model_name)
                else os.path.join(self.weight_root, model_name))
        meta = self._vc.get_vc(path)
        return self._vc, meta

    def infer_convert(self, sid: int, input_audio_path: str,
                      f0_up_key: int = 0, f0_method: str = "rmvpe",
                      file_index: str = "", index_rate: float = 0.66,
                      filter_radius: int = 3, resample_sr: int = 0,
                      rms_mix_rate: float = 1.0, protect: float = 0.33,
                      model_name: str = "", output_path: str = "out.wav",
                      f0_file: Optional[str] = None,
                      chunk_parallel: bool = False):
        vc, _ = self._get_vc(model_name)
        index = None
        if file_index and os.path.exists(file_index):
            from tpu_rvc.retrieval.index import FeatureIndex
            index = FeatureIndex.load(file_index)
        info, (sr, audio) = vc.vc_single(
            sid, input_audio_path, f0_up_key, f0_method, index, index_rate,
            filter_radius, resample_sr, rms_mix_rate, protect,
            chunk_parallel=chunk_parallel)
        from tpu_rvc.audio.io import save_audio
        save_audio(output_path, audio, sr)
        return {"info": info, "sr": sr, "output": output_path}

    def infer_convert_batch(self, sid: int, input_dir: str, output_dir: str,
                            model_name: str = "", **kwargs):
        vc, _ = self._get_vc(model_name)
        index = None
        if kwargs.get("file_index") and os.path.exists(kwargs["file_index"]):
            from tpu_rvc.retrieval.index import FeatureIndex
            index = FeatureIndex.load(kwargs.pop("file_index"))
        else:
            kwargs.pop("file_index", None)
        paths = [os.path.join(input_dir, n)
                 for n in sorted(os.listdir(input_dir))]
        report = vc.vc_multi(sid, paths, output_dir, index=index, **{
            k: v for k, v in kwargs.items()
            if k in ("f0_up_key", "f0_method", "index_rate", "filter_radius",
                     "resample_sr", "rms_mix_rate", "protect")})
        return {"report": report}

    # ---------------- uvr tab ----------------
    def uvr_convert(self, model_path: str, input_path: str,
                    ins_root: str = "opt_ins", vocal_root: str = "opt_voc",
                    agg: float = 10):
        from tpu_rvc.pipeline.uvr5 import load_separator
        from tpu_rvc.audio.io import save_audio
        sep = load_separator(model_path, agg=agg)
        if hasattr(sep, "_path_audio_"):  # MDXNetDereverb interface
            sep._path_audio_(input_path, vocal_root, ins_root)
            return {"instrument": ins_root, "vocal": vocal_root}
        ins, voc, sr = sep.separate(input_path)
        os.makedirs(ins_root, exist_ok=True)
        os.makedirs(vocal_root, exist_ok=True)
        name = os.path.basename(input_path)
        ins_path = os.path.join(ins_root, f"instrument_{name}.wav")
        voc_path = os.path.join(vocal_root, f"vocal_{name}.wav")
        save_audio(ins_path, ins, sr)
        save_audio(voc_path, voc, sr)
        return {"instrument": ins_path, "vocal": voc_path}

    # ---------------- train tab ----------------
    def train_preprocess(self, trainset_dir: str, exp_dir: str, sr: int = 48000,
                         n_p: int = 8, per: float = 3.7):
        from tpu_rvc.train.preprocess import preprocess_dataset
        preprocess_dataset(trainset_dir, sr, n_p, exp_dir, per)
        return {"status": "done", "exp_dir": exp_dir}

    def train_extract_f0_feature(self, exp_dir: str, version: str = "v2",
                                 if_f0: int = 1, f0_method: str = "rmvpe"):
        from tpu_rvc.train.extract import extract_f0, extract_features
        logs = []
        if if_f0:
            logs += extract_f0(exp_dir, f0_method=f0_method,
                               rmvpe_root=self.rmvpe_root)
        logs += extract_features(exp_dir, version=version,
                                 hubert_path=self.hubert_path)
        return {"status": "done", "logs": logs}

    def train_index(self, exp_dir: str, version: str = "v2",
                    name: str = "index"):
        import numpy as np
        from tpu_rvc.retrieval.index import build_index
        feat_dir = os.path.join(
            exp_dir, "3_feature256" if version == "v1" else "3_feature768")
        feats = np.concatenate(
            [np.load(os.path.join(feat_dir, n))
             for n in sorted(os.listdir(feat_dir))], axis=0)
        idx = build_index(feats, version)
        out = os.path.join(exp_dir, f"added_{name}.tpuidx.npz")
        idx.save(out)
        return {"index": out, "rows": int(idx.vectors.shape[0])}

    def train_start(self, exp_dir: str, version: str = "v2", sr: int = 48000,
                    if_f0: int = 1, epochs: int = 20, batch_size: int = 4,
                    save_every: int = 5, pretrain_g: str = "",
                    pretrain_d: str = "", name: str = "model"):
        from tpu_rvc.core.config import hparams_for
        from tpu_rvc.train.loop import run_training
        import dataclasses
        hp = hparams_for(version, sr)
        hp = dataclasses.replace(
            hp, train=dataclasses.replace(hp.train, batch_size=batch_size))
        metrics = run_training(exp_dir, hp, total_epochs=epochs,
                               if_f0=bool(if_f0), save_every_epoch=save_every,
                               pretrain_g=pretrain_g, pretrain_d=pretrain_d,
                               name=name)
        return {"status": "done", "metrics": metrics}

    def train_start_all(self, exp_dir: str, trainset_dir: str,
                        version: str = "v2", sr: int = 48000,
                        if_f0: int = 1, f0_method: str = "rmvpe",
                        n_p: int = 8, per: float = 3.7, epochs: int = 20,
                        batch_size: int = 4, save_every: int = 5,
                        pretrain_g: str = "", pretrain_d: str = "",
                        name: str = "model"):
        """One-click training (reference train1key, web.py:600-688):
        preprocess -> f0/feature extraction -> GAN training -> index."""
        steps = [self.train_preprocess(trainset_dir, exp_dir, sr, n_p, per),
                 self.train_extract_f0_feature(exp_dir, version, if_f0,
                                               f0_method),
                 self.train_start(exp_dir, version, sr, if_f0, epochs,
                                  batch_size, save_every, pretrain_g,
                                  pretrain_d, name),
                 self.train_index(exp_dir, version, name)]
        return {"status": "done", "steps": steps}

    # ---------------- ckpt tab ----------------
    def ckpt_merge(self, path1: str, path2: str, alpha1: float, sr: str,
                   f0: int, info: str, name: str, version: str):
        from tpu_rvc.ckpt.small_model import merge
        out = merge(path1, path2, alpha1, sr, f0, info, name, version)
        return {"output": out}

    def ckpt_modify(self, path: str, info: str, name: str = ""):
        from tpu_rvc.ckpt.small_model import change_info
        return {"output": change_info(path, info, name)}

    def ckpt_show(self, path: str):
        from tpu_rvc.ckpt.torch_pth import load_pth
        cpt = load_pth(path)
        return {k: (v if not hasattr(v, "shape") else None)
                for k, v in cpt.items() if k != "weight"}

    def ckpt_extract(self, path: str, name: str, sr: str, if_f0: int,
                     info: str, version: str):
        from tpu_rvc.core.config import hparams_for
        from tpu_rvc.ckpt.small_model import extract_small_model
        hp = hparams_for(version, {"32k": 32000, "40k": 40000,
                                   "48k": 48000}[sr])
        out = extract_small_model(path, name, sr, if_f0, info, version, hp)
        return {"output": out}

    # ---------------- export tab ----------------
    def export_onnx(self, ckpt_path: str, onnx_path: str, frames: int = 200):
        """ONNX export endpoint (reference web.py:1519)."""
        from tpu_rvc.ckpt.export import export_onnx
        export_onnx(ckpt_path, onnx_path, T=frames)
        return {"output": onnx_path}


ENDPOINTS = ("infer_convert", "infer_convert_batch", "uvr_convert",
             "train_preprocess", "train_extract_f0_feature", "train_index",
             "train_start", "train_start_all", "ckpt_merge", "ckpt_modify",
             "ckpt_show", "ckpt_extract", "export_onnx")


def serve_http(api: Api, host: str = "127.0.0.1", port: int = 7865):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            name = self.path.strip("/").removeprefix("api/")
            if name not in ENDPOINTS:
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                kwargs = json.loads(self.rfile.read(n) or b"{}")
                result = getattr(api, name)(**kwargs)
                body = json.dumps({"ok": True, "result": result}).encode()
                self.send_response(200)
            except Exception:
                body = json.dumps({"ok": False,
                                   "error": traceback.format_exc()}).encode()
                self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            body = json.dumps({"endpoints": list(ENDPOINTS)}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer((host, port), Handler)
    print(f"tpu_rvc API listening on http://{host}:{port} "
          f"(POST /api/<endpoint>)")
    srv.serve_forever()


def serve_gradio(api: Api, host: str, port: int):  # pragma: no cover
    import gradio as gr

    with gr.Blocks(title="tpu_rvc WebUI") as app:
        gr.Markdown("## tpu_rvc — TPU-native Retrieval-based Voice Conversion")
        with gr.Tab(i18n("Model Inference")):
            model = gr.Textbox(label=i18n("Model"), value="")
            inp = gr.Textbox(label=i18n("Input audio path"))
            sid = gr.Number(label=i18n("Speaker ID"), value=0, precision=0)
            key = gr.Number(label=i18n("Transpose"), value=0, precision=0)
            method = gr.Radio(["pm", "harvest", "crepe", "rmvpe"],
                              value="rmvpe", label=i18n("F0 method"))
            index_path = gr.Textbox(label=i18n("Index path"))
            index_rate = gr.Slider(0, 1, value=0.66,
                                   label=i18n("Index rate"))
            out_path = gr.Textbox(label=i18n("Output path"), value="out.wav")
            result = gr.JSON()
            btn = gr.Button(i18n("Convert"), variant="primary")
            btn.click(
                lambda m, i, s, k, f, ip, ir, o: api.infer_convert(
                    int(s), i, int(k), f, ip, ir, model_name=m,
                    output_path=o),
                [model, inp, sid, key, method, index_path, index_rate,
                 out_path],
                [result], api_name="infer_convert")
            in_dir = gr.Textbox(label=i18n("Input directory"))
            out_dir = gr.Textbox(label=i18n("Output directory"), value="opt")
            bres = gr.JSON()
            bbtn = gr.Button(i18n("Batch convert"))
            bbtn.click(
                lambda m, d, o, s, k, f, ip, ir: api.infer_convert_batch(
                    int(s), d, o, model_name=m, f0_up_key=int(k),
                    f0_method=f, file_index=ip, index_rate=ir),
                [model, in_dir, out_dir, sid, key, method, index_path,
                 index_rate], [bres], api_name="infer_convert_batch")
        with gr.Tab(i18n("Vocals/Accompaniment Separation & Reverberation Removal")):
            uvr_model = gr.Textbox(label=i18n("Model"))
            uvr_in = gr.Textbox(label=i18n("Input audio path"))
            uvr_ins = gr.Textbox(label=i18n("Instrument output"), value="opt_ins")
            uvr_voc = gr.Textbox(label=i18n("Vocal output"), value="opt_voc")
            uvr_agg = gr.Slider(0, 20, value=10, label="agg")
            uvr_res = gr.JSON()
            uvr_btn = gr.Button(i18n("Convert"), variant="primary")
            uvr_btn.click(
                lambda m, i, a, v, g: api.uvr_convert(m, i, a, v, g),
                [uvr_model, uvr_in, uvr_ins, uvr_voc, uvr_agg],
                [uvr_res], api_name="uvr_convert")
        with gr.Tab(i18n("Train")):
            exp_dir = gr.Textbox(label=i18n("Experiment dir"), value="logs/exp")
            trainset = gr.Textbox(label=i18n("Trainset dir"))
            t_sr = gr.Radio(["32000", "40000", "48000"], value="48000",
                            label=i18n("Sample rate"))
            t_ver = gr.Radio(["v1", "v2"], value="v2", label=i18n("Version"))
            t_f0 = gr.Checkbox(value=True, label=i18n("Pitch guidance"))
            t_method = gr.Radio(["pm", "harvest", "rmvpe"], value="rmvpe",
                                label=i18n("F0 method"))
            t_epochs = gr.Number(value=20, precision=0, label=i18n("Epochs"))
            t_bs = gr.Number(value=4, precision=0, label=i18n("Batch size"))
            t_res = gr.JSON()
            b1 = gr.Button(i18n("Process data"))
            b1.click(lambda d, e, s: api.train_preprocess(d, e, int(s)),
                     [trainset, exp_dir, t_sr], [t_res],
                     api_name="train_preprocess")
            b2 = gr.Button(i18n("Feature extraction"))
            b2.click(lambda e, v, f, m: api.train_extract_f0_feature(
                         e, v, int(f), m),
                     [exp_dir, t_ver, t_f0, t_method], [t_res],
                     api_name="train_extract_f0_feature")
            b3 = gr.Button(i18n("Train model"), variant="primary")
            b3.click(lambda e, v, s, f, ep, bs: api.train_start(
                         e, v, int(s), int(f), int(ep), int(bs)),
                     [exp_dir, t_ver, t_sr, t_f0, t_epochs, t_bs], [t_res],
                     api_name="train_start")
            b4 = gr.Button(i18n("Train feature index"))
            b4.click(lambda e, v: api.train_index(e, v),
                     [exp_dir, t_ver], [t_res], api_name="train_index")
            b5 = gr.Button(i18n("One-click training"))
            b5.click(lambda e, d, v, s, f, m, ep, bs: api.train_start_all(
                         e, d, v, int(s), int(f), m, epochs=int(ep),
                         batch_size=int(bs)),
                     [exp_dir, trainset, t_ver, t_sr, t_f0, t_method,
                      t_epochs, t_bs], [t_res], api_name="train_start_all")
        with gr.Tab(i18n("ckpt Processing")):
            ck_a = gr.Textbox(label=i18n("Model A"))
            ck_b = gr.Textbox(label=i18n("Model B"))
            ck_alpha = gr.Slider(0, 1, value=0.5, label=i18n("Weight of A"))
            ck_sr = gr.Radio(["32k", "40k", "48k"], value="48k",
                             label=i18n("Sample rate"))
            ck_f0 = gr.Checkbox(value=True, label=i18n("Pitch guidance"))
            ck_info = gr.Textbox(label=i18n("Model info"))
            ck_name = gr.Textbox(label=i18n("Model name"))
            ck_ver = gr.Radio(["v1", "v2"], value="v2", label=i18n("Version"))
            ck_res = gr.JSON()
            mb = gr.Button(i18n("Merge"))
            mb.click(lambda a, bb, al, s, f, i, n, v: api.ckpt_merge(
                         a, bb, al, s, int(f), i, n, v),
                     [ck_a, ck_b, ck_alpha, ck_sr, ck_f0, ck_info, ck_name,
                      ck_ver], [ck_res], api_name="ckpt_merge")
            cb = gr.Button(i18n("Modify"))
            cb.click(lambda a, i, n: api.ckpt_modify(a, i, n),
                     [ck_a, ck_info, ck_name], [ck_res],
                     api_name="ckpt_modify")
            sb = gr.Button(i18n("View"))
            sb.click(lambda a: api.ckpt_show(a), [ck_a], [ck_res],
                     api_name="ckpt_show")
            eb = gr.Button(i18n("Extract"))
            eb.click(lambda a, n, s, f, i, v: api.ckpt_extract(
                         a, n, s, int(f), i, v),
                     [ck_a, ck_name, ck_sr, ck_f0, ck_info, ck_ver],
                     [ck_res], api_name="ckpt_extract")
        with gr.Tab(i18n("Export Onnx")):
            ox_in = gr.Textbox(label=i18n("RVC Model Path"))
            ox_out = gr.Textbox(label=i18n("Onnx Export Path"))
            ox_frames = gr.Number(value=200, precision=0, label=i18n("Frames"))
            ox_res = gr.JSON()
            ob = gr.Button(i18n("Export Onnx Model"), variant="primary")
            ob.click(lambda i, o, f: api.export_onnx(i, o, int(f)),
                     [ox_in, ox_out, ox_frames], [ox_res],
                     api_name="export_onnx")
    app.launch(server_name=host, server_port=port)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7865)
    p.add_argument("--http-only", action="store_true",
                   help="skip gradio even if installed")
    p.add_argument("--weight-root", default="assets/weights")
    p.add_argument("--index-root", default="logs")
    p.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    p.add_argument("--rmvpe-root", default="assets/rmvpe")
    args = p.parse_args()
    api = Api(weight_root=args.weight_root, index_root=args.index_root,
              hubert_path=args.hubert, rmvpe_root=args.rmvpe_root)
    if not args.http_only:
        try:
            import gradio  # noqa: F401
            serve_gradio(api, args.host, args.port)
            return
        except ImportError:
            pass
    serve_http(api, args.host, args.port)


if __name__ == "__main__":
    main()

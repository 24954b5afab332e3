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
                 rmvpe_root: str = "assets/rmvpe",
                 uvr5_root: str = "assets/uvr5_weights"):
        self.weight_root = weight_root
        self.index_root = index_root
        self.hubert_path = hubert_path
        self.rmvpe_root = rmvpe_root
        self.uvr5_root = uvr5_root
        self._vc = None
        # uvr separators are cached per (model, agg): a DeviceSeparator's
        # fused per-bucket graphs cost minutes to compile on the TPU
        # (CLAUDE.md), so they must survive across requests.  Bounded LRU:
        # each entry pins its weight tree + per-bucket executables in
        # device HBM, so sweeping agg values or loading several UVR models
        # must evict, not accumulate.
        from collections import OrderedDict
        self._uvr = OrderedDict()
        self._uvr_capacity = 4

    # ------------- model/index discovery (reference web.py:90-112) -------
    def lookup_names(self):
        """Voice models in weight_root (reference lookup_names)."""
        if not os.path.isdir(self.weight_root):
            return []
        return sorted(n for n in os.listdir(self.weight_root)
                      if n.endswith(".pth"))

    def lookup_indices(self):
        """Feature indexes under index_root (reference lookup_indices
        web.py:98-104; ours are .tpuidx.npz, 'trained_' variants skipped)."""
        out = []
        for root, _, files in os.walk(self.index_root):
            for name in files:
                if (name.endswith((".tpuidx.npz", ".index"))
                        and "trained" not in name):
                    out.append(os.path.join(root, name))
        return sorted(out)

    def lookup_uvr5_names(self):
        """UVR5 separation models (reference web.py:109-112)."""
        if not os.path.isdir(self.uvr5_root):
            return []
        return sorted(n.replace(".pth", "")
                      for n in os.listdir(self.uvr5_root)
                      if n.endswith(".pth") or "onnx" in n)

    def change_choices(self):
        """Refresh dropdown choices (reference change_choices web.py:115)."""
        return {"names": [""] + self.lookup_names(),
                "indices": [""] + self.lookup_indices()}

    def clean(self):
        """Unload the current model (reference clean web.py:124)."""
        self._vc = None
        return {"value": "", "__type__": "update"}

    def change_voice(self, model_name: str):
        """Load a voice and report its metadata for the UI (reference
        VC.get_vc gradio-update plumbing, infer/modules/vc/modules.py:32-115:
        speaker count, f0 flag, model info text)."""
        if not model_name:
            self.clean()
            return {"n_spk": 0, "if_f0": 1, "info": ""}
        vc, meta = self._get_vc(model_name)
        return {"n_spk": vc.n_spk, "if_f0": vc.if_f0, "sr": vc.tgt_sr,
                "info": str(meta.get("info", "")),
                "version": vc.version}

    def hash_similarity(self, id_a: str, id_b: str):
        """Model-ID similarity (reference web.py:1330 butmodelcmp)."""
        from tpu_rvc.ckpt.hash import hash_similarity
        try:
            return {"similarity": float(hash_similarity(id_a, id_b))}
        except Exception as e:
            return {"similarity": None, "error": str(e)}

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
        manual_f0 = None
        if f0_file and os.path.exists(f0_file):
            # comma-separated "time_s,f0_hz" rows (reference pipeline's
            # f0_file parsing, infer/modules/vc/pipeline.py:244-253)
            rows = [line.split(",") for line in
                    open(f0_file).read().strip().split("\n") if line.strip()]
            manual_f0 = [[float(x) for x in r] for r in rows]
        info, (sr, audio) = vc.vc_single(
            sid, input_audio_path, f0_up_key, f0_method, index, index_rate,
            filter_radius, resample_sr, rms_mix_rate, protect,
            f0_file=manual_f0, chunk_parallel=chunk_parallel)
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
        from tpu_rvc.pipeline.uvr5 import load_separator, DeviceSeparator
        from tpu_rvc.audio.io import save_audio
        sep = self._uvr.get((model_path, agg))
        if sep is not None:
            self._uvr.move_to_end((model_path, agg))
        else:
            sep = load_separator(model_path, agg=agg)
            if not hasattr(sep, "_path_audio_"):
                import jax
                if jax.devices()[0].platform != "cpu":
                    # fused device-resident graph: one upload, two int16
                    # fetches; AOT cache warm-starts the per-bucket graphs
                    # across server restarts
                    from tpu_rvc.utils.aot import AOTGraphCache
                    sep = DeviceSeparator(sep, aot_cache=AOTGraphCache())
            self._uvr[(model_path, agg)] = sep
            while len(self._uvr) > self._uvr_capacity:
                self._uvr.popitem(last=False)  # evict LRU; HBM freed on GC
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
                    pretrain_d: str = "", name: str = "model",
                    author: str = "", log_fn=None):
        from tpu_rvc.core.config import hparams_for
        from tpu_rvc.train.loop import run_training
        import dataclasses
        hp = hparams_for(version, sr)
        hp = dataclasses.replace(
            hp, train=dataclasses.replace(hp.train, batch_size=batch_size))
        metrics = run_training(exp_dir, hp, total_epochs=epochs,
                               if_f0=bool(if_f0), save_every_epoch=save_every,
                               pretrain_g=pretrain_g, pretrain_d=pretrain_d,
                               name=name, author=author, log_fn=log_fn)
        return {"status": "done", "metrics": metrics}

    def train_start_all(self, exp_dir: str, trainset_dir: str,
                        version: str = "v2", sr: int = 48000,
                        if_f0: int = 1, f0_method: str = "rmvpe",
                        n_p: int = 8, per: float = 3.7, epochs: int = 20,
                        batch_size: int = 4, save_every: int = 5,
                        pretrain_g: str = "", pretrain_d: str = "",
                        name: str = "model", author: str = "", log_fn=None):
        """One-click training (reference train1key, web.py:600-688):
        preprocess -> f0/feature extraction -> GAN training -> index."""
        log = log_fn or (lambda s: None)
        log("step 1/4: preprocess")
        steps = [self.train_preprocess(trainset_dir, exp_dir, sr, n_p, per)]
        log("step 2/4: f0/feature extraction")
        steps.append(self.train_extract_f0_feature(exp_dir, version, if_f0,
                                                   f0_method))
        log("step 3/4: training")
        steps.append(self.train_start(exp_dir, version, sr, if_f0, epochs,
                                      batch_size, save_every, pretrain_g,
                                      pretrain_d, name, author=author,
                                      log_fn=log_fn))
        log("step 4/4: index build")
        steps.append(self.train_index(exp_dir, version, name))
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
                     info: str, version: str, author: str = ""):
        from tpu_rvc.core.config import hparams_for
        from tpu_rvc.ckpt.small_model import extract_small_model
        hp = hparams_for(version, {"32k": 32000, "40k": 40000,
                                   "48k": 48000}[sr])
        out = extract_small_model(path, name, sr, if_f0, info, version, hp,
                                  author=author)
        return {"output": out}

    # ---------------- export tab ----------------
    def export_onnx(self, ckpt_path: str, onnx_path: str, frames: int = 200,
                    reference_layout: bool = False):
        """ONNX export endpoint (reference web.py:1519)."""
        from tpu_rvc.ckpt.export import export_onnx
        export_onnx(ckpt_path, onnx_path, T=frames,
                    reference_layout=reference_layout)
        return {"output": onnx_path}

    # ---------------- log-tail streaming ----------------
    def stream_endpoint(self, endpoint: str, poll: float = 0.5,
                        **kwargs):
        """Run endpoint `name` in a worker thread, yielding the growing log
        text until it finishes — the role of the reference's
        subprocess-log-tail generators (web.py:141-162,185-199: Popen +
        poll loop re-reading the log file).  Endpoints that accept log_fn
        stream live progress lines; others stream a heartbeat then the
        final result."""
        import inspect
        import threading
        import time

        if endpoint not in ENDPOINTS:
            raise ValueError(f"unknown endpoint {endpoint}")
        fn = getattr(self, endpoint)
        lines: list = []
        done = [False]
        res: dict = {}
        takes_log = "log_fn" in inspect.signature(fn).parameters

        def runner():
            try:
                if takes_log:
                    res["result"] = fn(log_fn=lines.append, **kwargs)
                else:
                    res["result"] = fn(**kwargs)
            except Exception:
                res["error"] = traceback.format_exc()
            finally:
                done[0] = True

        t = threading.Thread(target=runner, daemon=True)
        t0 = time.time()
        t.start()
        while not done[0]:
            yield "\n".join(lines) if lines else \
                f"running {endpoint}... ({time.time() - t0:.0f}s)"
            time.sleep(poll)
        t.join()
        if "error" in res:
            yield "\n".join(lines + [res["error"]])
        else:
            yield "\n".join(lines + [json.dumps(res["result"], default=str)])


ENDPOINTS = ("infer_convert", "infer_convert_batch", "uvr_convert",
             "train_preprocess", "train_extract_f0_feature", "train_index",
             "train_start", "train_start_all", "ckpt_merge", "ckpt_modify",
             "ckpt_show", "ckpt_extract", "export_onnx",
             "change_choices", "clean", "change_voice", "hash_similarity",
             "lookup_names", "lookup_indices", "lookup_uvr5_names")


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


def serve_gradio(api: Api, host: str, port: int,
                 infer_only: bool = False):  # pragma: no cover
    """Launch the full gradio WebUI (layout in apps/webui.py, mirroring
    reference web.py:690-1550; --infer-only serves the reduced app,
    reference tools/web/infer-only.py role)."""
    import gradio as gr

    from webui import build_app, build_infer_only_app

    app = (build_infer_only_app(gr, api) if infer_only
           else build_app(gr, api))
    app.queue(max_size=1022).launch(server_name=host, server_port=port,
                                    max_threads=511)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7865)
    p.add_argument("--http-only", action="store_true",
                   help="skip gradio even if installed")
    p.add_argument("--infer-only", action="store_true",
                   help="serve only the inference surface "
                        "(reference tools/web/infer-only.py)")
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
            serve_gradio(api, args.host, args.port,
                         infer_only=args.infer_only)
            return
        except ImportError:
            pass
    serve_http(api, args.host, args.port)


if __name__ == "__main__":
    main()

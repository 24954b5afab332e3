"""WebUI layout tests (C49, reference web.py:690-1550).

gradio is absent in this environment, so `build_app` is driven with a
recording stub module: every component is a real object, every
click/change binding is captured with its api_name, and the bound
functions are called directly.  This asserts the layout is
endpoint-complete and actually wired to the Api backend.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))


# ---------------------------------------------------------------------------
# recording gradio stub
# ---------------------------------------------------------------------------

class _Binding:
    def __init__(self, event, fn, inputs, outputs, api_name):
        self.event = event
        self.fn = fn
        self.inputs = inputs or []
        self.outputs = outputs or []
        self.api_name = api_name


class _Component:
    def __init__(self, gr, comp_type, *args, **kwargs):
        self._gr = gr
        self.comp_type = comp_type
        self.label = kwargs.get("label") or (args[0] if args else None)
        self.kwargs = kwargs
        gr.components.append(self)

    def _bind(self, event, fn=None, inputs=None, outputs=None, api_name=None,
              **kw):
        b = _Binding(event, fn, inputs, outputs, api_name)
        self._gr.bindings.append(b)
        return b

    def click(self, fn=None, inputs=None, outputs=None, api_name=None, **kw):
        return self._bind("click", fn, inputs, outputs, api_name)

    def change(self, fn=None, inputs=None, outputs=None, api_name=None, **kw):
        return self._bind("change", fn, inputs, outputs, api_name)

    def __enter__(self):
        if self.comp_type == "TabItem":
            self._gr.tabs.append(self.label)
        return self

    def __exit__(self, *a):
        return False


def make_stub_gr():
    gr = types.SimpleNamespace()
    gr.components = []
    gr.bindings = []
    gr.tabs = []
    for name in ("Blocks", "Tabs", "TabItem", "Row", "Column", "Markdown",
                 "Dropdown", "Button", "Slider", "Textbox", "Number",
                 "Audio", "File", "Radio", "Checkbox", "JSON", "Label"):
        setattr(gr, name,
                (lambda n: lambda *a, **k: _Component(gr, n, *a, **k))(name))
    return gr


@pytest.fixture()
def built(tmp_path):
    from web import Api
    from webui import build_app

    api = Api(weight_root=str(tmp_path / "weights"),
              index_root=str(tmp_path / "logs"),
              uvr5_root=str(tmp_path / "uvr5"))
    gr = make_stub_gr()
    app = build_app(gr, api)
    return gr, api, app


# reference api_names (web.py:720-1536) that the layout must expose
REFERENCE_API_NAMES = {
    "infer_clean", "infer_refresh", "infer_convert", "infer_refresh_batch",
    "infer_convert_batch", "infer_change_voice", "uvr_convert",
    "train_preprocess", "train_extract_f0_feature", "train_start",
    "train_index", "train_start_all", "ckpt_merge", "ckpt_modify",
    "ckpt_show", "ckpt_extract", "export_onnx",
}


def test_layout_is_endpoint_complete(built):
    gr, api, app = built
    bound = {b.api_name for b in gr.bindings if b.api_name}
    missing = REFERENCE_API_NAMES - bound
    assert not missing, f"layout missing api endpoints: {sorted(missing)}"
    # every binding has a callable fn and component-typed inputs/outputs
    for b in gr.bindings:
        assert callable(b.fn), b.api_name
        for c in list(b.inputs) + list(b.outputs):
            assert isinstance(c, _Component), (b.api_name, c)


def test_layout_has_reference_tabs(built):
    gr, _, _ = built
    want = ["Model Inference", "Single inference", "Batch inference",
            "Vocals/Accompaniment Separation & Reverberation Removal",
            "Train", "ckpt Processing", "Export Onnx",
            "FAQ (Frequently Asked Questions)"]
    for t in want:
        assert t in gr.tabs, f"missing tab {t}"


def test_layout_control_inventory(built):
    """The key controls of the reference layout exist with the right
    widget types (spot checks against web.py:700-1536)."""
    gr, _, _ = built
    by_type = {}
    for c in gr.components:
        by_type.setdefault(c.comp_type, []).append(c)
    # voice dropdown + 2 index dropdowns + uvr model dropdown
    assert len(by_type.get("Dropdown", [])) >= 4
    # f0 method radios offer all 6 estimators (web.py:835: pm/dio/harvest/
    # crepe/rmvpe/fcpe)
    radios = [c for c in by_type.get("Radio", [])
              if c.kwargs.get("choices") == ["pm", "dio", "harvest", "crepe",
                                             "rmvpe", "fcpe"]]
    assert len(radios) >= 3  # single, batch, train-extract
    sliders = by_type.get("Slider", [])
    assert len(sliders) >= 12  # pads/rates/epochs/batch controls
    assert len(by_type.get("Button", [])) >= 14


def test_infer_convert_binding_maps_args(built, monkeypatch):
    """Driving the infer_convert binding calls Api.infer_convert with the
    UI values mapped to the right kwargs."""
    gr, api, _ = built
    calls = {}

    def fake_infer_convert(sid, path, key, method, file_index, index_rate,
                           filter_radius, resample_sr, rms_mix_rate, protect,
                           model_name="", output_path="", f0_file=None,
                           **kw):
        calls.update(locals())
        return {"info": "ok", "sr": 48000, "output": output_path}

    monkeypatch.setattr(api, "infer_convert", fake_infer_convert)
    b = next(x for x in gr.bindings if x.api_name == "infer_convert")
    info, audio = b.fn(3, "in.wav", 12, None, "rmvpe", "", "my.idx", 0.75,
                       3, 0, 0.25, 0.33, "model.pth")
    assert info == "ok" and audio
    assert calls["sid"] == 3 and calls["path"] == "in.wav"
    assert calls["key"] == 12 and calls["method"] == "rmvpe"
    assert calls["file_index"] == "my.idx" and calls["index_rate"] == 0.75
    assert calls["model_name"] == "model.pth"


def test_infer_convert_binding_unwraps_file_objects(built, monkeypatch):
    """gr.File values arrive as tempfile wrappers with a .name under
    gradio 3.x; the index and f0-curve pickers must be unwrapped before
    they reach the Api (else os.path.exists(File) raises)."""
    gr, api, _ = built
    calls = {}

    def fake_infer_convert(sid, path, key, method, file_index, index_rate,
                           filter_radius, resample_sr, rms_mix_rate, protect,
                           model_name="", output_path="", f0_file=None,
                           **kw):
        calls.update(locals())
        return {"info": "ok", "sr": 48000, "output": output_path}

    monkeypatch.setattr(api, "infer_convert", fake_infer_convert)

    class File:
        def __init__(self, name):
            self.name = name

    b = next(x for x in gr.bindings if x.api_name == "infer_convert")
    b.fn(0, "in.wav", 0, File("/tmp/curve.csv"), "rmvpe",
         File("/tmp/my.idx"), "", 0.75, 3, 0, 0.25, 0.33, "model.pth")
    assert calls["file_index"] == "/tmp/my.idx"
    assert calls["f0_file"] == "/tmp/curve.csv"
    # and the batch tab's index File too
    calls.clear()

    def fake_batch(sid, src, out, file_index="", **kw):
        calls["file_index"] = file_index
        return {"report": ["ok"]}

    monkeypatch.setattr(api, "infer_convert_batch", fake_batch)
    bb = next(x for x in gr.bindings if x.api_name == "infer_convert_batch")
    bb.fn(0, "/nonexistent_dir", "opt", None, 0, "rmvpe",
          File("/tmp/b.idx"), "", 1.0, 3, 0, 1.0, 0.33, "wav", "m.pth")
    assert calls["file_index"] == "/tmp/b.idx"


def test_ckpt_extract_binding_forwards_author(built, monkeypatch):
    """The Model Author textbox reaches extract (reference web.py:1505
    passes extauthor into extract_small_model)."""
    gr, api, _ = built
    calls = {}

    def fake_extract(path, name, sr, if_f0, info, version, author=""):
        calls.update(locals())
        return {"output": "saved"}

    monkeypatch.setattr(api, "ckpt_extract", fake_extract)
    b = next(x for x in gr.bindings if x.api_name == "ckpt_extract")
    assert b.fn("G_1.pth", "small", "someone", "48k", "1", "info",
                "v2") == "saved"
    assert calls["author"] == "someone"


def test_api_ckpt_extract_saves_author(tmp_path, monkeypatch):
    """Api.ckpt_extract threads author into the saved small model."""
    from web import Api
    captured = {}

    def fake_extract_small_model(path, name, sr, if_f0, info, version, hp,
                                 out_path=None, author=""):
        captured["author"] = author
        return "out.pth"

    import tpu_rvc.ckpt.small_model as sm
    monkeypatch.setattr(sm, "extract_small_model", fake_extract_small_model)
    out = Api().ckpt_extract("G_1.pth", "n", "48k", 1, "i", "v2",
                             author="author-x")
    assert out == {"output": "out.pth"} and captured["author"] == "author-x"


def test_api_infer_convert_parses_f0_file(built, tmp_path, monkeypatch):
    """Api.infer_convert reads a comma-separated f0 curve file and passes
    the parsed rows to vc_single (reference pipeline.py:244-253)."""
    gr, api, _ = built
    seen = {}

    class FakeVC:
        def vc_single(self, sid, path, key, method, index, index_rate,
                      filter_radius, resample_sr, rms_mix_rate, protect,
                      f0_file=None, chunk_parallel=False, **kw):
            seen["f0_file"] = f0_file
            import numpy as np
            return "ok", (16000, np.zeros(16, np.int16))

    monkeypatch.setattr(api, "_get_vc", lambda name: (FakeVC(), {}))
    curve = tmp_path / "curve.csv"
    curve.write_text("0.0,220.0\n1.0,230.5\n")
    r = api.infer_convert(0, "in.wav", f0_file=str(curve),
                          output_path=str(tmp_path / "o.wav"))
    assert r["info"] == "ok"
    assert seen["f0_file"] == [[0.0, 220.0], [1.0, 230.5]]


def test_stream_endpoint_rejects_unknown_names(built):
    gr, api, _ = built
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown endpoint"):
        list(api.stream_endpoint("no_such_endpoint"))


def test_refresh_and_clean_bindings(built, tmp_path):
    gr, api, _ = built
    os.makedirs(api.weight_root, exist_ok=True)
    open(os.path.join(api.weight_root, "aaa.pth"), "wb").write(b"x")
    b = next(x for x in gr.bindings if x.api_name == "infer_refresh")
    names_upd, idx_upd = b.fn()
    assert "aaa.pth" in names_upd["choices"]
    assert names_upd["__type__"] == "update"
    c = next(x for x in gr.bindings if x.api_name == "infer_clean")
    assert c.fn()["__type__"] == "update"
    assert api._vc is None


def test_train_stream_binding_yields_logs(built, monkeypatch):
    """The train_start binding is a log-streaming generator (reference
    web.py:141-162 log-tail pattern): it yields progress lines while the
    endpoint runs and ends with the result."""
    gr, api, _ = built

    def fake_train_start(log_fn=None, **kwargs):
        log_fn("epoch 1 done")
        log_fn("epoch 2 done")
        return {"status": "done", "metrics": {"loss": 1.0}}

    monkeypatch.setattr(api, "train_start", fake_train_start)
    b = next(x for x in gr.bindings if x.api_name == "train_start")
    chunks = list(b.fn("exp", "48k", "Yes", 0, 5, 20, 4, "No", "", "",
                       "mesh", "No", "No", "v2", "author"))
    assert chunks, "no streamed output"
    assert "epoch 2 done" in chunks[-1] and "done" in chunks[-1]


def test_stream_endpoint_surfaces_errors(built, monkeypatch):
    gr, api, _ = built

    def boom(**kwargs):
        raise RuntimeError("exploded")

    monkeypatch.setattr(api, "train_index", boom)
    out = list(api.stream_endpoint("train_index", exp_dir="x"))
    assert "exploded" in out[-1]


def test_ckpt_extract_prefill_binding(built, monkeypatch):
    """ckpt_path2.change pre-fills sr/f0/version from the checkpoint
    (reference change_info_ web.py:674)."""
    gr, api, _ = built
    monkeypatch.setattr(api, "ckpt_show",
                        lambda p: {"sr": "32k", "f0": 0, "version": "v1"})
    b = next(x for x in gr.bindings
             if x.event == "change" and x.api_name is None
             and len(x.inputs) == 1 and len(x.outputs) == 3)
    assert b.fn("G_5.pth") == ("32k", "0", "v1")


def test_http_server_exposes_new_endpoints():
    from web import ENDPOINTS
    for e in ("change_choices", "clean", "change_voice", "hash_similarity"):
        assert e in ENDPOINTS


def test_infer_only_app(tmp_path):
    """Reduced inference-only layout (reference tools/web/infer-only.py):
    exactly the infer_convert surface, no train/ckpt tabs."""
    from web import Api
    from webui import build_infer_only_app

    api = Api(weight_root=str(tmp_path / "w"), index_root=str(tmp_path / "l"))
    gr = make_stub_gr()
    build_infer_only_app(gr, api)
    bound = {b.api_name for b in gr.bindings if b.api_name}
    assert bound == {"infer_convert"}
    assert not gr.tabs  # single page, no TabItems


def test_api_uvr_convert_caches_separator(built, tmp_path, monkeypatch):
    """uvr_convert must reuse the separator across requests: a
    DeviceSeparator's fused per-bucket graphs cost minutes to compile on
    the TPU, so a per-request rebuild would recompile every call."""
    gr, api, app = built
    import web as web_mod

    loads = []

    class _FakeSep:
        def separate(self, path):
            sr = 44100
            x = np.zeros((sr // 10, 2), np.float32)
            return x, x, sr

    def fake_load(model_path, agg=10, **kw):
        loads.append((model_path, agg))
        return _FakeSep()

    monkeypatch.setattr("tpu_rvc.pipeline.uvr5.load_separator", fake_load)
    from tpu_rvc.audio.io import save_wav
    wav = str(tmp_path / "in.wav")
    save_wav(wav, np.zeros(4410, np.float32), 44100)

    for _ in range(2):
        out = api.uvr_convert("HP5.pth", wav,
                              ins_root=str(tmp_path / "ins"),
                              vocal_root=str(tmp_path / "voc"), agg=10)
        assert os.path.exists(out["vocal"])
    assert len(loads) == 1, "separator must be cached across requests"
    # a different aggressiveness is a different separator
    api.uvr_convert("HP5.pth", wav, ins_root=str(tmp_path / "ins"),
                    vocal_root=str(tmp_path / "voc"), agg=7)
    assert len(loads) == 2

"""jaxpr -> ONNX export tests (C47, reference rvc/onnx/exporter.py role).

Round-trip oracle: models exported by tpu_rvc.ckpt.jax2onnx are re-loaded
with the dependency-free reader and executed by the jnp executor; outputs
must match the original JAX forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.ckpt.jax2onnx import (export_fn_to_onnx, export_synthesizer_onnx,
                                   export_hubert_onnx)
from tpu_rvc.models.onnx_exec import OnnxModule
from tpu_rvc.models.synthesizer import Synthesizer


def _roundtrip(tmp_path, fn, params, inputs, n_out=1):
    names = [f"in{i}" for i in range(len(inputs))]
    onames = [f"out{i}" for i in range(n_out)]
    data = export_fn_to_onnx(fn, params, inputs, names, onames)
    p = str(tmp_path / "m.onnx")
    open(p, "wb").write(data)
    mod = OnnxModule.from_file(p)
    got = mod(*[np.asarray(x) for x in inputs])
    jgot = mod.jit()(*[np.asarray(x) for x in inputs])  # whole-graph XLA
    want = fn(params, *inputs)
    got = got if isinstance(got, (list, tuple)) else [got]
    jgot = jgot if isinstance(jgot, (list, tuple)) else [jgot]
    want = want if isinstance(want, (list, tuple)) else [want]
    for g, j, w in zip(got, jgot, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=1e-5, atol=1e-5)
    return mod


def test_export_mixed_primitives(tmp_path, rng):
    W = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)

    def fn(W, x):
        y = jnp.tanh(x @ W) * jax.nn.sigmoid(x @ W)
        y = jnp.cumsum(y, axis=0)
        y = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
        y = jnp.pad(y, ((1, 0), (0, 0)))[:-1]
        return jnp.sum(y, axis=-1), jax.nn.softmax(y, axis=-1)

    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    _roundtrip(tmp_path, fn, W, [x], n_out=2)


def test_export_convs(tmp_path, rng):
    K = jnp.asarray(rng.standard_normal((5, 6, 12)) * 0.1, jnp.float32)
    Kg = jnp.asarray(rng.standard_normal((3, 2, 8)) * 0.1, jnp.float32)

    def fn(params, x, xg):
        K, Kg = params
        a = jax.lax.conv_general_dilated(
            x, K, (1,), [(2, 2)], dimension_numbers=("NWC", "WIO", "NWC"))
        b = jax.lax.conv_general_dilated(
            xg, Kg, (2,), [(3, 1)], rhs_dilation=(2,),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=4)
        return a, b

    x = jnp.asarray(rng.standard_normal((2, 20, 6)), jnp.float32)
    xg = jnp.asarray(rng.standard_normal((2, 30, 8)), jnp.float32)
    _roundtrip(tmp_path, fn, (K, Kg), [x, xg], n_out=2)


def test_export_gather_scatter(tmp_path, rng):
    E = jnp.asarray(rng.standard_normal((10, 4)), jnp.float32)

    def fn(E, idx, x):
        e = E[idx]  # embedding gather
        s = jnp.zeros((2, 6)).at[:, jnp.arange(3) * 2].add(x)  # scatter-add
        return e, s

    idx = jnp.asarray([1, 3], jnp.int32)
    x = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    _roundtrip(tmp_path, fn, E, [idx, x], n_out=2)


def _tiny_synth(use_f0=True, spk_embed_dim=3):
    return Synthesizer(
        spec_channels=65, segment_size=64, inter_channels=8,
        hidden_channels=8, filter_channels=16, n_heads=2, n_layers=1,
        kernel_size=3, p_dropout=0.0, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        upsample_rates=(4, 4), upsample_initial_channel=16,
        upsample_kernel_sizes=(8, 8), spk_embed_dim=spk_embed_dim,
        gin_channels=4, sr=16000, encoder_dim=24, use_f0=use_f0,
        weight_norm=False)


def test_synthesizer_onnx_parity(tmp_path, rng):
    syn = _tiny_synth()
    T = 12
    phone = jnp.asarray(rng.standard_normal((1, T, 24)), jnp.float32)
    pitch = jnp.asarray(rng.integers(1, 255, (1, T)), jnp.int32)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, T)), jnp.float32)
    sid = jnp.zeros((1,), jnp.int32)
    rnd = jnp.asarray(rng.standard_normal((1, T, 8)), jnp.float32)
    variables = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        phone, jnp.asarray([T]), sid, pitch, pitchf, method=syn.infer)

    p = str(tmp_path / "synth.onnx")
    export_synthesizer_onnx(syn, variables, T=T, path=p)
    mod = OnnxModule.from_file(p)
    assert mod.graph.inputs == ["phone", "phone_lengths", "pitch", "pitchf",
                                "ds", "rnd"]
    # static shapes advertised in the value infos
    assert mod.graph.input_info["phone"][1] == (1, T, 24)
    # integer inputs declared int64 like the reference exporter's consumer
    # (rvc/onnx/infer.py:60-66 feeds int64); entry Cast narrows to int32
    for n in ("phone_lengths", "pitch", "ds"):
        assert mod.graph.input_info[n][0] == 7, n  # TensorProto.INT64

    # feed int64 exactly as the reference consumer does
    got = np.asarray(mod(np.asarray(phone), np.asarray([T], np.int64),
                         np.asarray(pitch, np.int64), np.asarray(pitchf),
                         np.asarray(sid, np.int64), np.asarray(rnd)))
    want = np.asarray(syn.apply(variables, phone, jnp.asarray([T]), sid,
                                pitch, pitchf, noise=rnd, noise_scale=1.0,
                                deterministic=True, method=syn.infer))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_onnx_rvc_forward(tmp_path, rng):
    """Exported graph consumed by the OnnxRVC wrapper
    (reference rvc/onnx/infer.py:97-118 `forward`: int16 * 32767)."""
    from tpu_rvc.pipeline.onnx_infer import OnnxRVC

    syn = _tiny_synth()
    T = 10
    variables = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 24)), jnp.asarray([T]), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)), method=syn.infer)

    onnx_path = str(tmp_path / "tiny.onnx")
    export_synthesizer_onnx(syn, variables, T=T, path=onnx_path)
    rvc = OnnxRVC(onnx_path, hop_len=160, model_sr=16000)
    assert rvc.t_model == T
    feats = rng.standard_normal((1, T, 24)).astype(np.float32)
    pitch = rng.integers(1, 255, (1, T))
    pitchf = (100 + 50 * rng.random((1, T))).astype(np.float32)
    rnd = rng.standard_normal((1, T, 8)).astype(np.float32)
    out = rvc.forward(feats, T, pitch, pitchf, np.asarray([0]), rnd)
    assert out.dtype == np.int16
    assert out.shape[0] == T * 16  # upp = 4*4


def test_export_onnx_from_pth(tmp_path, rng):
    """The reference CLI surface (rvc/onnx/exporter.py:6 export_onnx):
    small-model .pth in, .onnx out."""
    from tpu_rvc.ckpt.convert import state_dict_from_synthesizer_params
    from tpu_rvc.ckpt.torch_pth import save_pth, load_pth
    from tpu_rvc.ckpt.export import export_onnx

    syn = Synthesizer(
        spec_channels=65, segment_size=64, inter_channels=8,
        hidden_channels=8, filter_channels=16, n_heads=2, n_layers=1,
        kernel_size=3, p_dropout=0.0, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        upsample_rates=(4, 4), upsample_initial_channel=16,
        upsample_kernel_sizes=(8, 8), spk_embed_dim=3, gin_channels=4,
        sr=16000, encoder_dim=256, use_f0=True, weight_norm=False)
    T = 8
    variables = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 256)), jnp.asarray([T]), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)), method=syn.infer)
    sd = state_dict_from_synthesizer_params(
        jax.tree.map(np.asarray, variables["params"]),
        use_f0=True, num_kernels=1)
    config = [65, 64, 8, 8, 16, 2, 1, 3, 0.0, "1", [3], [[1, 3, 5]],
              [4, 4], 16, [8, 8], 3, 4, 16000]
    pth = str(tmp_path / "tiny_v1.pth")
    save_pth({"weight": sd, "config": config, "f0": 1, "version": "v1",
              "sr": "40k"}, pth)

    out = str(tmp_path / "tiny_v1.onnx")
    assert export_onnx(pth, out, T=T) == "Finished"
    mod = OnnxModule.from_file(out)
    assert mod.graph.inputs[0] == "phone"
    y = mod(rng.standard_normal((1, T, 256)).astype(np.float32),
            np.asarray([T], np.int32),
            rng.integers(1, 255, (1, T)).astype(np.int32),
            (100 + 50 * rng.random((1, T))).astype(np.float32),
            np.zeros((1,), np.int32),
            rng.standard_normal((1, T, 8)).astype(np.float32))
    assert np.asarray(y).shape == (1, T * 16, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_hubert_onnx_tiny(tmp_path, rng):
    """ContentVec-equivalent export (vec-768 onnx asset role)."""
    from tpu_rvc.models.hubert import Hubert

    hub = Hubert(output_layer=2, final_proj=False, embed=32, ffn_dim=64,
                 n_heads=4, final_dim=16, pos_conv_k=16, pos_conv_groups=4,
                 conv_layers=((16, 10, 5), (32, 8, 4), (32, 4, 2),
                              (32, 4, 2), (32, 4, 2)))
    wav = jnp.asarray(rng.standard_normal((1, 3200)) * 0.1, jnp.float32)
    variables = hub.init(jax.random.PRNGKey(0), wav)
    p = str(tmp_path / "vec.onnx")
    export_hubert_onnx(hub, variables, n_samples=3200, path=p)
    mod = OnnxModule.from_file(p)
    got = np.asarray(mod(np.asarray(wav)))
    want = np.asarray(hub.apply(variables, wav))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_synthesizer_onnx_spkmix(tmp_path, rng):
    """Speaker-mix export (reference spkmixmap, rvc/onnx/synthesizer.py:60):
    ds becomes per-frame float mixing weights over the embedding table.
    A one-hot mix must reproduce the plain single-speaker graph, and a
    2-speaker morph must run and differ from both endpoints."""
    from tpu_rvc.pipeline.onnx_infer import OnnxRVC

    syn = _tiny_synth(spk_embed_dim=2)
    T = 12
    phone = jnp.asarray(rng.standard_normal((1, T, 24)), jnp.float32)
    pitch = jnp.asarray(rng.integers(1, 255, (1, T)), jnp.int32)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, T)), jnp.float32)
    rnd = jnp.asarray(rng.standard_normal((1, T, 8)), jnp.float32)
    variables = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        phone, jnp.asarray([T]), jnp.zeros((1,), jnp.int32), pitch, pitchf,
        method=syn.infer)

    p = str(tmp_path / "mix.onnx")
    export_synthesizer_onnx(syn, variables, T=T, path=p, spk_mix=True)
    mod = OnnxModule.from_file(p)
    # ds declared float (1, T, n_speakers)
    assert mod.graph.input_info["ds"][1] == (1, T, 2)

    def run(mix):
        return np.asarray(mod(np.asarray(phone), np.asarray([T], np.int64),
                              np.asarray(pitch, np.int64),
                              np.asarray(pitchf),
                              np.asarray(mix, np.float32),
                              np.asarray(rnd)))

    onehot0 = np.zeros((1, T, 2), np.float32); onehot0[..., 0] = 1
    onehot1 = np.zeros((1, T, 2), np.float32); onehot1[..., 1] = 1
    out0 = run(onehot0)
    out1 = run(onehot1)
    # one-hot == the plain single-speaker inference path
    want0 = np.asarray(syn.apply(
        variables, phone, jnp.asarray([T]), jnp.zeros((1,), jnp.int32),
        pitch, pitchf, noise=rnd, noise_scale=1.0, deterministic=True,
        method=syn.infer))
    np.testing.assert_allclose(out0, want0, atol=2e-5)
    assert np.abs(out0 - out1).max() > 1e-4  # speakers differ

    # mid-utterance morph: first half speaker 0, second half speaker 1
    morph = np.concatenate([onehot0[:, :T // 2], onehot1[:, T // 2:]],
                           axis=1)
    outm = run(morph)
    assert outm.shape == out0.shape
    assert np.isfinite(outm).all()
    assert np.abs(outm - out0).max() > 1e-5
    assert np.abs(outm - out1).max() > 1e-5

    # OnnxRVC detects the mix contract and feeds ds as float
    rvc = OnnxRVC(p, hop_len=20, model_sr=800)
    assert rvc.spk_mix and rvc.n_speakers == 2
    out = rvc.forward(np.asarray(phone), T, np.asarray(pitch),
                      np.asarray(pitchf), morph, np.asarray(rnd))
    assert out.dtype == np.int16
    # forward() runs the whole-graph XLA jit; run() above used the per-op
    # executor — allow 1 LSB of int16 rounding skew between the two
    want = (outm.reshape(-1) * 32767).astype(np.int16)
    assert np.abs(out.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_synthesizer_onnx_reference_layout(tmp_path, rng):
    """reference_layout=True emits the torch exporter's EXACT wire
    contract (rvc/onnx/exporter.py:6-51): input names/order, tensor
    layouts (rnd channel-first (1, 192, T), audio (1, 1, samples)),
    int64 integer inputs, and its dynamic-axis annotations (phone dim 1,
    pitch dim 1, pitchf dim 1, rnd dim 2 — exporter.py:40-45), so
    existing RVC ONNX consumers are drop-in."""
    syn = _tiny_synth()
    T = 12
    phone = jnp.asarray(rng.standard_normal((1, T, 24)), jnp.float32)
    pitch = jnp.asarray(rng.integers(1, 255, (1, T)), jnp.int32)
    pitchf = jnp.asarray(100 + 50 * rng.random((1, T)), jnp.float32)
    sid = jnp.zeros((1,), jnp.int32)
    rnd_cl = jnp.asarray(rng.standard_normal((1, T, 8)), jnp.float32)
    variables = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        phone, jnp.asarray([T]), sid, pitch, pitchf, method=syn.infer)

    p = str(tmp_path / "synth_ref.onnx")
    export_synthesizer_onnx(syn, variables, T=T, path=p,
                            reference_layout=True)
    mod = OnnxModule.from_file(p)

    # exact input names AND order (exporter.py:24 input_names)
    assert mod.graph.inputs == ["phone", "phone_lengths", "pitch", "pitchf",
                                "ds", "rnd"]
    assert mod.graph.outputs == ["audio"]

    # shapes with the reference's dynamic-axis annotations: a dim_param
    # string at each dynamic position, concrete ints elsewhere
    info = mod.graph.input_info
    assert info["phone"][1][0] == 1 and info["phone"][1][2] == 24
    assert isinstance(info["phone"][1][1], str)          # phone: [1]
    assert isinstance(info["pitch"][1][1], str)          # pitch: [1]
    assert isinstance(info["pitchf"][1][1], str)         # pitchf: [1]
    assert info["rnd"][1][:2] == (1, 8)                  # channel-FIRST
    assert isinstance(info["rnd"][1][2], str)            # rnd: [2]
    assert info["phone_lengths"][1] == (1,)
    assert info["ds"][1] == (1,)
    # int64 declarations (consumer rvc/onnx/infer.py:60-88 feeds int64)
    for n in ("phone_lengths", "pitch", "ds"):
        assert info[n][0] == 7, n  # TensorProto.INT64

    # numeric parity: channel-first rnd in, (1, 1, samples) audio out
    rnd_cf = np.transpose(np.asarray(rnd_cl), (0, 2, 1))
    got = np.asarray(mod(np.asarray(phone), np.asarray([T], np.int64),
                         np.asarray(pitch, np.int64), np.asarray(pitchf),
                         np.asarray(sid, np.int64), rnd_cf))
    want = np.asarray(syn.apply(variables, phone, jnp.asarray([T]), sid,
                                pitch, pitchf, noise=rnd_cl, noise_scale=1.0,
                                deterministic=True, method=syn.infer))
    assert got.shape == (1, 1, want.shape[1])  # torch dec layout
    np.testing.assert_allclose(got[0, 0], want[0, :, 0], atol=2e-5)

    # spk_mix has no reference layout — must refuse, not silently diverge
    import pytest
    with pytest.raises(ValueError):
        export_synthesizer_onnx(syn, variables, T=T, spk_mix=True,
                                reference_layout=True)

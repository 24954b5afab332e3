"""AOT model export (reference rvc/jit/ TorchScript-export role, C46; and
the rvc/onnx/ exporter surface, C47).

The reference pickles TorchScript traces to cut warm-start latency
(rvc/jit/jit.py:32-77).  The TPU-native equivalent is jax.export: the jitted
inference graph is lowered + serialized to StableHLO once, then reloaded and
invoked without retracing.  Exports are device-tagged like the reference's
.jit bundles.

ONNX export (reference rvc/onnx/exporter.py) requires the `onnx` package,
which is not bundled here; `export_onnx` keeps the API and raises with
instructions when onnx is unavailable.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_synthesizer_stablehlo(
    synth, variables, *, T: int = 200, use_f0: bool = True,
    noise_scale: float = 0.66666,
) -> bytes:
    """Serialize the synthesizer inference graph (StableHLO) + weights."""
    from jax import export as jexport

    encoder_dim = synth.encoder_dim

    def infer(variables, phone, lengths, sid, pitch, pitchf, key):
        return synth.apply(variables, phone, lengths, sid, pitch, pitchf,
                           noise_scale=noise_scale, method=synth.infer,
                           rngs={"noise": key})

    args = (
        variables,
        jnp.zeros((1, T, encoder_dim), jnp.float32),
        jnp.asarray([T]),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T), jnp.int32),
        jnp.zeros((1, T), jnp.float32),
        jax.random.PRNGKey(0),
    )
    exported = jexport.export(jax.jit(infer))(*args)
    payload = {
        "format": "tpu_rvc.stablehlo.v1",
        "device": jax.devices()[0].platform,
        "T": T,
        "use_f0": use_f0,
        "serialized": exported.serialize(),
        "variables": jax.tree.map(np.asarray, variables),
    }
    buf = io.BytesIO()
    pickle.dump(payload, buf, protocol=4)
    return buf.getvalue()


def save_exported(synth, variables, path: str, **kw) -> str:
    data = export_synthesizer_stablehlo(synth, variables, **kw)
    with open(path, "wb") as f:
        f.write(data)
    return path


class LoadedExport:
    """Callable rehydrated from a serialized export (no retracing)."""

    def __init__(self, payload: Dict[str, Any]):
        from jax import export as jexport

        self.meta = {k: payload[k] for k in ("format", "device", "T", "use_f0")}
        self._exported = jexport.deserialize(payload["serialized"])
        self.variables = jax.tree.map(jnp.asarray, payload["variables"])

    def __call__(self, phone, lengths, sid, pitch, pitchf, key):
        return self._exported.call(self.variables, phone, lengths, sid,
                                   pitch, pitchf, key)


def load_exported(path: str) -> LoadedExport:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") != "tpu_rvc.stablehlo.v1":
        raise ValueError("not a tpu_rvc export")
    return LoadedExport(payload)


def export_onnx(model_path: str, out_path: str, T: int = 200,
                spk_mix: bool = False,
                reference_layout: bool = False) -> str:
    """Export an RVC small model to ONNX (reference rvc/onnx/exporter.py:6).

    Torch-free and onnx-package-free: the `.pth` is read by the native
    pickle reader, the synthesizer inference graph is traced to a jaxpr and
    serialized via tpu_rvc.ckpt.jax2onnx (opset 17, same I/O contract as the
    reference export: phone/phone_lengths/pitch/pitchf/ds/rnd -> audio,
    with `rnd` channel-last by default; reference_layout=True exports the
    torch exporter's exact tensor layouts — rnd (1, 192, T), audio
    (1, 1, samples) — plus its dynamic-axis annotations, for drop-in use
    by existing RVC ONNX consumers).  The graph is static at `T` frames —
    export per length bucket for other sizes."""
    from tpu_rvc.models.loader import load_synthesizer
    from tpu_rvc.ckpt.jax2onnx import export_synthesizer_onnx

    synth, variables, _meta = load_synthesizer(model_path)
    export_synthesizer_onnx(synth, variables, T=T, path=out_path,
                            spk_mix=spk_mix,
                            reference_layout=reference_layout)
    return "Finished"

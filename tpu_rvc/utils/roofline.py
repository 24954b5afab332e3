"""FLOP / MFU accounting — the roofline denominator for every perf artifact.

The reference publishes no quantitative numbers at all (SURVEY.md §6), so
wall-clock RTF alone can't say whether the remaining headroom on a path is
reachable or structural.  Each benchmark therefore records, next to its
walls, the XLA-counted FLOPs of the dispatched graph, the achieved TFLOP/s,
and the model-FLOPs-utilization against the chip's bf16 peak.

FLOPs come from XLA's client-side HLO cost analysis
(`jitted.lower(*args).cost_analysis()["flops"]`) — no device round trip and
no recompile; matmul/conv FLOPs are exact (2·M·K·N), elementwise ops are
counted once per output element.  This is the conventional MFU numerator
(model FLOPs, not hardware FLOPs: rematerialization or padding the compiler
adds is NOT credited).
"""

from typing import Any, Dict, Optional

import jax

# bf16 MXU peak per chip, TFLOP/s.  Keyed by device_kind prefix; override
# with TPU_RVC_PEAK_TFLOPS when the attachment reports an unknown kind.
# v4/v5e/v5p/v6e figures are the published per-chip bf16 peaks.
PEAK_BF16_TFLOPS = (
    ("TPU v6", 918.0),   # v6e (Trillium)
    ("TPU v5p", 459.0),
    ("TPU v5 lite", 197.0),
    ("TPU v5e", 197.0),
    ("TPU v5", 197.0),   # bare "TPU v5" device_kind is the lite/e variant
    ("TPU v4", 275.0),
    ("TPU v3", 123.0),
    ("TPU v2", 45.0),
)


def device_peak_tflops() -> Optional[float]:
    """bf16 peak of device 0, or None off-TPU/unknown kind."""
    import os

    env = os.environ.get("TPU_RVC_PEAK_TFLOPS")
    if env:
        return float(env)
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return None
    kind = getattr(dev, "device_kind", "")
    for prefix, peak in PEAK_BF16_TFLOPS:
        if kind.startswith(prefix):
            return peak
    return None


def graph_flops(fn, *args) -> Optional[float]:
    """Total FLOPs of one invocation of `fn` at these argument shapes.

    `fn` may be a jitted function, an AOTGraphCache wrapper (its `.jitted`
    attribute is used), or a plain python callable (jitted here for the
    lowering only).  Returns None when cost analysis is unavailable.

    The remote-attached TPU backend (axon) returns None from
    `lowered.cost_analysis()` (no client-side HLO analysis), so when the
    native lowering yields nothing the same function is re-lowered for
    the always-present CPU backend — the numerator is a property of the
    traced HLO (2·M·K·N matmul/conv FLOPs, one per output element for
    elementwise), not of the executing chip, so the count is identical.

    Two subtleties in the CPU fallback (both found the hard way — the
    bench graphs all contain the Pallas banded-attention kernel on TPU):
      * it re-traces from the RAW python callable (`__wrapped__`), not
        through the jitted wrapper: tracing through the inner jit replays
        its cached TPU jaxpr, pallas_call(interpret=False) included, and
        a TPU pallas_call cannot lower for the CPU backend;
      * the re-trace runs under `nn.attention.FORCE_XLA_ATTENTION`, which
        makes `pallas_attention()` blocks inside the graph a no-op so the
        kernels are swapped for their exact XLA formulations (the dense
        rel-attention upper-bounds the banded kernel's FLOPs by <1% of
        any conv-dominated graph total here)."""
    target = getattr(fn, "jitted", fn)

    def _flops_of(lowered) -> Optional[float]:
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):  # one entry per device
            ca = ca[0]
        if ca is not None and "flops" in ca:
            return float(ca["flops"])
        return None

    try:  # native lowering (works on CPU; None on the remote axon TPU)
        t = target if hasattr(target, "lower") else jax.jit(target)
        flops = _flops_of(t.lower(*args))
        if flops is not None:
            return flops
    except Exception:
        pass
    from tpu_rvc.nn import attention as _att
    raw = getattr(target, "__wrapped__", target)

    def _fresh(*a):
        # fresh function identity: jax's tracing cache is keyed on the
        # callable, so re-jitting `raw` itself would replay the jaxpr the
        # first attempt traced — pallas_call(interpret=False) included —
        # without ever consulting FORCE_XLA_ATTENTION
        return raw(*a)

    prev = _att.FORCE_XLA_ATTENTION
    _att.FORCE_XLA_ATTENTION = True
    try:
        return _flops_of(jax.jit(_fresh, backend="cpu").lower(*args))
    except Exception:
        return None
    finally:
        _att.FORCE_XLA_ATTENTION = prev


def mfu_fields(flops: Optional[float], seconds: float,
               peak_tflops: Optional[float] = None,
               prefix: str = "") -> Dict[str, Any]:
    """The three roofline fields every artifact block carries.

    seconds is the AMORTIZED per-item wall (the pipelined steady state) —
    dispatch-inclusive walls would bill tunnel RTT to the chip."""
    if peak_tflops is None:
        peak_tflops = device_peak_tflops()
    out: Dict[str, Any] = {prefix + "flops_per_item": flops}
    if flops is None or seconds <= 0:
        out[prefix + "achieved_tflops"] = None
        out[prefix + "mfu_pct"] = None
        return out
    achieved = flops / seconds / 1e12
    out[prefix + "achieved_tflops"] = round(achieved, 3)
    out[prefix + "mfu_pct"] = (round(100.0 * achieved / peak_tflops, 2)
                               if peak_tflops else None)
    return out

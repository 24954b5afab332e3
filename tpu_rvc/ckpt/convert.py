"""state_dict <-> flax-params conversion for the synthesizer.

RVC's model zoo is torch `.pth` "small models" whose `weight` dict uses the
reference module names (rvc/layers/*).  This converter maps those names onto
tpu_rvc's flax tree (and back, for exporting models the reference stack can
load).  Layout rules:

  Conv1d          torch (out, in, k)   -> ours (k, in, out)     [transpose]
  ConvTranspose1d torch (in, out, k)   -> ours (k, in, out), k flipped
  Linear          torch (out, in)      -> ours (in, out)
  Embedding / LayerNorm / rel-embeddings: unchanged

Weight-norm: accepts both legacy `*.weight_g/weight_v` and torch>=2.1
`*.parametrizations.weight.original0/original1` (the reference migrates these
at infer/lib/train/utils.py:33-73).  With fold_weight_norm=True the (g, v)
pair is folded to a plain kernel for the inference graph.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _conv_w(w):  # torch conv1d weight -> (k, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convT_w(w):  # torch convtranspose1d weight -> (k, in, out), flipped k
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))


def _fold(g, v, axis_keep):
    axes = tuple(i for i in range(v.ndim) if i != axis_keep % v.ndim)
    return g * v / np.sqrt((v * v).sum(axis=axes, keepdims=True))


def normalize_weight_norm_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map parametrizations.weight.original{0,1} -> weight_{g,v}."""
    out = {}
    for k, v in sd.items():
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        out[k] = v
    return out


class _SD:
    """state_dict accessor that tracks consumed keys."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used = set()

    def __contains__(self, k):
        return k in self.sd

    def get(self, k):
        self.used.add(k)
        return np.asarray(self.sd[k])

    def remaining(self):
        return [k for k in self.sd if k not in self.used]


def _conv(sd: _SD, prefix: str, *, transposed=False, fold=True,
          bias=True) -> Dict[str, np.ndarray]:
    """Convert one conv, handling optional weight-norm."""
    out = {}
    wkey, gkey, vkey = f"{prefix}.weight", f"{prefix}.weight_g", f"{prefix}.weight_v"
    conv_fn = _convT_w if transposed else _conv_w
    if vkey in sd:
        g, v = sd.get(gkey), sd.get(vkey)
        if transposed:
            # torch g: (in,1,1); our v: (k,in,out) -> keep axis 1
            g_ours = np.transpose(g, (2, 0, 1))  # (1, in, 1)
            v_ours = conv_fn(v)
            if fold:
                out["kernel"] = _fold(g_ours, v_ours, 1)
            else:
                out["g"], out["v"] = g_ours, v_ours
        else:
            g_ours = np.transpose(g, (2, 1, 0))  # (1, 1, out)
            v_ours = conv_fn(v)
            if fold:
                out["kernel"] = _fold(g_ours, v_ours, 2)
            else:
                out["g"], out["v"] = g_ours, v_ours
    else:
        out["kernel"] = conv_fn(sd.get(wkey))
    bkey = f"{prefix}.bias"
    if bias and bkey in sd:
        out["bias"] = sd.get(bkey)
    return out


def _linear(sd: _SD, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd.get(f"{prefix}.weight").T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd.get(f"{prefix}.bias")
    return out


def _norm(sd: _SD, prefix: str) -> Dict[str, np.ndarray]:
    return {"gamma": sd.get(f"{prefix}.gamma"), "beta": sd.get(f"{prefix}.beta")}


def _wn_block(sd: _SD, prefix: str, n_layers: int, gin: bool,
              fold: bool) -> Dict[str, Any]:
    out = {}
    if gin and f"{prefix}.cond_layer.weight_v" in sd or \
       gin and f"{prefix}.cond_layer.weight" in sd:
        out["cond_layer"] = _conv(sd, f"{prefix}.cond_layer", fold=fold)
    for i in range(n_layers):
        out[f"in_{i}"] = _conv(sd, f"{prefix}.in_layers.{i}", fold=fold)
        out[f"res_skip_{i}"] = _conv(sd, f"{prefix}.res_skip_layers.{i}", fold=fold)
    return out


def synthesizer_params_from_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    n_layers: int = 6,
    n_flows: int = 4,
    n_ups: Optional[int] = None,
    num_kernels: int = 3,
    use_f0: bool = True,
    has_enc_q: bool = False,
    fold_weight_norm: bool = True,
    strict: bool = True,
) -> Dict[str, Any]:
    """Reference synthesizer state_dict -> flax params['params'] tree."""
    sd = _SD(normalize_weight_norm_keys(sd))
    fold = fold_weight_norm
    p: Dict[str, Any] = {}

    # --- enc_p -------------------------------------------------------------
    enc_p: Dict[str, Any] = {
        "emb_phone": _linear(sd, "enc_p.emb_phone"),
        "proj": _conv(sd, "enc_p.proj"),
    }
    if use_f0:
        enc_p["emb_pitch"] = sd.get("enc_p.emb_pitch.weight")
    encoder: Dict[str, Any] = {}
    for i in range(n_layers):
        a = f"enc_p.encoder.attn_layers.{i}"
        encoder[f"attn_{i}"] = {
            "conv_q": _conv(sd, f"{a}.conv_q"),
            "conv_k": _conv(sd, f"{a}.conv_k"),
            "conv_v": _conv(sd, f"{a}.conv_v"),
            "conv_o": _conv(sd, f"{a}.conv_o"),
            "emb_rel_k": sd.get(f"{a}.emb_rel_k"),
            "emb_rel_v": sd.get(f"{a}.emb_rel_v"),
        }
        encoder[f"norm1_{i}"] = _norm(sd, f"enc_p.encoder.norm_layers_1.{i}")
        encoder[f"ffn_{i}"] = {
            "conv_1": _conv(sd, f"enc_p.encoder.ffn_layers.{i}.conv_1"),
            "conv_2": _conv(sd, f"enc_p.encoder.ffn_layers.{i}.conv_2"),
        }
        encoder[f"norm2_{i}"] = _norm(sd, f"enc_p.encoder.norm_layers_2.{i}")
    enc_p["encoder"] = encoder
    p["enc_p"] = enc_p

    # --- flow ----------------------------------------------------------------
    flow: Dict[str, Any] = {}
    for i in range(n_flows):
        t = f"flow.flows.{i * 2}"
        flow[f"flow_{i}"] = {
            "pre": _conv(sd, f"{t}.pre"),
            "post": _conv(sd, f"{t}.post"),
            "enc": _wn_block(sd, f"{t}.enc", 3, True, fold),
        }
    p["flow"] = flow

    # --- dec -----------------------------------------------------------------
    if n_ups is None:
        n_ups = 0
        while f"dec.ups.{n_ups}.weight_v" in sd.sd or \
              f"dec.ups.{n_ups}.weight" in sd.sd:
            n_ups += 1
    dec: Dict[str, Any] = {
        "conv_pre": _conv(sd, "dec.conv_pre"),
        "conv_post": _conv(sd, "dec.conv_post", bias=False),
    }
    if "dec.cond.weight" in sd.sd:
        dec["cond"] = _conv(sd, "dec.cond")
    for i in range(n_ups):
        dec[f"up_{i}"] = _conv(sd, f"dec.ups.{i}", transposed=True, fold=fold)
        if use_f0:
            dec[f"noise_conv_{i}"] = _conv(sd, f"dec.noise_convs.{i}")
        for j in range(num_kernels):
            n = i * num_kernels + j
            rb = {}
            for m in range(3):
                rb[f"c1_{m}"] = _conv(sd, f"dec.resblocks.{n}.convs1.{m}", fold=fold)
                rb[f"c2_{m}"] = _conv(sd, f"dec.resblocks.{n}.convs2.{m}", fold=fold)
            dec[f"resblock_{i}_{j}"] = rb
    if use_f0:
        dec["m_source"] = {"l_linear": _linear(sd, "dec.m_source.l_linear")}
    p["dec"] = dec

    # --- enc_q (training ckpts only) ------------------------------------------
    if has_enc_q and "enc_q.pre.weight" in sd.sd:
        p["enc_q"] = {
            "pre": _conv(sd, "enc_q.pre"),
            "proj": _conv(sd, "enc_q.proj"),
            "enc": _wn_block(sd, "enc_q.enc", 16, True, fold),
        }

    p["emb_g"] = {"embedding": sd.get("emb_g.weight")}

    if strict:
        leftover = [k for k in sd.remaining() if not k.startswith("enc_q.")]
        if leftover:
            raise KeyError(f"unconsumed state_dict keys: {leftover[:8]}"
                           f"{'...' if len(leftover) > 8 else ''}")
    return p


# ---------------------------------------------------------------------------
# Reverse: flax params -> reference-style state_dict (legacy weight_g/v names)
# ---------------------------------------------------------------------------


def _conv_back(tree: Dict[str, np.ndarray], prefix: str, out: Dict[str, np.ndarray],
               transposed=False):
    if "v" in tree:
        v, g = np.asarray(tree["v"]), np.asarray(tree["g"])
        if transposed:
            out[f"{prefix}.weight_v"] = np.ascontiguousarray(
                np.transpose(v, (1, 2, 0))[:, :, ::-1])
            out[f"{prefix}.weight_g"] = np.transpose(g, (1, 2, 0))
        else:
            out[f"{prefix}.weight_v"] = np.ascontiguousarray(
                np.transpose(v, (2, 1, 0)))
            out[f"{prefix}.weight_g"] = np.transpose(g, (2, 1, 0))
    else:
        k = np.asarray(tree["kernel"])
        if transposed:
            out[f"{prefix}.weight"] = np.ascontiguousarray(
                np.transpose(k, (1, 2, 0))[:, :, ::-1])
        else:
            out[f"{prefix}.weight"] = np.ascontiguousarray(
                np.transpose(k, (2, 1, 0)))
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def state_dict_from_synthesizer_params(
    params: Dict[str, Any], *, use_f0: bool = True, num_kernels: int = 3,
) -> Dict[str, np.ndarray]:
    """flax params tree -> reference-compatible state_dict."""
    p = params.get("params", params)
    out: Dict[str, np.ndarray] = {}

    enc_p = p["enc_p"]
    out["enc_p.emb_phone.weight"] = np.ascontiguousarray(
        np.asarray(enc_p["emb_phone"]["kernel"]).T)
    out["enc_p.emb_phone.bias"] = np.asarray(enc_p["emb_phone"]["bias"])
    if use_f0 and "emb_pitch" in enc_p:
        out["enc_p.emb_pitch.weight"] = np.asarray(enc_p["emb_pitch"])
    enc = enc_p["encoder"]
    n_layers = sum(1 for k in enc if k.startswith("attn_"))
    for i in range(n_layers):
        a = enc[f"attn_{i}"]
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _conv_back(a[nm], f"enc_p.encoder.attn_layers.{i}.{nm}", out)
        out[f"enc_p.encoder.attn_layers.{i}.emb_rel_k"] = np.asarray(a["emb_rel_k"])
        out[f"enc_p.encoder.attn_layers.{i}.emb_rel_v"] = np.asarray(a["emb_rel_v"])
        for src, dst in ((f"norm1_{i}", f"norm_layers_1.{i}"),
                         (f"norm2_{i}", f"norm_layers_2.{i}")):
            out[f"enc_p.encoder.{dst}.gamma"] = np.asarray(enc[src]["gamma"])
            out[f"enc_p.encoder.{dst}.beta"] = np.asarray(enc[src]["beta"])
        _conv_back(enc[f"ffn_{i}"]["conv_1"],
                   f"enc_p.encoder.ffn_layers.{i}.conv_1", out)
        _conv_back(enc[f"ffn_{i}"]["conv_2"],
                   f"enc_p.encoder.ffn_layers.{i}.conv_2", out)
    _conv_back(enc_p["proj"], "enc_p.proj", out)

    for i, (name, tree) in enumerate(sorted(p["flow"].items())):
        t = f"flow.flows.{i * 2}"
        _conv_back(tree["pre"], f"{t}.pre", out)
        _conv_back(tree["post"], f"{t}.post", out)
        wn = tree["enc"]
        if "cond_layer" in wn:
            _conv_back(wn["cond_layer"], f"{t}.enc.cond_layer", out)
        for m in range(3):
            _conv_back(wn[f"in_{m}"], f"{t}.enc.in_layers.{m}", out)
            _conv_back(wn[f"res_skip_{m}"], f"{t}.enc.res_skip_layers.{m}", out)

    dec = p["dec"]
    _conv_back(dec["conv_pre"], "dec.conv_pre", out)
    _conv_back(dec["conv_post"], "dec.conv_post", out)
    if "cond" in dec:
        _conv_back(dec["cond"], "dec.cond", out)
    n_ups = sum(1 for k in dec if k.startswith("up_"))
    for i in range(n_ups):
        _conv_back(dec[f"up_{i}"], f"dec.ups.{i}", out, transposed=True)
        if use_f0 and f"noise_conv_{i}" in dec:
            _conv_back(dec[f"noise_conv_{i}"], f"dec.noise_convs.{i}", out)
        for j in range(num_kernels):
            n = i * num_kernels + j
            rb = dec[f"resblock_{i}_{j}"]
            for m in range(3):
                _conv_back(rb[f"c1_{m}"], f"dec.resblocks.{n}.convs1.{m}", out)
                _conv_back(rb[f"c2_{m}"], f"dec.resblocks.{n}.convs2.{m}", out)
    if use_f0 and "m_source" in dec:
        out["dec.m_source.l_linear.weight"] = np.ascontiguousarray(
            np.asarray(dec["m_source"]["l_linear"]["kernel"]).T)
        out["dec.m_source.l_linear.bias"] = np.asarray(
            dec["m_source"]["l_linear"]["bias"])

    if "enc_q" in p:
        q = p["enc_q"]
        _conv_back(q["pre"], "enc_q.pre", out)
        _conv_back(q["proj"], "enc_q.proj", out)
        wn = q["enc"]
        if "cond_layer" in wn:
            _conv_back(wn["cond_layer"], "enc_q.enc.cond_layer", out)
        for m in range(16):
            _conv_back(wn[f"in_{m}"], f"enc_q.enc.in_layers.{m}", out)
            _conv_back(wn[f"res_skip_{m}"], f"enc_q.enc.res_skip_layers.{m}", out)

    out["emb_g.weight"] = np.asarray(p["emb_g"]["embedding"])
    return out


# ---------------------------------------------------------------------------
# Discriminator (MPD) conversion — for warm-starting from the reference's
# pretrained D checkpoints (f0D40k.pth etc.; rvc/layers/discriminators.py)
# ---------------------------------------------------------------------------

_V1_PERIODS = (2, 3, 5, 7, 11, 17)
_V2_PERIODS = (2, 3, 5, 7, 11, 17, 23, 37)


def _conv2d_wn(sd: "_SD", prefix: str):
    """torch weight-norm Conv2d (out,in,kh,kw) -> our named params
    {g: (1,1,1,out), v: (kh,kw,in,out), bias}."""
    g = sd.get(f"{prefix}.weight_g")
    v = sd.get(f"{prefix}.weight_v")
    b = sd.get(f"{prefix}.bias")
    return (np.transpose(g, (1, 2, 3, 0)),
            np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0))), b)


def discriminator_params_from_state_dict(sd, version: str = "v2"):
    """Reference MultiPeriodDiscriminator state_dict -> flax params tree.

    Reference layout: discriminators.0 = DiscriminatorS (Conv1d stack),
    discriminators.{i>=1} = DiscriminatorP(period) (Conv2d (k,1) stacks).
    Our layout (nn/discriminators.py): disc_s / disc_p{period} with
    per-conv named params conv_{i}_{g,v,bias} in NHWC/HWIO.
    """
    sd = _SD(normalize_weight_norm_keys(sd))
    periods = _V2_PERIODS if version == "v2" else _V1_PERIODS
    p = {}

    # DiscriminatorS: torch Conv1d (out, in/groups, k) -> (k, 1, in/g, out)
    ds = {}
    for i in range(6):
        pre = f"discriminators.0.convs.{i}"
        g = sd.get(f"{pre}.weight_g")       # (out, 1, 1)
        v = sd.get(f"{pre}.weight_v")       # (out, in/g, k)
        ds[f"conv_{i}_g"] = np.transpose(g, (1, 2, 0))[None]      # (1,1,1,out)
        ds[f"conv_{i}_v"] = np.ascontiguousarray(
            np.transpose(v, (2, 1, 0)))[:, None]                  # (k,1,in/g,out)
        ds[f"conv_{i}_bias"] = sd.get(f"{pre}.bias")
    g, v, b = _conv2d_wn_from_1d(sd, "discriminators.0.conv_post")
    ds["conv_post_g"], ds["conv_post_v"], ds["conv_post_bias"] = g, v, b
    p["disc_s"] = ds

    for j, period in enumerate(periods, start=1):
        dp = {}
        for i in range(5):
            g, v, b = _conv2d_wn(sd, f"discriminators.{j}.convs.{i}")
            dp[f"conv_{i}_g"], dp[f"conv_{i}_v"], dp[f"conv_{i}_bias"] = g, v, b
        g, v, b = _conv2d_wn(sd, f"discriminators.{j}.conv_post")
        dp["conv_post_g"], dp["conv_post_v"], dp["conv_post_bias"] = g, v, b
        p[f"disc_p{period}"] = dp
    return p


def _conv2d_wn_from_1d(sd: "_SD", prefix: str):
    """torch weight-norm Conv1d (out,in,k) -> 2D (k,1,in,out) params."""
    g = sd.get(f"{prefix}.weight_g")   # (out,1,1)
    v = sd.get(f"{prefix}.weight_v")   # (out,in,k)
    b = sd.get(f"{prefix}.bias")
    return (np.transpose(g, (1, 2, 0))[None],
            np.ascontiguousarray(np.transpose(v, (2, 1, 0)))[:, None], b)


def state_dict_from_discriminator_params(params, version: str = "v2"):
    """flax MPD params -> reference-layout state_dict (weight_g/v names),
    inverse of discriminator_params_from_state_dict."""
    p = params.get("params", params)
    periods = _V2_PERIODS if version == "v2" else _V1_PERIODS
    out: Dict[str, np.ndarray] = {}

    def put_2d(tree_g, tree_v, tree_b, prefix, from_1d=False):
        g, v, b = np.asarray(tree_g), np.asarray(tree_v), np.asarray(tree_b)
        if from_1d:  # our (k,1,in,out) -> torch Conv1d (out,in,k)
            out[f"{prefix}.weight_g"] = np.transpose(g[0], (2, 0, 1))
            out[f"{prefix}.weight_v"] = np.ascontiguousarray(
                np.transpose(v[:, 0], (2, 1, 0)))
        else:        # our (kh,kw,in,out) -> torch Conv2d (out,in,kh,kw)
            out[f"{prefix}.weight_g"] = np.transpose(g, (3, 0, 1, 2))
            out[f"{prefix}.weight_v"] = np.ascontiguousarray(
                np.transpose(v, (3, 2, 0, 1)))
        out[f"{prefix}.bias"] = b

    ds = p["disc_s"]
    for i in range(6):
        put_2d(ds[f"conv_{i}_g"], ds[f"conv_{i}_v"], ds[f"conv_{i}_bias"],
               f"discriminators.0.convs.{i}", from_1d=True)
    put_2d(ds["conv_post_g"], ds["conv_post_v"], ds["conv_post_bias"],
           "discriminators.0.conv_post", from_1d=True)
    for j, period in enumerate(periods, start=1):
        dp = p[f"disc_p{period}"]
        for i in range(5):
            put_2d(dp[f"conv_{i}_g"], dp[f"conv_{i}_v"], dp[f"conv_{i}_bias"],
                   f"discriminators.{j}.convs.{i}")
        put_2d(dp["conv_post_g"], dp["conv_post_v"], dp["conv_post_bias"],
               f"discriminators.{j}.conv_post")
    return out

"""HuBERT parity vs the HuggingFace transformers implementation (an
independent reimplementation of fairseq's HubertModel, same architecture as
the reference's content encoder, rvc/hubert.py).

Small config keeps CI fast; the weight mapping exercises every parameter
class (conv extractor, group norm, pos-conv weight norm, attention, FFN,
layer norms)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers_available = True
try:
    import torch
    from transformers import HubertConfig, HubertModel
except Exception:  # pragma: no cover
    transformers_available = False

pytestmark = pytest.mark.skipif(not transformers_available,
                                reason="transformers unavailable")

from tpu_rvc.models.hubert import Hubert
from tpu_rvc.ckpt.hubert_loader import hubert_params_from_transformers


def small_pair(n_layers=2):
    cfg = HubertConfig(
        hidden_size=64, num_hidden_layers=n_layers, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32, 32), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), conv_bias=False, feat_extract_norm="group",
        do_stable_layer_norm=False, feat_proj_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    ref = HubertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hubert_params_from_transformers(sd, output_layer=n_layers)
    ours = Hubert(output_layer=n_layers, final_proj=False, embed=64,
                  ffn_dim=128, n_heads=2, pos_conv_k=16, pos_conv_groups=2,
                  conv_layers=((32, 10, 5), (32, 3, 2), (32, 3, 2)))
    return ref, ours, {"params": params}


def test_hubert_matches_transformers():
    ref, ours, variables = small_pair()
    rng = np.random.default_rng(5)
    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        o_ref = ref(torch.from_numpy(wav)).last_hidden_state.numpy()
    o_ours = np.asarray(ours.apply(variables, jnp.asarray(wav)))
    assert o_ours.shape == o_ref.shape
    err = np.abs(o_ours - o_ref).max()
    assert err < 2e-4, f"hubert feature mismatch {err}"


def test_hubert_layer_tap():
    """output_layer tap must equal transformers' intermediate hidden state."""
    ref, _, variables = small_pair(n_layers=2)
    ours_tap = Hubert(output_layer=1, final_proj=False, embed=64,
                      ffn_dim=128, n_heads=2, pos_conv_k=16, pos_conv_groups=2,
                      conv_layers=((32, 10, 5), (32, 3, 2), (32, 3, 2)))
    rng = np.random.default_rng(6)
    wav = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        hs = ref(torch.from_numpy(wav), output_hidden_states=True).hidden_states
    o_ref = hs[1].numpy()  # after layer index 0 == output_layer 1
    o_ours = np.asarray(ours_tap.apply(variables, jnp.asarray(wav)))
    err = np.abs(o_ours - o_ref).max()
    assert err < 2e-4, f"layer tap mismatch {err}"

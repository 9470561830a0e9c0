"""Numeric parity of the transformer stack vs torch modules (weights copied)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from objcavit_tpu.models.layers import (
    MultiHeadAttention,
    TransformerEncoder,
    TransformerEncoderLayer,
)

RNG = np.random.default_rng(2)
E, H = 128, 4


def _mha_params_from_torch(mha: nn.MultiheadAttention):
    return {
        "in_proj_kernel": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
        "in_proj_bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        "out_kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
        "out_bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
    }


def _layer_params_from_torch(layer: nn.TransformerEncoderLayer):
    return {
        "self_attn": _mha_params_from_torch(layer.self_attn),
        "linear1": {
            "kernel": jnp.asarray(layer.linear1.weight.detach().numpy().T),
            "bias": jnp.asarray(layer.linear1.bias.detach().numpy()),
        },
        "linear2": {
            "kernel": jnp.asarray(layer.linear2.weight.detach().numpy().T),
            "bias": jnp.asarray(layer.linear2.bias.detach().numpy()),
        },
        "norm1": {
            "scale": jnp.asarray(layer.norm1.weight.detach().numpy()),
            "bias": jnp.asarray(layer.norm1.bias.detach().numpy()),
        },
        "norm2": {
            "scale": jnp.asarray(layer.norm2.weight.detach().numpy()),
            "bias": jnp.asarray(layer.norm2.bias.detach().numpy()),
        },
    }


def test_mha_matches_torch_with_key_padding_mask():
    torch.manual_seed(0)
    tm = nn.MultiheadAttention(E, H, batch_first=True).eval()
    q = RNG.standard_normal((2, 6, E)).astype(np.float32)
    kv = RNG.standard_normal((2, 9, E)).astype(np.float32)
    mask = np.zeros((2, 9), dtype=bool)
    mask[0, 5:] = True
    mask[1, 2:] = True

    with torch.no_grad():
        want, _ = tm(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
            key_padding_mask=torch.from_numpy(mask), need_weights=False,
        )

    m = MultiHeadAttention(E, H)
    params = {"params": _mha_params_from_torch(tm)}
    got = m.apply(params, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
                  key_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_transformer_encoder_matches_torch():
    torch.manual_seed(1)
    tlayer = nn.TransformerEncoderLayer(E, H, dim_feedforward=1024, batch_first=True)
    # enable_nested_tensor=False: torch 2.x's fast path zeroes masked
    # positions, but the reference pins torch 1.12 which computes them
    # normally (as we do)
    tenc = nn.TransformerEncoder(
        tlayer, num_layers=2, enable_nested_tensor=False
    ).eval()
    x = RNG.standard_normal((2, 7, E)).astype(np.float32)
    mask = np.zeros((2, 7), dtype=bool)
    mask[1, 4:] = True

    with torch.no_grad():
        want = tenc(
            torch.from_numpy(x), src_key_padding_mask=torch.from_numpy(mask)
        ).numpy()

    enc = TransformerEncoder(2, E, H, 1024)
    params = {
        "params": {
            f"layer{i}": _layer_params_from_torch(tenc.layers[i]) for i in range(2)
        }
    }
    got = enc.apply(params, jnp.asarray(x), key_padding_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_encoder_layer_dropout_zero_rate_deterministic():
    layer = TransformerEncoderLayer(E, H, 1024, dropout_rate=0.1)
    x = jnp.asarray(RNG.standard_normal((1, 5, E)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    a = layer.apply(params, x, deterministic=True)
    b = layer.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_patch_embed_conv_equals_valid_conv():
    """PatchEmbedConv (reshape+matmul) == TorchConv k=p s=p VALID, same
    params — incl. a non-divisible input where VALID drops the remainder."""
    import jax

    from objcavit_tpu.models.common import PatchEmbedConv, TorchConv

    rng = np.random.default_rng(0)
    p, c, e = 4, 6, 8
    for h, w in ((12, 16), (14, 19)):  # divisible and ragged
        x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        pe = PatchEmbedConv(e, p)
        params = pe.init(jax.random.PRNGKey(0), x)
        want = TorchConv(e, (p, p), (p, p), padding="VALID").apply(params, x)
        got = pe.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

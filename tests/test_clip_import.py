"""CLIP text-tower weight import + BPE tokenizer parity.

Oracle: a from-scratch torch implementation of the OpenAI CLIP text
transformer (the model CLIPWrapper.py:18 loads as ViT-B/32) with the release
state-dict naming (transformer.resblocks.{i}.*, token_embedding,
positional_embedding, ln_final, text_projection), at a reduced width so the
test stays cheap. Conversion through
utils/torch_import.convert_clip_text_state_dict must reproduce encode_text
outputs exactly (fp32 tolerance).

The tokenizer test drives language/tokenizer.ClipBPETokenizer over a
miniature merges file with hand-computed expected ids, so the BPE path is
exercised without the 1.3 MB release asset.
"""

import gzip
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from objcavit_tpu.utils.torch_import import convert_clip_text_state_dict  # noqa: E402

VOCAB, CTX, WIDTH, HEADS, LAYERS, EMBED = 96, 12, 32, 4, 2, 24


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            OrderedDict(
                [
                    ("c_fc", nn.Linear(d, 4 * d)),
                    ("gelu", QuickGELU()),
                    ("c_proj", nn.Linear(4 * d, d)),
                ]
            )
        )
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        return x + self.mlp(self.ln_2(x))


class TorchResblocks(nn.Module):
    def __init__(self):
        super().__init__()
        self.resblocks = nn.ModuleList(
            TorchBlock(WIDTH, HEADS) for _ in range(LAYERS)
        )


class TorchCLIPText(nn.Module):
    """OpenAI CLIP encode_text, reduced dims, release key naming."""

    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(CTX, WIDTH))
        self.transformer = TorchResblocks()
        self.ln_final = nn.LayerNorm(WIDTH)
        self.text_projection = nn.Parameter(
            WIDTH**-0.5 * torch.randn(WIDTH, EMBED)
        )

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)  # (L, B, D)
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        for blk in self.transformer.resblocks:
            x = blk(x, mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        eot = text.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection


def test_clip_text_tower_parity():
    import jax

    from objcavit_tpu.models.clip_text import CLIPTextEncoder

    torch.manual_seed(0)
    oracle = TorchCLIPText().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    # visual-tower keys must be ignored
    sd["visual.conv1.weight"] = np.zeros((4, 3, 2, 2), np.float32)
    out = convert_clip_text_state_dict(sd)
    assert out["info"]["layers"] == LAYERS

    fmodel = CLIPTextEncoder(
        vocab_size=VOCAB, context_length=CTX, width=WIDTH, heads=HEADS,
        layers=LAYERS, embed_dim=EMBED,
    )
    rng = np.random.default_rng(0)
    toks = np.zeros((3, CTX), np.int64)
    for i, n in enumerate((3, 7, CTX - 1)):  # variable-length, 0-padded
        toks[i, 0] = VOCAB - 2  # sot
        toks[i, 1:n] = rng.integers(1, VOCAB - 2, n - 1)
        toks[i, n] = VOCAB - 1  # eot (highest id -> argmax)
    with torch.no_grad():
        want = oracle(torch.from_numpy(toks)).numpy()
    got = jax.jit(
        lambda p, t: fmodel.apply({"params": p}, t)
    )(out["params"], toks.astype(np.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ tokenizer


@pytest.fixture()
def mini_bpe(tmp_path):
    """Miniature merges file in the release format (version header line)."""
    merges = ["#version: tiny", "l o", "lo w</w>", "o x"]
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    return str(path)


def test_bpe_tokenizer_ids(mini_bpe):
    from objcavit_tpu.language.tokenizer import ClipBPETokenizer

    tok = ClipBPETokenizer(mini_bpe)
    n_merges = 3
    sot = 512 + n_merges
    eot = sot + 1
    assert tok.encoder["<|startoftext|>"] == sot
    assert tok.encoder["<|endoftext|>"] == eot

    # "low": l+o merges (rank 0), then lo+w</w> (rank 1) -> single token
    assert tok.encode("low") == [tok.encoder["low</w>"]]
    # "ox": o+x merges (rank 2) but no "ox</w>" merge -> ox + x? No:
    # word = ('o', 'x</w>'); pair ('o','x</w>') is NOT a merge (merge is
    # ('o','x')), so it stays two byte-level tokens.
    o_id = ord("o") - ord("!")
    x_end_id = 256 + (ord("x") - ord("!"))
    assert tok.encode("ox") == [o_id, x_end_id]
    # cleanup: uppercase + extra whitespace fold away
    assert tok.encode("  LOW   ox ") == [tok.encoder["low</w>"], o_id, x_end_id]

    out = tok.tokenize(["low ox"], context_length=8)
    np.testing.assert_array_equal(
        out, [[sot, tok.encoder["low</w>"], o_id, x_end_id, eot, 0, 0, 0]]
    )


def test_bpe_truncation_keeps_eot(mini_bpe):
    from objcavit_tpu.language.tokenizer import ClipBPETokenizer

    tok = ClipBPETokenizer(mini_bpe)
    out = tok.tokenize(["low low low low low low"], context_length=5)
    assert out.shape == (1, 5)
    assert out[0, 0] == tok.encoder["<|startoftext|>"]
    assert out[0, -1] == tok.encoder["<|endoftext|>"]


def test_make_embedder_loads_clip_checkpoint(tmp_path, monkeypatch):
    """make_embedder converts a (state-dict) CLIP .pt when pointed at one."""
    torch.manual_seed(1)
    oracle = TorchCLIPText().eval()
    path = tmp_path / "clip.pt"
    torch.save(oracle.state_dict(), str(path))

    from objcavit_tpu.utils.torch_import import load_clip_text_weights

    params = load_clip_text_weights(str(path))["params"]
    assert "block0" in params and "token_embedding" in params
    np.testing.assert_allclose(
        np.asarray(params["text_projection"]),
        oracle.text_projection.detach().numpy(),
    )

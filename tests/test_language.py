"""Language strategy / tokenizer / embedding-cache tests (host-side)."""

import numpy as np

from objcavit_tpu.language.embedding import ZerosEmbedder, get_num_classes
from objcavit_tpu.language.strategy import ObjectLanguageStrategy, synset_to_name
from objcavit_tpu.language.tokenizer import HashTokenizer, make_tokenizer


def test_synset_to_name():
    assert synset_to_name("stop_sign.n.01") == "stop sign"
    assert synset_to_name("dog.n.01") == "dog"


def test_strategy_none_and_unk():
    s = ObjectLanguageStrategy("none")
    out = s([["dog.n.01", "cat.n.01"], None], [None, None])
    assert out == [["dog.n.01", "cat.n.01"], ["<UNK>"]]


def test_strategy_synset_def_fallback_is_lemma():
    s = ObjectLanguageStrategy("synset_def_wn")
    # without the wordnet corpus the definition falls back to the lemma —
    # the reference's own fallback for non-synset labels
    out = s.phrases_for_image(["banana.n.01"], None)
    assert out[0]  # non-empty
    # stop_sign special case always resolves to the wikipedia sentence
    out = s.phrases_for_image(["stop_sign.n.01"], None)
    assert "traffic sign" in out[0]


def test_strategy_rel_size_phrases():
    s = ObjectLanguageStrategy("name_synset_def_wn_rel_sz")
    xywh = np.array([[10, 10, 100, 100], [20, 20, 10, 10]], np.float32)
    out = s.phrases_for_image(["dog.n.01", "cat.n.01"], xywh)
    assert len(out) == 2
    assert out[0].startswith("This is a dog, defined as")
    assert "much bigger than the cat" in out[0]
    assert "much smaller than the dog" in out[1]
    # single object -> empty clause, trailing ". ."
    out1 = s.phrases_for_image(["dog.n.01"], xywh[:1])
    assert out1[0].endswith(". .")
    # same-name objects get the 'other' prefix
    xywh2 = np.array([[0, 0, 10, 10], [0, 0, 11, 11]], np.float32)
    out2 = s.phrases_for_image(["dog.n.01", "dog.n.01"], xywh2)
    assert "the other dog" in out2[0]


def test_size_clause_binning_extremes():
    s = ObjectLanguageStrategy("name_synset_def_wn_rel_sz")
    assert s.size_clause_index(1000.0, 1.0) == 6  # much bigger
    assert s.size_clause_index(1.0, 1000.0) == 0  # much smaller
    assert s.size_clause_index(5.0, 5.0) == 3  # about the same size


def test_hash_tokenizer_contract():
    tok = make_tokenizer(None)
    assert isinstance(tok, HashTokenizer)  # no BPE asset in this image
    out = tok.tokenize(["a dog", "a dog", "a cat"])
    assert out.shape == (3, 77)
    np.testing.assert_array_equal(out[0], out[1])
    assert (out[0] != out[2]).any()
    assert out.dtype == np.int32


def test_zeros_embedder_and_class_count():
    z = ZerosEmbedder()
    e = z.embed(["a", "b"])
    assert e.shape == (2, 512) and (e == 0).all()
    assert get_num_classes("yolov7-seg-lvis-e234.pt") == 1204
    assert get_num_classes("yolov7-seg.pt") == 80


def test_build_class_table_shapes_and_unk_row():
    from objcavit_tpu.language.embedding import ZerosEmbedder, build_class_table

    class _CountingEmbedder(ZerosEmbedder):
        def embed(self, phrases):
            import numpy as np

            # deterministic distinct rows keyed by phrase hash
            return np.stack([
                np.full(512, (hash(p) % 97) / 97.0, np.float32)
                for p in phrases
            ])

    table = build_class_table(["cat", "dog"], "none", _CountingEmbedder())
    assert table.shape == (3, 512)
    # last row is the <UNK> sentinel embedding, distinct input phrase
    import numpy as np

    assert not np.allclose(table[2], table[0]) or not np.allclose(
        table[2], table[1]
    )

    import pytest

    with pytest.raises(ValueError):
        build_class_table(["cat"], "name_synset_def_wn_rel_sz",
                          _CountingEmbedder())

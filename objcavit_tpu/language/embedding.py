"""Language embedding: phrase -> 512-d feature, cached off the hot path.

Replicates LanguageEmbeddingWrapper (modules/LanguageEmbeddingWrapper.py):
  * 'clip'                  -> CLIP ViT-B/32 text encoder (jit, batched)
  * 'control_obj_zeros_512' -> zero vectors (ablation control, :56-61)
both 512-d (:41-51).

TPU-first: the phrase vocabulary is finite (1,204 LVIS classes x 7 size
clauses x neighbour classes), so embeddings are memoised per phrase — the
encoder runs only on cache misses, in batches, as its own jit program. The
reference instead tokenized + ran CLIP inside every training step
(GraphBins.py:99-106).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from objcavit_tpu.language.tokenizer import make_tokenizer

OBJ_FEATURE_DIM = 512


def get_num_classes(yolov7_chkpt: str) -> int:
    """LVIS v1.0 (1203 + 1 for yolov7 indexing) vs COCO 80 (:33-38)."""
    return 1204 if "lvis" in yolov7_chkpt else 80


class ZerosEmbedder:
    """'control_obj_zeros_512': zero features for every phrase."""

    def embed(self, phrases: Sequence[str]) -> np.ndarray:
        return np.zeros((len(phrases), OBJ_FEATURE_DIM), np.float32)


class ClipEmbedder:
    """CLIP text encoder with a host-side phrase cache.

    params: a flax param tree for models/clip_text.CLIPTextEncoder (imported
    from the released CLIP weights via utils/torch_import when available;
    randomly initialised otherwise — architecture-complete, not parity).
    """

    def __init__(self, params=None, bpe_path: str | None = None,
                 batch: int = 64, require_bpe: bool = False):
        import jax
        import jax.numpy as jnp

        from objcavit_tpu.models.clip_text import CLIPTextEncoder

        self.model = CLIPTextEncoder(dtype=jnp.float32)
        self.tokenizer = make_tokenizer(bpe_path, require=require_bpe)
        self.batch = batch
        if params is None:
            dummy = jnp.zeros((1, 77), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(0), dummy)["params"]
        self._apply = jax.jit(
            lambda toks: self.model.apply({"params": params}, toks)
        )
        self._cache: dict[str, np.ndarray] = {}

    def embed(self, phrases: Sequence[str]) -> np.ndarray:
        missing = sorted({p for p in phrases if p not in self._cache})
        for start in range(0, len(missing), self.batch):
            chunk = missing[start : start + self.batch]
            toks = self.tokenizer.tokenize(list(chunk))
            # pad chunk to the jit batch size to avoid recompiles
            pad = self.batch - len(chunk)
            if pad:
                toks = np.concatenate([toks, np.zeros((pad, 77), np.int32)])
                toks[len(chunk):, 0] = 1  # non-degenerate argmax
            feats = np.asarray(self._apply(toks))[: len(chunk)]
            for p, f in zip(chunk, feats):
                self._cache[p] = f.astype(np.float32)
        return np.stack([self._cache[p] for p in phrases])


def make_embedder(strategy: str, clip_params=None, bpe_path=None,
                  clip_checkpoint=None, require_assets: bool = False):
    """clip_checkpoint: path to an OpenAI CLIP release .pt (the asset
    CLIPWrapper loads as ViT-B/32); converted via utils/torch_import. Falls
    back to ``CLIP_CKPT_PATH`` env var, then random init (no parity).

    require_assets=True fails fast (MissingAssetError) instead of falling
    back to random CLIP weights or the hash tokenizer — production
    GraphBins runs must not silently consume noise embeddings."""
    if strategy == "control_obj_zeros_512":
        return ZerosEmbedder()
    if strategy == "clip":
        import os

        clip_checkpoint = clip_checkpoint or os.environ.get("CLIP_CKPT_PATH")
        if clip_params is None and clip_checkpoint and os.path.exists(
            clip_checkpoint
        ):
            from objcavit_tpu.utils.torch_import import load_clip_text_weights

            clip_params = load_clip_text_weights(clip_checkpoint)["params"]
        elif clip_params is None:
            if require_assets:
                from objcavit_tpu.errors import MissingAssetError

                raise MissingAssetError(
                    f"CLIP checkpoint {clip_checkpoint!r} not found (set "
                    "clip_checkpoint in the config or CLIP_CKPT_PATH). A "
                    "randomly-initialised text tower produces noise "
                    "embeddings; opt into it explicitly with --debug or "
                    "allow_random_detector: true."
                )
            if clip_checkpoint:
                import logging

                logging.getLogger(__name__).warning(
                    "configured CLIP checkpoint %s does not exist — the text "
                    "tower runs with RANDOM weights (embeddings are noise, "
                    "no parity)", clip_checkpoint,
                )
        return ClipEmbedder(clip_params, bpe_path, require_bpe=require_assets)
    raise ValueError(f"Error: Language model {strategy} not recognised")


def build_class_table(
    class_names: Sequence[str],
    strategy_name: str,
    embedder,
) -> np.ndarray:
    """(num_classes + 1, 512) phrase-embedding table for fused serving.

    Row c embeds class c's phrase under a PER-CLASS language strategy
    ('none' -> the class name, 'synset_def_wn' -> its WordNet definition,
    reference ObjectLanguageStrategy.py:139-154); the LAST row embeds the
    reference's '<UNK>' no-detection sentinel. The pairwise
    'name_synset_def_wn_rel_sz' strategy depends on the co-detected objects
    and cannot collapse to a table — use the host-side provider for it.
    """
    if strategy_name not in ("none", "synset_def_wn"):
        raise ValueError(
            f"strategy {strategy_name!r} is not per-class; the fused "
            "serving table supports 'none' and 'synset_def_wn'"
        )
    from objcavit_tpu.language.strategy import ObjectLanguageStrategy

    strat = ObjectLanguageStrategy(strategy_name)
    phrases = [strat.phrases_for_image([n], None)[0] for n in class_names]
    rows = embedder.embed(list(phrases) + ["<UNK>"])
    return np.asarray(rows, np.float32)

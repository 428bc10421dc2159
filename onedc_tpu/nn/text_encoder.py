"""CLIP text encoder for stage-II (captions condition the guidance UNets
only, never the codec — ref ``model_sd15_with_codec_stage2.py:112-127``).

Uses transformers' Flax CLIP implementation with the SD1.5 text-encoder
config (CLIP ViT-L/14: hidden 768, 12 layers, vocab 49408, max 77).
Pretrained weights load from a local directory when given (zero-egress
environment: nothing is downloaded); otherwise the encoder is randomly
initialized — sufficient for pipeline tests, flagged for real training.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger

log = get_logger("onedc_tpu.text")

SD15_TEXT_CONFIG = dict(
    vocab_size=49408,
    hidden_size=768,
    intermediate_size=3072,
    num_hidden_layers=12,
    num_attention_heads=12,
    max_position_embeddings=77,
    hidden_act="quick_gelu",
    layer_norm_eps=1e-5,
)


class TextEncoder:
    """Tokenizer + Flax CLIP text model, SD1.5 layout."""

    def __init__(self, pretrained_path: Optional[str] = None,
                 max_length: int = 77, seed: int = 0):
        from transformers import CLIPTextConfig, CLIPTokenizerFast, FlaxCLIPTextModel
        self.max_length = max_length
        if pretrained_path:
            self.tokenizer = CLIPTokenizerFast.from_pretrained(pretrained_path)
            self.model = FlaxCLIPTextModel.from_pretrained(pretrained_path)
        else:
            log.warning("TextEncoder: random init (no pretrained_path); "
                        "captions carry no semantic signal")
            self.tokenizer = None
            cfg = CLIPTextConfig(**SD15_TEXT_CONFIG)
            self.model = FlaxCLIPTextModel(cfg, seed=seed)

    def tokenize(self, captions) -> np.ndarray:
        if self.tokenizer is None:
            # no vocab available: hash tokens deterministically per caption
            ids = np.zeros((len(captions), self.max_length), np.int32)
            for i, c in enumerate(captions):
                h = abs(hash(c))
                ids[i, 0] = 49406  # BOS
                ids[i, 1] = h % 49000
                ids[i, 2] = 49407  # EOS
            return ids
        out = self.tokenizer(list(captions), padding="max_length",
                             max_length=self.max_length, truncation=True,
                             return_tensors="np")
        return out["input_ids"].astype(np.int32)

    def encode(self, input_ids: np.ndarray) -> jnp.ndarray:
        """(B, 77) ids -> (B, 77, 768) last hidden state."""
        return self.model(input_ids=input_ids).last_hidden_state

    def uncond_embedding(self, batch: int = 1) -> jnp.ndarray:
        """Precomputed empty-prompt embedding (ref stage2 :104-110)."""
        ids = self.tokenize([""])
        emb = self.encode(ids)
        return jnp.tile(emb, (batch, 1, 1))

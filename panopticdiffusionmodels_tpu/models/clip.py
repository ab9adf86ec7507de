"""Frozen CLIP text encoder (reference `libs/clip.py:13-38`).

Wraps HF transformers' Flax CLIP text model; weights must be available locally
(the training hot path never needs this — contexts are pre-extracted `.npy`
features, reference `datasets.py:577-613` — so this is only used by the offline
feature-extraction scripts and ad-hoc prompting).
"""
from __future__ import annotations

from typing import List

import numpy as np


class FrozenCLIPEmbedder:
    """encode(texts) -> (B, 77, 768) last_hidden_state."""

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77):
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        self.tokenizer = CLIPTokenizer.from_pretrained(version)
        self.transformer = FlaxCLIPTextModel.from_pretrained(version)
        self.max_length = max_length

    def encode(self, texts: List[str]) -> np.ndarray:
        batch = self.tokenizer(
            texts,
            truncation=True,
            max_length=self.max_length,
            padding="max_length",
            return_tensors="np",
        )
        out = self.transformer(
            input_ids=batch["input_ids"], attention_mask=batch["attention_mask"]
        )
        return np.asarray(out.last_hidden_state)

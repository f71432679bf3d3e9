"""Text embedders for open-vocabulary models (YOLO-World, FastSAM text prompts).

The reference embeds class names with OpenAI CLIP ViT-B/32 downloaded at
runtime (reference models/yolo/world/train.py:19, nn/tasks.py:642-661). This
environment is zero-egress, so the contract is split:

- `CLIPTextEmbedder`: a real CLIP text tower via `transformers`, loaded from a
  LOCAL directory only (`YOLO_SOD_CLIP_PATH` env var or an explicit path) —
  the production path when a checkpoint is provisioned.
- `HashTextEmbedder`: a deterministic character-n-gram feature hasher. It has
  no semantics (unrelated names are near-orthogonal, which is exactly what a
  closed-set fine-tune needs from its class embeddings) and exists so the
  full World train/predict path runs and tests offline.

`get_text_embedder(dim)` returns the best available one.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, List, Sequence

import numpy as np

from yolo_sod_tpu.utils import LOGGER

__all__ = ["HashTextEmbedder", "CLIPTextEmbedder", "get_text_embedder"]


class HashTextEmbedder:
    """Deterministic signed character-n-gram hashing into `dim` buckets.

    blake2b keeps it stable across processes (Python's `hash` is salted).
    Embeddings are unit-norm; similar strings share n-grams, so "red car" and
    "blue car" correlate while unrelated names are near-orthogonal.
    """

    def __init__(self, dim: int = 512, n: int = 3):
        self.dim, self.n = dim, n

    def _embed_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, np.float32)
        s = f"  {text.lower().strip()}  "
        grams = [s[i:i + self.n] for i in range(len(s) - self.n + 1)]
        grams += s.split()                       # word-level features too
        for g in grams:
            h = hashlib.blake2b(g.encode(), digest_size=8).digest()
            idx = int.from_bytes(h[:4], "little") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            v[idx] += sign
        norm = np.linalg.norm(v)
        return v / norm if norm > 0 else v

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self._embed_one(t) for t in texts])


class CLIPTextEmbedder:
    """CLIP text tower from a local `transformers` checkpoint directory."""

    def __init__(self, path: str, device: str = "cpu"):
        from transformers import CLIPModel, CLIPTokenizerFast

        self.model = CLIPModel.from_pretrained(path).to(device).eval()
        self.tokenizer = CLIPTokenizerFast.from_pretrained(path)
        self.device = device

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        import torch

        tok = self.tokenizer(list(texts), padding=True, return_tensors="pt")
        with torch.no_grad():
            feats = self.model.get_text_features(
                **{k: v.to(self.device) for k, v in tok.items()})
        feats = feats / feats.norm(p=2, dim=-1, keepdim=True)
        return feats.cpu().numpy().astype(np.float32)

    def image_text_similarity(self, images: List[np.ndarray],
                              texts: Sequence[str]) -> np.ndarray:
        """(M texts, N images) cosine similarity — the FastSAM text-prompt
        primitive (reference fastsam/predict.py:122-146)."""
        import torch
        from transformers import CLIPProcessor

        if not hasattr(self, "_processor"):
            self._processor = CLIPProcessor.from_pretrained(
                self.model.name_or_path)
        ins = self._processor(text=list(texts), images=images,
                              return_tensors="pt", padding=True)
        with torch.no_grad():
            out = self.model(**{k: v.to(self.device) for k, v in ins.items()})
        img = out.image_embeds / out.image_embeds.norm(p=2, dim=-1, keepdim=True)
        txt = out.text_embeds / out.text_embeds.norm(p=2, dim=-1, keepdim=True)
        return (txt @ img.T).cpu().numpy()       # (M, N)


def get_text_embedder(dim: int = 512) -> Callable[[Sequence[str]], np.ndarray]:
    """CLIP from YOLO_SOD_CLIP_PATH when provisioned, else the hash embedder."""
    path = os.environ.get("YOLO_SOD_CLIP_PATH")
    if path and os.path.isdir(path):
        try:
            return CLIPTextEmbedder(path)
        except Exception as e:  # noqa: BLE001 — fall back, but say why
            LOGGER.warning(f"CLIP at '{path}' failed to load ({e}); "
                           "falling back to HashTextEmbedder")
    return HashTextEmbedder(dim)

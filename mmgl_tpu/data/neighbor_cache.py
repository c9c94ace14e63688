"""Neighbor-embedding cache: precompute frozen-tower outputs once.

The reference re-encodes every neighbor text through Roberta (11 x 512
tokens) and every neighbor image through CLIP-ViT (5 x 224^2) on EVERY
training step (SURVEY §3.2 hot loop 3) even though the towers are frozen.
Fine-tuning runs 50 epochs over the same data (train_generation.sh:22) — the
tower outputs never change.

This cache runs the towers exactly once per dataset pass on the TPU and
stores the pooled features host-side ((N, tower_hidden) arrays — a few KB per
sample). `CachedNeighborDataset` swaps raw neighbor ids/pixels in each sample
for `neighbor_text_pooled` / `neighbor_image_pooled`, which the fusion model
consumes directly (models/fusion.py get_text_embs(pooled=...)). The trainable
projection + position embeddings still run on device every step, so gradients
and PEFT semantics are unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from mmgl_tpu.models.fusion import MMGLModel


class CachedNeighborDataset:
    """Wraps an assembler; serves samples with cached pooled tower outputs."""

    def __init__(self, dataset, model: MMGLModel, variables,
                 batch_size: int = 16, verbose: bool = True):
        self.dataset = dataset
        cfg = model.config
        self._needs_text = cfg.needs_text_tower
        self._needs_vision = cfg.needs_vision_tower
        self._text_cache: Optional[np.ndarray] = None
        self._image_cache: Optional[np.ndarray] = None
        self._raw_image_cache: Optional[np.ndarray] = None
        self._build(model, variables, batch_size, verbose)

    def __len__(self):
        return len(self.dataset)

    def _build(self, model, variables, batch_size, verbose):
        n = len(self.dataset)
        pool_text = jax.jit(lambda v, ids, mask: model.apply(
            v, ids, mask, method=MMGLModel.pool_text))
        pool_img = jax.jit(lambda v, px, valid: model.apply(
            v, px, valid, method=MMGLModel.pool_images))

        for start in range(0, n, batch_size):
            idx = range(start, min(start + batch_size, n))
            samples = [self.dataset[i] for i in idx]
            if self._needs_text and "neighbor_input_ids" in samples[0]:
                ids = np.stack([s["neighbor_input_ids"] for s in samples])
                mask = np.stack([s["neighbor_attention_mask"]
                                 for s in samples])
                b, nn_, s_ = ids.shape
                pooled = np.asarray(pool_text(
                    variables, ids.reshape(b * nn_, s_),
                    mask.reshape(b * nn_, s_))).reshape(b, nn_, -1)
                if self._text_cache is None:
                    self._text_cache = np.zeros(
                        (n, nn_, pooled.shape[-1]), np.float32)
                self._text_cache[start : start + b] = pooled
            if self._needs_vision and "neighbor_images" in samples[0]:
                px = np.stack([s["neighbor_images"] for s in samples])
                vld = np.stack([s["neighbor_images_pos_ids"] > 0
                                for s in samples])
                b, nv = px.shape[:2]
                pooled = np.asarray(pool_img(
                    variables, px.reshape((b * nv,) + px.shape[2:]),
                    vld.reshape(b * nv))).reshape(b, nv, -1)
                if self._image_cache is None:
                    self._image_cache = np.zeros(
                        (n, nv, pooled.shape[-1]), np.float32)
                self._image_cache[start : start + b] = pooled
            if self._needs_vision and "images" in samples[0]:
                # raw mode: cache pooled CLIP features of the spliced images
                px = np.stack([s["images"] for s in samples])
                b, nv = px.shape[:2]
                vld = np.stack([s.get("images_valid", np.ones(nv, np.int32))
                                for s in samples])
                pooled = np.asarray(pool_img(
                    variables, px.reshape((b * nv,) + px.shape[2:]),
                    vld.reshape(b * nv))).reshape(b, nv, -1)
                if self._raw_image_cache is None:
                    self._raw_image_cache = np.zeros(
                        (n, nv, pooled.shape[-1]), np.float32)
                self._raw_image_cache[start : start + b] = pooled
            if verbose and start % (batch_size * 16) == 0:
                print(f"[neighbor-cache] {start}/{n}")

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        sample = dict(self.dataset[index])
        if self._text_cache is not None:
            sample["neighbor_text_pooled"] = self._text_cache[index]
            # raw ids no longer needed on device; keep pos ids & locations
            sample.pop("neighbor_input_ids", None)
            sample.pop("neighbor_attention_mask", None)
        if self._image_cache is not None:
            sample["neighbor_image_pooled"] = self._image_cache[index]
            sample.pop("neighbor_images", None)
        if self._raw_image_cache is not None:
            sample["images_pooled"] = self._raw_image_cache[index]
            sample.pop("images", None)
            sample.pop("images_valid", None)
        return sample

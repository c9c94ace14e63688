"""Neighbor-fusion wrappers: the MMGL models.

TPU-native re-implementation of the reference's two wrappers:

  * SelfAttentionModel (modelling_self_attention.py:48-335): neighbors fused
    into the input embedding sequence — raw text/images spliced at reserved
    positions, or frozen-tower soft tokens appended after the input tokens.
  * CrossAttentionModel (modelling_cross_attention.py:896-1114): the same
    soft-token block passed as cross-attention memory to an MPT decoder
    (OPT + interleaved gated cross-attn layers — models/opt.py).

One module, `MMGLModel`, covers both: `lm_type` selects t5/opt/mpt; the
context x neighbor_mode grid follows the reference's *intended* dispatch
(SURVEY Q1/Q3 fixed: section_only/section_all route correctly, and the MPT
path consumes embedding-mode batches).

Batches are the dicts the data layer emits (wikiweb2m/data.py:146-294,
296-469) with identical keys and fixed shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmgl_tpu.models.clip import (CLIPTextConfig, CLIPTextModel,
                                  CLIPVisionConfig, CLIPVisionModel)
from mmgl_tpu.models.graph import GCN
from mmgl_tpu.models.opt import OPTConfig, OPTForCausalLM
from mmgl_tpu.models.roberta import RobertaConfig, RobertaModel
from mmgl_tpu.models.t5 import T5Config, T5ForConditionalGeneration
from mmgl_tpu.peft.virtual_tokens import PrefixTuning, PromptTuning

IGNORE_INDEX = -100


@dataclass(frozen=True)
class FusionConfig:
    lm_type: str = "opt"                  # t5 | opt | mpt
    context: str = "section_only"         # section_only|section_all|text_only|all
    neighbor_mode: str = "raw"            # raw | embedding | cross_attention
    decoder_only: bool = True
    n_text_tokens: int = 4
    n_visual_tokens: int = 4
    position_type: str = "none"           # none|embedding|laplacian|gnn
    max_text_neighbors: int = 11
    max_image_neighbors: int = 5
    max_input_length: int = 512
    max_output_length: int = 128
    peft_type: str = "none"
    num_virtual_tokens: int = 20
    freeze_lm: bool = False
    text_model_name: str = "roberta-base"  # "clip" substring -> CLIP text tower
    opt: Optional[OPTConfig] = None
    t5: Optional[T5Config] = None
    text: Any = None                       # RobertaConfig | CLIPTextConfig
    vision: Optional[CLIPVisionConfig] = None

    @property
    def uses_mpt_memory(self) -> bool:
        """MPT consumes embedding-style batches as cross-attn memory (Q3)."""
        return self.lm_type == "mpt" and self.neighbor_mode in (
            "embedding", "cross_attention")

    @property
    def needs_text_tower(self) -> bool:
        if self.lm_type == "mpt":
            return self.context != "section_only" and self.uses_mpt_memory
        return self.neighbor_mode == "embedding"

    @property
    def needs_vision_tower(self) -> bool:
        return self.context in ("section_all", "all")

    @property
    def embed_dim(self) -> int:
        return self.opt.embed_dim if self.opt is not None else self.t5.d_model


class TextPooler(nn.Module):
    """First-token pool: dense + tanh (modelling_self_attention.py:31-45)."""

    hidden_size: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(
                         hidden_states[:, 0])
        return jnp.tanh(x)


class MMGLModel(nn.Module):
    config: FusionConfig

    def setup(self):
        cfg = self.config
        if cfg.lm_type == "t5":
            self.lm = T5ForConditionalGeneration(cfg.t5)
        else:
            opt_cfg = cfg.opt
            if cfg.lm_type == "mpt":
                assert opt_cfg.cross_attention, (
                    "mpt requires OPTConfig.cross_attention=True")
            self.lm = OPTForCausalLM(opt_cfg)

        dim = cfg.embed_dim
        pdt = (cfg.opt or cfg.t5).param_dtype
        dt = (cfg.opt or cfg.t5).dtype

        if cfg.needs_text_tower:
            text_dim = dim * cfg.n_text_tokens
            if "clip" in cfg.text_model_name:
                self.text_model = CLIPTextModel(cfg.text)
                tower_hidden = cfg.text.hidden_size
            else:
                self.text_model = RobertaModel(cfg.text)
                tower_hidden = cfg.text.hidden_size
                self.text_pooler = TextPooler(tower_hidden, dt, pdt)
            self.text_embeddings = nn.Dense(text_dim, dtype=dt,
                                            param_dtype=pdt)
            # table sized max_output_length+1 for parity (SURVEY Q11: the
            # reference sizes it off max_output_length, not max neighbors)
            if cfg.position_type != "none" or cfg.lm_type == "mpt":
                self.text_position_embeddings = nn.Embed(
                    cfg.max_output_length + 1, text_dim, dtype=dt,
                    param_dtype=pdt)

        if cfg.needs_vision_tower:
            vis_dim = dim * cfg.n_visual_tokens
            self.visual_model = CLIPVisionModel(cfg.vision)
            self.visual_embeddings = nn.Dense(vis_dim, dtype=dt,
                                              param_dtype=pdt)
            if (cfg.neighbor_mode != "raw"
                    and (cfg.position_type != "none" or cfg.lm_type == "mpt")):
                self.visual_position_embeddings = nn.Embed(
                    cfg.max_output_length + 1, vis_dim, dtype=dt,
                    param_dtype=pdt)

        if cfg.position_type == "laplacian":
            k = 1 + cfg.max_text_neighbors + cfg.max_image_neighbors - 5
            self.lpe_embeddings = nn.Dense(dim * cfg.n_text_tokens, dtype=dt,
                                           param_dtype=pdt)
            self._lpe_k = k
        if cfg.position_type == "gnn":
            self.gnn = GCN(output_dim=dim * cfg.n_text_tokens,
                           hidden_dim=cfg.text.hidden_size, dtype=dt,
                           param_dtype=pdt)

        if cfg.peft_type == "prompt":
            self.prompt_tuning = PromptTuning(cfg.num_virtual_tokens, dim, pdt)
        if cfg.peft_type == "prefix":
            if cfg.lm_type == "t5":
                # decoder self-attention prefixes (enc-dec prefix tuning)
                self.prefix_tuning = PrefixTuning(
                    cfg.t5.num_decoder_layers, cfg.num_virtual_tokens,
                    cfg.t5.num_heads, cfg.t5.d_kv, pdt)
            else:
                self.prefix_tuning = PrefixTuning(
                    cfg.opt.num_hidden_layers, cfg.num_virtual_tokens,
                    cfg.opt.num_attention_heads, cfg.opt.head_dim, pdt)

    # ------------------------------------------------------------------
    # tower encoders (modelling_self_attention.py:154-200)
    # ------------------------------------------------------------------

    def pool_text(self, input_ids, attention_mask):
        """Frozen text tower: (B*N, S) -> (B*N, tower_hidden) pooled."""
        cfg = self.config
        if "clip" in cfg.text_model_name:
            _, pooled = self.text_model(input_ids, attention_mask)
        else:
            hidden = self.text_model(input_ids, attention_mask)
            pooled = self.text_pooler(hidden)
        return jax.lax.stop_gradient(pooled)

    def pool_images(self, pixel_values, valid=None):
        """Frozen vision tower: (B*N, 3, H, W) -> (B*N, tower_hidden).

        uint8 inputs are CLIP-normalized on device; `valid` zeroes placeholder
        slots to the reference's zeros-image convention."""
        from mmgl_tpu.models.clip import normalize_pixels

        pixels = normalize_pixels(pixel_values, valid,
                                  dtype=self.config.vision.dtype)
        _, pooled = self.visual_model(pixels)
        return jax.lax.stop_gradient(pooled)

    def project_text(self, pooled, pos_ids=None):
        """Trainable head over (possibly cached) pooled text features."""
        cfg = self.config
        embs = self.text_embeddings(pooled)           # (B*N, n_tok*dim)
        if pos_ids is not None and hasattr(self, "text_position_embeddings"):
            embs = embs + self.text_position_embeddings(pos_ids.reshape(-1))
        return embs

    def project_images(self, pooled, pos_ids=None):
        embs = self.visual_embeddings(pooled)
        if pos_ids is not None and hasattr(self, "visual_position_embeddings"):
            embs = embs + self.visual_position_embeddings(pos_ids.reshape(-1))
        return embs

    def get_text_embs(self, input_ids, attention_mask, pos_ids=None,
                      pooled=None):
        """(B, N, S) neighbor texts -> (B, N, n_text_tokens, dim).

        `pooled` (B, N, tower_hidden) skips the frozen tower — the
        neighbor-embedding cache path (data/neighbor_cache.py); the reference
        re-encodes every step (SURVEY §3.2 hot loop 3)."""
        cfg = self.config
        b, n = input_ids.shape[:2] if pooled is None else pooled.shape[:2]
        if pooled is None:
            s = input_ids.shape[2]
            pooled = self.pool_text(input_ids.reshape(b * n, s),
                                    attention_mask.reshape(b * n, s))
        else:
            pooled = pooled.reshape(b * n, -1)
        embs = self.project_text(pooled, pos_ids)
        return embs.reshape(b, n, cfg.n_text_tokens, -1)

    def get_visual_embs(self, pixel_values, pos_ids=None, pooled=None,
                        valid=None):
        """(B, N, 3, H, W) neighbor images -> (B, N, n_visual_tokens, dim)."""
        cfg = self.config
        b, n = (pixel_values.shape[:2] if pooled is None
                else pooled.shape[:2])
        if pooled is None:
            flat = pixel_values.reshape((b * n,) + pixel_values.shape[2:])
            flat_valid = valid.reshape(b * n) if valid is not None else None
            pooled = self.pool_images(flat, flat_valid)
        else:
            pooled = pooled.reshape(b * n, -1)
        embs = self.project_images(pooled, pos_ids)
        return embs.reshape(b, n, cfg.n_visual_tokens, -1)

    # ------------------------------------------------------------------
    # fusion forward
    # ------------------------------------------------------------------

    def __call__(self, batch: Dict[str, jax.Array],
                 deterministic: bool = True,
                 return_hidden: bool = False) -> Dict[str, jax.Array]:
        """Returns {"logits": ..., "labels": adjusted labels} — or
        {"hidden": pre-head states, "labels": ...} with return_hidden=True
        (OPT-family only; the vocab-chunked CE folds the head into the
        loss, train/losses.py chunked_ce)."""
        cfg = self.config
        fused = self._fuse(batch)
        if cfg.uses_mpt_memory:
            out, _ = self.lm(
                input_ids=fused["input_ids"],
                attention_mask=fused["attention_mask"],
                neighbor_embeds=fused["neighbor_embeds"],
                neighbor_mask=fused["neighbor_mask"],
                deterministic=deterministic, return_hidden=return_hidden)
            key = "hidden" if return_hidden else "logits"
            return {key: out, "labels": fused["labels"]}
        return self._lm_forward(fused, deterministic,
                                return_hidden=return_hidden)

    def _fuse(self, batch: Dict[str, jax.Array]) -> Dict[str, Any]:
        """Shared fusion: neighbor encode + embed splice/append + PEFT
        virtual tokens. Used by both training forward and generation prefill."""
        cfg = self.config
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        input_ids = batch["input_ids"]
        attention_mask = batch["attention_mask"]
        labels = batch.get("labels")
        b = input_ids.shape[0]

        neighbor_embeds = None
        neighbor_mask = None
        inputs_embeds = None

        if cfg.uses_mpt_memory:
            if cfg.context != "section_only":
                block, bmask = self._build_neighbor_block(batch)
                sn = block.shape[1] * block.shape[2]
                neighbor_embeds = block.reshape(b, sn, -1)
                neighbor_mask = bmask.reshape(b, sn)

        elif cfg.neighbor_mode == "raw" and cfg.context in ("section_only",
                                                            "text_only"):
            pass  # plain LM call

        elif cfg.neighbor_mode == "raw" and cfg.context in ("section_all",
                                                            "all"):
            # splice CLIP image embeddings into the reserved token positions
            # (modelling_self_attention.py:248-261); padded positions index
            # out of bounds and are dropped by JAX scatter semantics
            ids_safe = jnp.maximum(input_ids, 0)  # -1 placeholders
            inputs_embeds = self.lm.embed(ids_safe)
            visual = self.get_visual_embs(
                batch["images"] if "images" in batch else None,
                pooled=batch.get("images_pooled"),
                valid=batch.get("images_valid"))
            visual = visual.reshape(b, -1, visual.shape[-1])
            positions = batch["image_positions"]              # (B, N*vt)
            batch_idx = jnp.arange(b)[:, None]
            inputs_embeds = inputs_embeds.at[batch_idx, positions].set(
                visual.astype(inputs_embeds.dtype))
            if cfg.decoder_only and labels is not None:
                labels = labels.at[batch_idx, positions].set(IGNORE_INDEX)

        elif cfg.neighbor_mode == "embedding" and cfg.context in (
                "section_only", "text_only"):
            # text neighbors appended as soft tokens
            # (modelling_self_attention.py:263-280)
            text = self.get_text_embs(batch.get("neighbor_input_ids"),
                                      batch.get("neighbor_attention_mask"),
                                      batch.get("neighbor_pos_ids"),
                                      pooled=batch.get("neighbor_text_pooled"))
            n = text.shape[1]
            soft = text.reshape(b, n * cfg.n_text_tokens, -1)
            nmask = (batch["neighbor_pos_ids"] > 0)
            soft_mask = jnp.repeat(nmask, cfg.n_text_tokens, axis=1)
            inputs_embeds, attention_mask, labels = self._append_neighbors(
                input_ids, attention_mask, labels, soft, soft_mask)

        elif cfg.neighbor_mode == "embedding" and cfg.context in (
                "section_all", "all"):
            block, block_mask = self._build_neighbor_block(batch)
            total, n_tok = block.shape[1], block.shape[2]
            if cfg.context == "all" and cfg.position_type == "laplacian":
                lpe = self.lpe_embeddings(batch["lpe"])       # (B, total+1, nt*d)
                lpe = lpe.reshape(b, total + 1, n_tok, -1)
                block = block + lpe[:, 1:]
            elif cfg.context == "all" and cfg.position_type == "gnn":
                flat = block.reshape(b, total, -1)
                gnn_out = self.gnn(flat, batch["graph"])
                block = (flat + gnn_out).reshape(block.shape)
            soft = block.reshape(b, total * n_tok, -1)
            soft_mask = block_mask.reshape(b, total * n_tok)
            inputs_embeds, attention_mask, labels = self._append_neighbors(
                input_ids, attention_mask, labels, soft, soft_mask)
        else:
            raise ValueError(
                f"neighbor_mode {cfg.neighbor_mode} with context "
                f"{cfg.context} is not supported")

        # prompt tuning: virtual embeddings prepended
        if cfg.peft_type == "prompt" and not cfg.uses_mpt_memory:
            if inputs_embeds is None:
                inputs_embeds = self.lm.embed(jnp.maximum(input_ids, 0))
            virtual = self.prompt_tuning(b).astype(inputs_embeds.dtype)
            inputs_embeds = jnp.concatenate([virtual, inputs_embeds], axis=1)
            ones = jnp.ones((b, cfg.num_virtual_tokens), attention_mask.dtype)
            attention_mask = jnp.concatenate([ones, attention_mask], axis=1)
            if cfg.decoder_only and labels is not None:
                pad = jnp.full((b, cfg.num_virtual_tokens), IGNORE_INDEX,
                               labels.dtype)
                labels = jnp.concatenate([pad, labels], axis=1)

        prefix_kvs = None
        if cfg.peft_type == "prefix":
            prefix_kvs = self.prefix_tuning()

        return {"input_ids": input_ids, "inputs_embeds": inputs_embeds,
                "attention_mask": attention_mask, "labels": labels,
                "neighbor_embeds": neighbor_embeds,
                "neighbor_mask": neighbor_mask, "prefix_kvs": prefix_kvs}

    # ------------------------------------------------------------------
    # generation support (train/generate.py)
    # ------------------------------------------------------------------

    def prefill_inputs(self, batch: Dict[str, jax.Array]):
        """(inputs_embeds, attention_mask, neighbor_embeds, neighbor_mask)
        for a prompt-only batch (no labels)."""
        fused = self._fuse(batch)
        inputs_embeds = fused["inputs_embeds"]
        if inputs_embeds is None:
            inputs_embeds = self.lm.embed(jnp.maximum(fused["input_ids"], 0))
        return (inputs_embeds, fused["attention_mask"],
                fused["neighbor_embeds"], fused["neighbor_mask"])

    def lm_decode(self, input_ids=None, inputs_embeds=None,
                  attention_mask=None, neighbor_embeds=None,
                  neighbor_mask=None, caches=None, position_ids=None):
        """Direct decoder-only LM call with caches (generation steps)."""
        return self.lm(input_ids=input_ids, inputs_embeds=inputs_embeds,
                       attention_mask=attention_mask,
                       neighbor_embeds=neighbor_embeds,
                       neighbor_mask=neighbor_mask, caches=caches,
                       position_ids=position_ids, deterministic=True)

    def encode_t5(self, inputs_embeds=None, attention_mask=None):
        return self.lm.encode(inputs_embeds=inputs_embeds,
                              attention_mask=attention_mask)

    def decode_t5(self, decoder_input_ids=None, encoder_states=None,
                  attention_mask=None, caches=None, position_offset=0):
        return self.lm.decode(decoder_input_ids, encoder_states,
                              attention_mask=attention_mask, caches=caches,
                              position_offset=position_offset)

    def _build_neighbor_block(self, batch):
        """Interleave text/image soft tokens by their page locations
        (modelling_self_attention.py:282-308). Returns
        (B, total, n_tok, dim), (B, total, n_tok)."""
        cfg = self.config
        text = self.get_text_embs(batch.get("neighbor_input_ids"),
                                  batch.get("neighbor_attention_mask"),
                                  batch.get("neighbor_pos_ids"),
                                  pooled=batch.get("neighbor_text_pooled"))
        b, tn, n_tok, dim = text.shape
        tmask = (batch["neighbor_pos_ids"] > 0)[..., None]
        tmask = jnp.broadcast_to(tmask, (b, tn, cfg.n_text_tokens))

        if cfg.needs_vision_tower:
            visual = self.get_visual_embs(
                batch.get("neighbor_images"),
                batch.get("neighbor_images_pos_ids"),
                pooled=batch.get("neighbor_image_pooled"),
                valid=(batch["neighbor_images_pos_ids"] > 0)
                if "neighbor_images_pos_ids" in batch else None)
            vn = visual.shape[1]
            vmask = (batch["neighbor_images_pos_ids"] > 0)[..., None]
            vmask = jnp.broadcast_to(vmask, (b, vn, cfg.n_visual_tokens))
        else:
            vn = 0

        total = tn + vn
        batch_idx = jnp.arange(b)[:, None]
        block = jnp.zeros((b, total, n_tok, dim), text.dtype)
        mask = jnp.zeros((b, total, n_tok), jnp.bool_)
        block = block.at[batch_idx, batch["text_locations"]].set(text)
        mask = mask.at[batch_idx, batch["text_locations"]].set(tmask)
        if vn:
            block = block.at[batch_idx, batch["image_locations"]].set(
                visual.astype(block.dtype))
            mask = mask.at[batch_idx, batch["image_locations"]].set(vmask)
        return block, mask

    def _append_neighbors(self, input_ids, attention_mask, labels,
                          neighbor_embeds, neighbor_mask):
        """Concat soft tokens after the input tokens; extend mask/labels
        (modelling_self_attention.py:271-278, 322-330)."""
        cfg = self.config
        inputs_embeds = self.lm.embed(jnp.maximum(input_ids, 0))
        inputs_embeds = jnp.concatenate(
            [inputs_embeds, neighbor_embeds.astype(inputs_embeds.dtype)],
            axis=1)
        attention_mask = jnp.concatenate(
            [attention_mask, neighbor_mask.astype(attention_mask.dtype)],
            axis=1)
        if cfg.decoder_only and labels is not None:
            pad = jnp.full((labels.shape[0], neighbor_embeds.shape[1]),
                           IGNORE_INDEX, labels.dtype)
            labels = jnp.concatenate([labels, pad], axis=1)
        return inputs_embeds, attention_mask, labels

    def _lm_forward(self, fused: Dict[str, Any], deterministic: bool,
                    return_hidden: bool = False):
        cfg = self.config
        input_ids = fused["input_ids"]
        inputs_embeds = fused["inputs_embeds"]
        attention_mask = fused["attention_mask"]
        labels = fused["labels"]

        if cfg.lm_type == "t5":
            assert not return_hidden, (
                "chunked CE is OPT-family only (T5's tied head rescales "
                "hidden by d_model**-0.5 and trains with Adafactor; its CE "
                "cluster is not the bottleneck)")
            logits = self.lm(
                input_ids=None if inputs_embeds is not None else input_ids,
                inputs_embeds=inputs_embeds, attention_mask=attention_mask,
                labels=labels, prefix_kvs=fused["prefix_kvs"],
                deterministic=deterministic)
            return {"logits": logits, "labels": labels}

        out, _ = self.lm(
            input_ids=None if inputs_embeds is not None else input_ids,
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            prefix_kvs=fused["prefix_kvs"], deterministic=deterministic,
            return_hidden=return_hidden)
        key = "hidden" if return_hidden else "logits"
        return {key: out, "labels": labels}

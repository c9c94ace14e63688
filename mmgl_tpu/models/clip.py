"""CLIP vision + text encoders (flax) — frozen neighbor-image/text towers.

Counterparts of `CLIPVisionModel.from_pretrained`
(modelling_self_attention.py:125, modelling_cross_attention.py:934) and the
`CLIPTextModel` text-tower option (modelling_cross_attention.py:918-919).
Vision pooler_output = post-LN class token; text pooler_output = final-LN
hidden state at each sequence's EOS (argmax-id) position, matching HF.

The patch embedding is a flattened-patch matmul rather than a conv — on TPU
this is a single large MXU matmul (B*P, 3*p*p) @ (3*p*p, H) instead of a
convolution XLA would rewrite anyway.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmgl_tpu.models.layers import ACT2FN
from mmgl_tpu.ops import multi_head_attention


# CLIP preprocessing constants (the AutoFeatureExtractor values the reference
# uses via utils.py:15-23); normalization happens on device so images travel
# host->device as uint8 (4x less PCIe/ICI traffic than normalized f32)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_pixels(pixel_values: jax.Array, valid: Optional[jax.Array] = None,
                     dtype=jnp.float32) -> jax.Array:
    """uint8 (…,3,H,W) -> CLIP-normalized floats; float input passes through.

    `valid` (leading-dims bool) zeroes invalid slots so placeholder images
    match the reference's zeros(3,224,224) in normalized space
    (wikiweb2m/data.py:189)."""
    if jnp.issubdtype(pixel_values.dtype, jnp.integer):
        x = pixel_values.astype(jnp.float32) / 255.0
        mean = jnp.asarray(CLIP_MEAN, jnp.float32).reshape(3, 1, 1)
        std = jnp.asarray(CLIP_STD, jnp.float32).reshape(3, 1, 1)
        x = (x - mean) / std
    else:
        x = pixel_values.astype(jnp.float32)
    if valid is not None:
        shape = valid.shape + (1,) * (x.ndim - valid.ndim)
        x = x * valid.reshape(shape).astype(x.dtype)
    return x.astype(dtype)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any
    param_dtype: Any
    use_pallas: Optional[bool] = None
    causal: bool = False

    def setup(self):
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.query = nn.Dense(self.hidden_size, **dense)
        self.key = nn.Dense(self.hidden_size, **dense)
        self.value = nn.Dense(self.hidden_size, **dense)
        self.out = nn.Dense(self.hidden_size, **dense)

    def __call__(self, hidden_states, attention_mask=None):
        b, s, _ = hidden_states.shape
        h = self.num_heads
        d = self.hidden_size // h
        q = self.query(hidden_states).reshape(b, s, h, d)
        k = self.key(hidden_states).reshape(b, s, h, d)
        v = self.value(hidden_states).reshape(b, s, h, d)
        out = multi_head_attention(q, k, v, kv_mask=attention_mask,
                                   causal=self.causal,
                                   use_pallas=self.use_pallas)
        return self.out(out.reshape(b, s, self.hidden_size))


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float
    hidden_act: str
    dtype: Any
    param_dtype: Any
    use_pallas: Optional[bool] = None
    causal: bool = False

    def setup(self):
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.attention = CLIPAttention(self.hidden_size, self.num_heads,
                                       self.dtype, self.param_dtype,
                                       self.use_pallas, self.causal)
        self.norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps, **dense)
        self.norm2 = nn.LayerNorm(epsilon=self.layer_norm_eps, **dense)
        self.fc1 = nn.Dense(self.intermediate_size, **dense)
        self.fc2 = nn.Dense(self.hidden_size, **dense)

    def __call__(self, hidden_states, attention_mask=None):
        hidden_states = hidden_states + self.attention(
            self.norm1(hidden_states), attention_mask)
        h = self.fc1(self.norm2(hidden_states))
        h = ACT2FN[self.hidden_act](h)
        return hidden_states + self.fc2(h)


class _CLIPEncoder(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    num_layers: int
    layer_norm_eps: float
    hidden_act: str
    dtype: Any
    param_dtype: Any
    use_pallas: Optional[bool] = None
    causal: bool = False

    def setup(self):
        self.layers = [
            CLIPEncoderLayer(self.hidden_size, self.num_heads,
                             self.intermediate_size, self.layer_norm_eps,
                             self.hidden_act, self.dtype, self.param_dtype,
                             self.use_pallas, self.causal, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, hidden_states, attention_mask=None):
        for layer in self.layers:
            hidden_states = layer(hidden_states, attention_mask)
        return hidden_states


class CLIPVisionEmbeddings(nn.Module):
    config: CLIPVisionConfig

    def setup(self):
        cfg = self.config
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,),
            cfg.param_dtype)
        self.patch_embedding = nn.Dense(cfg.hidden_size, use_bias=False,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype)
        self.position_embedding = nn.Embed(cfg.num_patches + 1, cfg.hidden_size,
                                           dtype=cfg.dtype,
                                           param_dtype=cfg.param_dtype)

    def __call__(self, pixel_values):
        """pixel_values: (B, 3, H, W) — torch channel-first, like the
        reference feature extractor output (utils.py:21-23)."""
        cfg = self.config
        b = pixel_values.shape[0]
        p = cfg.patch_size
        g = cfg.image_size // p
        # (B,3,H,W) -> (B, gh, gw, 3*p*p) patches, flattened conv == matmul
        x = pixel_values.reshape(b, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 3, 5, 1)              # (B, gh, gw, p, p, 3)
        # conv kernel layout is (kh, kw, in, out) flattened -> (p, p, 3)
        x = x.reshape(b, g * g, p * p * 3).astype(cfg.dtype)
        patches = self.patch_embedding(x)              # (B, P, H)
        cls = jnp.broadcast_to(
            self.class_embedding.astype(cfg.dtype)[None, None],
            (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        positions = jnp.arange(cfg.num_patches + 1)[None]
        return x + self.position_embedding(positions)


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden_state, pooler_output)."""

    config: CLIPVisionConfig

    def setup(self):
        cfg = self.config
        self.embeddings = CLIPVisionEmbeddings(cfg)
        self.pre_layernorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                          dtype=cfg.dtype,
                                          param_dtype=cfg.param_dtype)
        self.encoder = _CLIPEncoder(cfg.hidden_size, cfg.num_attention_heads,
                                    cfg.intermediate_size,
                                    cfg.num_hidden_layers, cfg.layer_norm_eps,
                                    cfg.hidden_act, cfg.dtype, cfg.param_dtype,
                                    cfg.use_pallas)
        self.post_layernorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                           dtype=cfg.dtype,
                                           param_dtype=cfg.param_dtype)

    def __call__(self, pixel_values):
        x = self.embeddings(pixel_values)
        x = self.pre_layernorm(x)
        x = self.encoder(x)
        pooled = self.post_layernorm(x[:, 0])
        return x, pooled


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, pooler_output at the EOS/argmax position)."""

    config: CLIPTextConfig

    def setup(self):
        cfg = self.config
        self.embeddings_token = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                         dtype=cfg.dtype,
                                         param_dtype=cfg.param_dtype)
        self.embeddings_position = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size, dtype=cfg.dtype,
                                            param_dtype=cfg.param_dtype)
        self.encoder = _CLIPEncoder(cfg.hidden_size, cfg.num_attention_heads,
                                    cfg.intermediate_size,
                                    cfg.num_hidden_layers, cfg.layer_norm_eps,
                                    cfg.hidden_act, cfg.dtype, cfg.param_dtype,
                                    cfg.use_pallas, causal=True)
        self.final_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                             dtype=cfg.dtype,
                                             param_dtype=cfg.param_dtype)

    def __call__(self, input_ids, attention_mask=None):
        s = input_ids.shape[1]
        x = self.embeddings_token(input_ids)
        x = x + self.embeddings_position(jnp.arange(s)[None])
        x = self.encoder(x, attention_mask)
        x = self.final_layer_norm(x)
        # HF CLIPTextModel pools the highest-token-id (EOT) position
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        return x, pooled

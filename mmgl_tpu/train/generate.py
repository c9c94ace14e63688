"""Autoregressive generation with KV cache (jitted scan).

The reference calls `model.module.generate(...)` at test time but never
defines it and its MPT KV cache is vestigial (SURVEY Q5). This is the working
TPU-native version: one prefill over the (padded) prompt + neighbor context,
then a lax.scan of single-token decode steps against a preallocated cache —
greedy, max_new_tokens=32 (run_generation.py:600), EOS-finished rows emit pad.

Generated tokens land in cache slots after the padded prompt block; pad slots
stay masked through the original attention mask (the decode path extends the
mask with ones over the generated span). Position ids continue the
mask-cumsum so positions stay contiguous with the real text. Fusion embedding
modes prefill on [input embeds; neighbor soft tokens] — at train time the
neighbors sit after the output span instead, a layout the reference never
reconciled (its generate path crashes); documented divergence.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mmgl_tpu.models.fusion import MMGLModel
from mmgl_tpu.models.opt import init_cache
from mmgl_tpu.models.t5 import t5_init_cache


def greedy_generate(model: MMGLModel, variables, batch: Dict,
                    max_new_tokens: int = 32) -> jax.Array:
    """Returns (B, max_new_tokens) generated ids. Call under jax.jit."""
    if model.config.lm_type == "t5":
        return _generate_t5(model, variables, batch, max_new_tokens)
    return _generate_decoder_only(model, variables, batch, max_new_tokens)


def _prompt_batch(model: MMGLModel, batch: Dict) -> Dict:
    """Slice the prompt span out of a (possibly input+output) batch."""
    t_in = model.config.max_input_length
    prompt = dict(batch)
    prompt["input_ids"] = jnp.asarray(batch["input_ids"])[:, :t_in]
    prompt["attention_mask"] = jnp.asarray(batch["attention_mask"])[:, :t_in]
    prompt.pop("labels", None)
    return prompt


def _generate_decoder_only(model, variables, batch, max_new_tokens):
    cfg = model.config
    opt_cfg = cfg.opt
    prompt = _prompt_batch(model, batch)
    b = prompt["input_ids"].shape[0]

    embeds, mask, neighbor_embeds, neighbor_mask = model.apply(
        variables, prompt, method=MMGLModel.prefill_inputs)
    t_prompt = embeds.shape[1]
    caches = init_cache(opt_cfg, b, t_prompt + max_new_tokens)

    positions = _positions_from_mask(mask)
    logits, caches = model.apply(
        variables, method=MMGLModel.lm_decode,
        inputs_embeds=embeds, attention_mask=mask,
        neighbor_embeds=neighbor_embeds, neighbor_mask=neighbor_mask,
        caches=caches, position_ids=positions)

    n_valid = jnp.sum(mask, axis=1).astype(jnp.int32)       # (B,)
    last_idx = n_valid - 1
    first_tok = jnp.argmax(
        jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0],
        axis=-1).astype(jnp.int32)

    eos, pad = opt_cfg.eos_token_id, opt_cfg.pad_token_id

    def body(carry, _):
        tok, caches, finished, pos = carry
        step_logits, caches = model.apply(
            variables, method=MMGLModel.lm_decode,
            input_ids=tok[:, None],
            attention_mask=mask,  # decode pads the generated span with ones
            neighbor_embeds=neighbor_embeds, neighbor_mask=neighbor_mask,
            caches=caches, position_ids=pos[:, None])
        nxt = jnp.argmax(step_logits[:, 0], axis=-1).astype(jnp.int32)
        finished = finished | (tok == eos)
        nxt = jnp.where(finished, pad, nxt)
        return (nxt, caches, finished, pos + 1), tok

    init = (first_tok, caches, jnp.zeros((b,), bool), n_valid)
    _, toks = jax.lax.scan(body, init, None, length=max_new_tokens)
    return toks.T  # (B, max_new_tokens)


def _generate_t5(model, variables, batch, max_new_tokens):
    cfg = model.config
    t5_cfg = cfg.t5
    prompt = _prompt_batch(model, batch)
    b = prompt["input_ids"].shape[0]

    embeds, mask, _, _ = model.apply(variables, prompt,
                                     method=MMGLModel.prefill_inputs)
    enc = model.apply(variables, method=MMGLModel.encode_t5,
                      inputs_embeds=embeds, attention_mask=mask)

    caches = t5_init_cache(t5_cfg, b, max_new_tokens)
    tok = jnp.full((b,), t5_cfg.decoder_start_token_id, jnp.int32)
    eos, pad = t5_cfg.eos_token_id, t5_cfg.pad_token_id

    def body(carry, t):
        tok, caches, finished = carry
        logits, caches = model.apply(
            variables, method=MMGLModel.decode_t5,
            decoder_input_ids=tok[:, None], encoder_states=enc,
            attention_mask=mask, caches=caches, position_offset=t)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        finished = finished | (tok == eos)
        nxt = jnp.where(finished, pad, nxt)
        return (nxt, caches, finished), nxt

    init = (tok, caches, jnp.zeros((b,), bool))
    _, toks = jax.lax.scan(body, init, jnp.arange(max_new_tokens))
    return toks.T


def _positions_from_mask(mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.int32)
    return jnp.cumsum(m, axis=1) * m - 1

"""Model factory: Arguments -> MMGLModel (+ optional HF weight import).

Counterpart of the model-select block in the reference driver
(run_generation.py:286-301): substring match on model_name_or_path —
"t5" -> enc-dec SelfAttention path, "opt" -> dec-only SelfAttention path,
"mpt" -> OPT weights + cross-attention layers. Known architecture shapes are
tabled here so no network/HF config fetch is needed; a local checkpoint dir
enables real weight import (utils/hf_import.py).
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Optional, Tuple

import jax.numpy as jnp

from mmgl_tpu.config import Arguments
from mmgl_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from mmgl_tpu.models.fusion import FusionConfig, MMGLModel
from mmgl_tpu.models.opt import OPTConfig
from mmgl_tpu.models.roberta import RobertaConfig
from mmgl_tpu.models.t5 import T5Config

# (hidden, layers, heads, ffn, word_embed_proj)
_OPT_SIZES = {
    "tiny": (64, 2, 2, 128, None),         # test-scale
    "125m": (768, 12, 12, 3072, None),
    "350m": (1024, 24, 16, 4096, 512),
    "1.3b": (2048, 24, 32, 8192, None),
    "2.7b": (2560, 32, 32, 10240, None),
    "6.7b": (4096, 32, 32, 16384, None),
}

# (d_model, d_kv, d_ff, layers, heads, gated)
_T5_SIZES = {
    "tiny": (64, 16, 128, 2, 4, False),    # test-scale
    "small": (512, 64, 2048, 6, 8, False),
    "base": (768, 64, 3072, 12, 12, False),
    "large": (1024, 64, 4096, 24, 16, False),
    "flan-base": (768, 64, 2048, 12, 12, True),
}


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


def _opt_config(args: Arguments, size: str, cross: bool) -> OPTConfig:
    hidden, layers, heads, ffn, proj = _OPT_SIZES[size]
    return OPTConfig(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, ffn_dim=ffn, word_embed_proj_dim=proj,
        do_layer_norm_before=(size != "350m"),
        dropout=0.0 if size == "tiny" else 0.1, attention_dropout=0.0,
        layerdrop=args.layerdrop,
        cross_attention=cross,
        neighbor_layer_wise=max(1, layers // max(1, args.num_neighbor_layers)),
        peft_type=args.peft_type, lora_r=args.lora_r,
        lora_alpha=args.lora_alpha, lora_dropout=args.lora_dropout,
        dtype=_dtype(args.compute_dtype if args.bf16 else "float32"),
        param_dtype=_dtype(args.param_dtype),
        # True -> None (auto: Pallas where supported); False -> force XLA.
        # `args.use_pallas or None` mapped False to auto, silently running
        # Pallas on TPU when the user asked for XLA.
        use_pallas=None if args.use_pallas else False, remat=args.remat,
    )


def _t5_config(args: Arguments, size: str) -> T5Config:
    d_model, d_kv, d_ff, layers, heads, gated = _T5_SIZES[size]
    return T5Config(
        d_model=d_model, d_kv=d_kv, d_ff=d_ff, num_layers=layers,
        num_decoder_layers=layers, num_heads=heads,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0 if size == "tiny" else 0.1,
        dtype=_dtype(args.compute_dtype if args.bf16 else "float32"),
        param_dtype=_dtype(args.param_dtype),
        use_pallas=None if args.use_pallas else False,
    )


def _size_of(name: str, table) -> str:
    for key in table:
        if key in name:
            return key
    return "tiny"


def build_fusion_config(args: Arguments,
                        vocab_size: Optional[int] = None,
                        tokenizer=None) -> FusionConfig:
    name = args.model_name_or_path or "opt-tiny"
    tiny = "tiny" in name

    if (args.neighbor_mode in ("embedding", "cross_attention")
            and args.n_text_tokens != args.n_visual_tokens):
        # The interleaved neighbor block (fusion.py _build_neighbor_block)
        # scatters text and image soft tokens into one fixed-stride
        # (N, n_tokens, d) grid, mirroring the reference's shared layout
        # (modelling_self_attention.py:296-308) — per-modality token counts
        # would need ragged strides, which the reference never exercises
        # (both default to 4, run_generation.py:193-198).
        raise ValueError(
            f"n_text_tokens ({args.n_text_tokens}) must equal "
            f"n_visual_tokens ({args.n_visual_tokens}) in "
            f"neighbor_mode={args.neighbor_mode!r}")

    if "t5" in name:
        lm_type, decoder_only = "t5", False
    elif "mpt" in name:
        lm_type, decoder_only = "mpt", True
    elif "opt" in name:
        lm_type, decoder_only = "opt", True
    else:
        raise ValueError(f"unsupported model {name} (need t5/opt/mpt)")

    opt_cfg = t5_cfg = None
    if lm_type == "t5":
        t5_cfg = _t5_config(args, _size_of(name, _T5_SIZES))
        if vocab_size:
            t5_cfg = replace(t5_cfg, vocab_size=vocab_size)
        if tokenizer is not None:
            # model token ids must track the ACTIVE tokenizer — the HF-T5
            # defaults (eos=1) collide with e.g. the byte tokenizer's bos=1
            # and make generation finish on the first token
            t5_cfg = replace(
                t5_cfg, pad_token_id=tokenizer.pad_token_id,
                eos_token_id=tokenizer.eos_token_id,
                decoder_start_token_id=tokenizer.pad_token_id)
    else:
        opt_cfg = _opt_config(args, _size_of(name, _OPT_SIZES),
                              cross=(lm_type == "mpt"))
        if vocab_size:
            opt_cfg = replace(opt_cfg, vocab_size=vocab_size)
        if tokenizer is not None:
            opt_cfg = replace(
                opt_cfg, pad_token_id=tokenizer.pad_token_id,
                eos_token_id=tokenizer.eos_token_id,
                bos_token_id=tokenizer.bos_token_id or opt_cfg.bos_token_id)

    dt = _dtype(args.compute_dtype if args.bf16 else "float32")
    pdt = _dtype(args.param_dtype)
    tower_kw = dict(dtype=dt, param_dtype=pdt,
                    use_pallas=None if args.use_pallas else False)
    if "clip" in args.text_model:
        text_cfg = CLIPTextConfig(**tower_kw) if not tiny else CLIPTextConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, vocab_size=vocab_size or 49408, **tower_kw)
    else:
        text_cfg = RobertaConfig(**tower_kw) if not tiny else RobertaConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, vocab_size=vocab_size or 50265, **tower_kw)

    vision_cfg = (CLIPVisionConfig(**tower_kw) if not tiny
                  else CLIPVisionConfig(
                      hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      image_size=32, patch_size=8, **tower_kw))

    return FusionConfig(
        lm_type=lm_type, context=args.context,
        neighbor_mode=args.neighbor_mode, decoder_only=decoder_only,
        n_text_tokens=args.n_text_tokens, n_visual_tokens=args.n_visual_tokens,
        position_type=args.position_type,
        max_text_neighbors=args.max_text_neighbors,
        max_image_neighbors=args.max_image_neighbors,
        max_input_length=args.max_input_length,
        max_output_length=args.max_output_length,
        peft_type=args.peft_type, freeze_lm=args.freeze_lm,
        text_model_name=args.text_model, opt=opt_cfg, t5=t5_cfg,
        text=text_cfg, vision=vision_cfg,
    )


def build_model(args: Arguments, vocab_size: Optional[int] = None,
                tokenizer=None) -> Tuple[MMGLModel, FusionConfig]:
    cfg = build_fusion_config(args, vocab_size, tokenizer=tokenizer)
    return MMGLModel(cfg), cfg


def maybe_import_pretrained(params: dict, args: Arguments) -> dict:
    """Overlay local HF checkpoints (LM + towers) onto initialized params.

    model_name_or_path may be a local dir; "mpt" paths map to the OPT
    checkpoint like the reference (run_generation.py:299). Missing dirs are
    skipped silently (random init) — there is no network to fall back to.
    """
    from mmgl_tpu.utils import hf_import as hfi

    def overlay(dst: dict, src: dict):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    name = args.model_name_or_path or ""
    lm_path = name.replace("mpt", "opt")
    if os.path.isdir(lm_path):
        sd = hfi.load_state_dict(lm_path)
        if "t5" in name:
            overlay(params["lm"], hfi.import_t5(sd))
        else:
            overlay(params["lm"], hfi.import_opt(sd))
    if "text_model" in params and os.path.isdir(args.text_model):
        sd = hfi.load_state_dict(args.text_model)
        if "clip" in args.text_model:
            overlay(params["text_model"], hfi.import_clip_text(sd))
        else:
            overlay(params["text_model"], hfi.import_roberta(sd))
    if "visual_model" in params and os.path.isdir(args.visual_model):
        sd = hfi.load_state_dict(args.visual_model)
        overlay(params["visual_model"], hfi.import_clip_vision(sd))
    return params

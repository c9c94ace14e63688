"""HF checkpoint -> flax param pytree converters.

Replaces the reference's reliance on `AutoModel*.from_pretrained` + torch
state-dict copies (modelling_cross_attention.py:951-976) with direct weight
mapping into our flax models. Works from a local checkpoint directory
(model.safetensors / pytorch_model.bin) or an in-memory torch state dict —
no network, no torch at runtime on the hot path.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a local HF checkpoint dir into {name: np.ndarray}."""
    safep = os.path.join(path, "model.safetensors")
    binp = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(safep):
        from safetensors.numpy import load_file

        return dict(load_file(safep))
    if os.path.exists(binp):
        import torch

        sd = torch.load(binp, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model.safetensors or pytorch_model.bin in {path}")


def _set(tree: dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def torch_state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    # np.array (copy), NOT np.asarray: .float() is a no-op on fp32 tensors,
    # so .numpy() would SHARE memory with the live torch parameters — any
    # later in-place torch update (optimizer.step()) would silently mutate
    # the "imported" weights
    return {k: np.array(v.detach().cpu().float().numpy())
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# OPT
# ---------------------------------------------------------------------------

def import_opt(sd: Dict[str, np.ndarray], tie_word_embeddings: bool = True,
               lora: bool = False) -> dict:
    """HF OPTForCausalLM state dict -> OPTForCausalLM flax params."""
    params: dict = {}
    pre = "model.decoder."
    if not any(k.startswith(pre) for k in sd):
        pre = "decoder." if any(k.startswith("decoder.") for k in sd) else ""

    def linear(src: str, dst: str, nested_dense: bool = False):
        tail = "/dense" if nested_dense else ""
        _set(params, f"{dst}{tail}/kernel", sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(params, f"{dst}{tail}/bias", sd[f"{src}.bias"])

    def layer_norm(src: str, dst: str):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    _set(params, "decoder/embed_tokens/embedding", sd[pre + "embed_tokens.weight"])
    _set(params, "decoder/embed_positions/embedding",
         sd[pre + "embed_positions.weight"])
    if pre + "project_in.weight" in sd:
        linear(pre + "project_in", "decoder/project_in")
        linear(pre + "project_out", "decoder/project_out")
    if pre + "final_layer_norm.weight" in sd:
        layer_norm(pre + "final_layer_norm", "decoder/final_layer_norm")

    n_layers = 1 + max(
        int(k.split(".")[3 if pre == "model.decoder." else 2])
        for k in sd if ".layers." in k
    )
    for i in range(n_layers):
        src = f"{pre}layers.{i}"
        dst = f"decoder/layers_{i}"
        linear(f"{src}.self_attn.q_proj", f"{dst}/self_attn/q_proj",
               nested_dense=True)
        linear(f"{src}.self_attn.v_proj", f"{dst}/self_attn/v_proj",
               nested_dense=True)
        linear(f"{src}.self_attn.k_proj", f"{dst}/self_attn/k_proj")
        linear(f"{src}.self_attn.out_proj", f"{dst}/self_attn/out_proj")
        layer_norm(f"{src}.self_attn_layer_norm", f"{dst}/self_attn_layer_norm")
        layer_norm(f"{src}.final_layer_norm", f"{dst}/final_layer_norm")
        linear(f"{src}.fc1", f"{dst}/fc1")
        linear(f"{src}.fc2", f"{dst}/fc2")

    if not tie_word_embeddings and "lm_head.weight" in sd:
        _set(params, "lm_head/kernel", sd["lm_head.weight"].T)
    return params


def import_mpt(sd: Dict[str, np.ndarray],
               tie_word_embeddings: bool = True) -> dict:
    """Reference MPTForCausalLM state dict -> our cross-attention OPT params.

    Maps the full MPT tree — base decoder PLUS the interleaved neighbor
    cross-attention layers and their flamingo gate scalars
    (modelling_cross_attention.py:298-302,437-442) — so the torch reference
    model's exact weights can run through our flax path (parity testing).
    """
    base = {k: v for k, v in sd.items() if ".neighbor_layers." not in k}
    params = import_opt(base, tie_word_embeddings=tie_word_embeddings)

    pre = "model.decoder.neighbor_layers."
    if not any(k.startswith(pre) for k in sd):
        pre = "decoder.neighbor_layers."
    idxs = sorted({int(k[len(pre):].split(".")[0])
                   for k in sd if k.startswith(pre)})

    def linear(src, dst, nested_dense=False):
        tail = "/dense" if nested_dense else ""
        _set(params, f"{dst}{tail}/kernel", sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(params, f"{dst}{tail}/bias", sd[f"{src}.bias"])

    def layer_norm(src, dst):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    for i in idxs:
        src = f"{pre}{i}"
        dst = f"decoder/neighbor_layers_{i}"
        linear(f"{src}.self_attn.q_proj", f"{dst}/self_attn/q_proj",
               nested_dense=True)
        linear(f"{src}.self_attn.v_proj", f"{dst}/self_attn/v_proj",
               nested_dense=True)
        linear(f"{src}.self_attn.k_proj", f"{dst}/self_attn/k_proj")
        linear(f"{src}.self_attn.out_proj", f"{dst}/self_attn/out_proj")
        layer_norm(f"{src}.self_attn_layer_norm", f"{dst}/self_attn_layer_norm")
        layer_norm(f"{src}.final_layer_norm", f"{dst}/final_layer_norm")
        linear(f"{src}.fc1", f"{dst}/fc1")
        linear(f"{src}.fc2", f"{dst}/fc2")
        if f"{src}.gating1" in sd:
            _set(params, f"{dst}/gating1", sd[f"{src}.gating1"])
            _set(params, f"{dst}/gating2", sd[f"{src}.gating2"])
    return params


def import_opt_into_mpt(sd: Dict[str, np.ndarray], mpt_params: dict,
                        tie_word_embeddings: bool = True) -> dict:
    """Initialize MPT (OPT + cross-attn layers) from pretrained OPT weights.

    Counterpart of CrossAttentionModel.initialize_lm
    (modelling_cross_attention.py:951-976): copy embeddings, projections,
    final LN, all self-attn layers and lm_head; the freshly-initialized
    neighbor cross-attention layers in `mpt_params` are kept.
    """
    import jax

    opt = import_opt(sd, tie_word_embeddings=tie_word_embeddings)
    merged = jax.tree_util.tree_map(lambda x: x, mpt_params)  # copy

    def overwrite(dst_node, src_node):
        for key, val in src_node.items():
            if isinstance(val, dict):
                overwrite(dst_node.setdefault(key, {}), val)
            else:
                dst_node[key] = val

    overwrite(merged, opt)
    return merged


# ---------------------------------------------------------------------------
# Roberta
# ---------------------------------------------------------------------------

def import_roberta(sd: Dict[str, np.ndarray]) -> dict:
    """HF RobertaModel state dict -> models/roberta.py flax params."""
    params: dict = {}
    pre = "roberta." if any(k.startswith("roberta.") for k in sd) else ""

    def linear(src, dst):
        _set(params, f"{dst}/kernel", sd[f"{src}.weight"].T)
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    def layer_norm(src, dst):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    emb = pre + "embeddings"
    _set(params, "embeddings/word_embeddings/embedding",
         sd[f"{emb}.word_embeddings.weight"])
    _set(params, "embeddings/position_embeddings/embedding",
         sd[f"{emb}.position_embeddings.weight"])
    _set(params, "embeddings/token_type_embeddings/embedding",
         sd[f"{emb}.token_type_embeddings.weight"])
    layer_norm(f"{emb}.LayerNorm", "embeddings/layer_norm")

    n_layers = 1 + max(int(k.split("encoder.layer.")[1].split(".")[0])
                       for k in sd if "encoder.layer." in k)
    for i in range(n_layers):
        src = f"{pre}encoder.layer.{i}"
        dst = f"encoder/layers_{i}"
        linear(f"{src}.attention.self.query", f"{dst}/attention/query")
        linear(f"{src}.attention.self.key", f"{dst}/attention/key")
        linear(f"{src}.attention.self.value", f"{dst}/attention/value")
        linear(f"{src}.attention.output.dense", f"{dst}/attention/out")
        layer_norm(f"{src}.attention.output.LayerNorm", f"{dst}/attention_norm")
        linear(f"{src}.intermediate.dense", f"{dst}/intermediate")
        linear(f"{src}.output.dense", f"{dst}/output")
        layer_norm(f"{src}.output.LayerNorm", f"{dst}/output_norm")
    return params


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

def import_clip_vision(sd: Dict[str, np.ndarray]) -> dict:
    """HF CLIPVisionModel state dict -> models/clip.py vision params."""
    params: dict = {}
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = "clip.vision_model." if any(
            k.startswith("clip.vision_model.") for k in sd) else pre

    def linear(src, dst):
        _set(params, f"{dst}/kernel", sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    def layer_norm(src, dst):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    emb = pre + "embeddings"
    _set(params, "embeddings/class_embedding", sd[f"{emb}.class_embedding"])
    # conv (out, in, kh, kw) -> flattened-patch dense (in*kh*kw, out)
    w = sd[f"{emb}.patch_embedding.weight"]
    _set(params, "embeddings/patch_embedding/kernel",
         w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))
    _set(params, "embeddings/position_embedding/embedding",
         sd[f"{emb}.position_embedding.weight"])
    layer_norm(pre + "pre_layrnorm", "pre_layernorm")  # HF's typo'd name
    layer_norm(pre + "post_layernorm", "post_layernorm")

    n_layers = 1 + max(int(k.split("encoder.layers.")[1].split(".")[0])
                       for k in sd if "encoder.layers." in k)
    for i in range(n_layers):
        src = f"{pre}encoder.layers.{i}"
        dst = f"encoder/layers_{i}"
        linear(f"{src}.self_attn.q_proj", f"{dst}/attention/query")
        linear(f"{src}.self_attn.k_proj", f"{dst}/attention/key")
        linear(f"{src}.self_attn.v_proj", f"{dst}/attention/value")
        linear(f"{src}.self_attn.out_proj", f"{dst}/attention/out")
        layer_norm(f"{src}.layer_norm1", f"{dst}/norm1")
        layer_norm(f"{src}.layer_norm2", f"{dst}/norm2")
        linear(f"{src}.mlp.fc1", f"{dst}/fc1")
        linear(f"{src}.mlp.fc2", f"{dst}/fc2")
    return params


def import_clip_text(sd: Dict[str, np.ndarray]) -> dict:
    """HF CLIPTextModel state dict -> models/clip.py text params."""
    params: dict = {}
    pre = "text_model."

    def linear(src, dst):
        _set(params, f"{dst}/kernel", sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    def layer_norm(src, dst):
        _set(params, f"{dst}/scale", sd[f"{src}.weight"])
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])

    emb = pre + "embeddings"
    _set(params, "embeddings_token/embedding", sd[f"{emb}.token_embedding.weight"])
    _set(params, "embeddings_position/embedding",
         sd[f"{emb}.position_embedding.weight"])
    layer_norm(pre + "final_layer_norm", "final_layer_norm")

    n_layers = 1 + max(int(k.split("encoder.layers.")[1].split(".")[0])
                       for k in sd if "encoder.layers." in k)
    for i in range(n_layers):
        src = f"{pre}encoder.layers.{i}"
        dst = f"encoder/layers_{i}"
        linear(f"{src}.self_attn.q_proj", f"{dst}/attention/query")
        linear(f"{src}.self_attn.k_proj", f"{dst}/attention/key")
        linear(f"{src}.self_attn.v_proj", f"{dst}/attention/value")
        linear(f"{src}.self_attn.out_proj", f"{dst}/attention/out")
        layer_norm(f"{src}.layer_norm1", f"{dst}/norm1")
        layer_norm(f"{src}.layer_norm2", f"{dst}/norm2")
        linear(f"{src}.mlp.fc1", f"{dst}/fc1")
        linear(f"{src}.mlp.fc2", f"{dst}/fc2")
    return params


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------

def import_t5(sd: Dict[str, np.ndarray]) -> dict:
    """HF T5ForConditionalGeneration state dict -> models/t5.py flax params."""
    params: dict = {}

    def linear(src, dst):
        _set(params, f"{dst}/kernel", sd[f"{src}.weight"].T)

    def rms(src, dst):
        _set(params, f"{dst}/weight", sd[f"{src}.weight"])

    _set(params, "shared/embedding", sd["shared.weight"])
    if "lm_head.weight" in sd:
        _set(params, "lm_head/kernel", sd["lm_head.weight"].T)

    for stack in ("encoder", "decoder"):
        rms(f"{stack}.final_layer_norm", f"{stack}/final_layer_norm")
        _set(params, f"{stack}/relpos_bias/embedding",
             sd[f"{stack}.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"])
        n_layers = 1 + max(
            int(k.split(f"{stack}.block.")[1].split(".")[0])
            for k in sd if k.startswith(f"{stack}.block.")
        )
        for i in range(n_layers):
            src = f"{stack}.block.{i}"
            dst = f"{stack}/layers_{i}"
            linear(f"{src}.layer.0.SelfAttention.q", f"{dst}/self_attn/q")
            linear(f"{src}.layer.0.SelfAttention.k", f"{dst}/self_attn/k")
            linear(f"{src}.layer.0.SelfAttention.v", f"{dst}/self_attn/v")
            linear(f"{src}.layer.0.SelfAttention.o", f"{dst}/self_attn/o")
            rms(f"{src}.layer.0.layer_norm", f"{dst}/self_attn_norm")
            ff = 1 if stack == "encoder" else 2
            if stack == "decoder":
                linear(f"{src}.layer.1.EncDecAttention.q", f"{dst}/cross_attn/q")
                linear(f"{src}.layer.1.EncDecAttention.k", f"{dst}/cross_attn/k")
                linear(f"{src}.layer.1.EncDecAttention.v", f"{dst}/cross_attn/v")
                linear(f"{src}.layer.1.EncDecAttention.o", f"{dst}/cross_attn/o")
                rms(f"{src}.layer.1.layer_norm", f"{dst}/cross_attn_norm")
            if f"{src}.layer.{ff}.DenseReluDense.wi.weight" in sd:
                linear(f"{src}.layer.{ff}.DenseReluDense.wi", f"{dst}/ffn/wi")
            else:  # gated variant
                linear(f"{src}.layer.{ff}.DenseReluDense.wi_0", f"{dst}/ffn/wi_0")
                linear(f"{src}.layer.{ff}.DenseReluDense.wi_1", f"{dst}/ffn/wi_1")
            linear(f"{src}.layer.{ff}.DenseReluDense.wo", f"{dst}/ffn/wo")
            rms(f"{src}.layer.{ff}.layer_norm", f"{dst}/ffn_norm")
    return params

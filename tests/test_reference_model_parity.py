"""Parity against the reference's OWN torch modules (not just HF).

Round-2 verdict gap: our cross-attention / fusion math had only been diffed
against stock HF OPT (which has no cross layers) and against our own XLA
path. These tests instantiate the reference's actual modules with tiny
random weights and require logit/grad agreement:

  * MPTForCausalLM (modelling_cross_attention.py:739-876) with the flamingo
    gates FORCED NONZERO — exercising the cross-attention K/V path
    (:196-204), the gated residuals (:334-337,358-361), the every-k
    interleave (:613-625) and the neighbor mask expand (:545-546).
    Identity-at-init (gates=0) proves nothing about this path.
  * SelfAttentionModel (modelling_self_attention.py:211-335) embedding-mode
    soft-token fusion: tower pooling, projection + neighbor position
    embeddings, the text/image location scatter (:296-308), mask
    interleave, and the label -100 placement (:327-330). from_pretrained
    is monkeypatched to local random tiny HF models.

The reference's MPTConfig needs an `args` shim supplying
`neighbor_layer_wise` (SURVEY Q2) and `neighbor_mode="cross_attention"`
(Q3) to construct at all.
"""

import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax
import transformers

from mmgl_tpu.models.clip import CLIPVisionConfig
from mmgl_tpu.models.fusion import FusionConfig, MMGLModel
from mmgl_tpu.models.opt import OPTConfig, OPTForCausalLM
from mmgl_tpu.models.roberta import RobertaConfig
from mmgl_tpu.utils.hf_import import (import_clip_vision, import_mpt,
                                      import_opt, import_roberta,
                                      torch_state_dict_to_numpy)

VOCAB, HIDDEN, HEADS, FFN = 101, 32, 2, 64


def _ref_mpt(layers=4, wise=2, seed=0):
    from model.modelling_cross_attention import MPTConfig, MPTForCausalLM

    torch.manual_seed(seed)
    args = types.SimpleNamespace(
        neighbor_layer_wise=wise, neighbor_mode="cross_attention",
        peft_type="flamingo", lora_r=8, lora_alpha=16, lora_dropout=0.0)
    opt_cfg = transformers.OPTConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=layers,
        num_attention_heads=HEADS, ffn_dim=FFN, max_position_embeddings=64,
        word_embed_proj_dim=HIDDEN, dropout=0.0, attention_dropout=0.0,
        layerdrop=0.0, do_layer_norm_before=True)
    ref = MPTForCausalLM(MPTConfig(args, opt_cfg)).eval()
    # gates init at 0 (identity) — force them nonzero so the cross-attention
    # contribution actually flows into the residual stream
    with torch.no_grad():
        for i, layer in enumerate(ref.model.decoder.neighbor_layers):
            layer.gating1.fill_(0.7 - 0.2 * i)
            layer.gating2.fill_(-0.4 + 0.1 * i)
    return ref


def _our_mpt(layers=4, wise=2):
    cfg = OPTConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=layers,
        num_attention_heads=HEADS, ffn_dim=FFN, max_position_embeddings=64,
        word_embed_proj_dim=HIDDEN, dropout=0.0, attention_dropout=0.0,
        cross_attention=True, neighbor_layer_wise=wise, peft_type="flamingo")
    return OPTForCausalLM(cfg), cfg


def _mpt_inputs(seed=0, b=2, s=10, sn=6):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, VOCAB, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, :2] = 0  # OPT left padding
    ids[0, :2] = 1
    neigh = rng.randn(b, sn, HIDDEN).astype(np.float32)
    nmask = np.ones((b, sn), np.int32)
    nmask[1, 4:] = 0  # padded neighbor slots
    return ids, mask, neigh, nmask


def test_mpt_logits_match_reference_with_nonzero_gates():
    ref = _ref_mpt()
    model, _ = _our_mpt()
    params = import_mpt(torch_state_dict_to_numpy(ref.state_dict()))
    ids, mask, neigh, nmask = _mpt_inputs()

    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids.astype(np.int64)),
                  attention_mask=torch.tensor(mask.astype(np.int64)),
                  neighbor_embeds=torch.tensor(neigh),
                  neighbor_attention_mask=torch.tensor(nmask.astype(np.int64)))
    got, _ = model.apply({"params": params}, input_ids=ids,
                         attention_mask=mask, neighbor_embeds=neigh,
                         neighbor_mask=nmask)
    got, want = np.asarray(got), out.logits.numpy()
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)

    # the cross path must actually be live: zeroing the neighbor mask AND
    # gates changes the logits
    got0, _ = model.apply({"params": params}, input_ids=ids,
                          attention_mask=mask, neighbor_embeds=neigh * 0,
                          neighbor_mask=nmask)
    assert np.abs(np.asarray(got0)[valid] - want[valid]).max() > 1e-3


def test_mpt_gate_grads_match_reference():
    """d(scalar)/d(gating1/2) per neighbor layer: torch autograd vs jax.grad
    on the SAME weights, same masked projection of the logits."""
    ref = _ref_mpt(seed=1)
    model, _ = _our_mpt()
    params = import_mpt(torch_state_dict_to_numpy(ref.state_dict()))
    ids, mask, neigh, nmask = _mpt_inputs(seed=1)
    rng = np.random.RandomState(7)
    w = rng.randn(*(ids.shape + (VOCAB,))).astype(np.float32)
    w *= mask[..., None]  # only valid positions contribute

    out = ref(input_ids=torch.tensor(ids.astype(np.int64)),
              attention_mask=torch.tensor(mask.astype(np.int64)),
              neighbor_embeds=torch.tensor(neigh),
              neighbor_attention_mask=torch.tensor(nmask.astype(np.int64)))
    (out.logits * torch.tensor(w)).sum().backward()
    ref_grads = [(float(l.gating1.grad), float(l.gating2.grad))
                 for l in ref.model.decoder.neighbor_layers]

    def scalar(p):
        logits, _ = model.apply({"params": p}, input_ids=ids,
                                attention_mask=mask, neighbor_embeds=neigh,
                                neighbor_mask=nmask)
        return (logits * w).sum()

    grads = jax.grad(scalar)(params)
    for i, (g1, g2) in enumerate(ref_grads):
        node = grads["decoder"][f"neighbor_layers_{i}"]
        np.testing.assert_allclose(float(node["gating1"]), g1,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(float(node["gating2"]), g2,
                                   rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# SelfAttentionModel embedding-mode fusion
# ---------------------------------------------------------------------------

TN, VN, SN, NTOK, MAX_OUT = 3, 2, 8, 2, 16
IMG = 32


def _ref_fusion(monkeypatch, seed=0):
    import model.modelling_self_attention as msa

    torch.manual_seed(seed)
    opt_cfg = transformers.OPTConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=2,
        num_attention_heads=HEADS, ffn_dim=FFN, max_position_embeddings=64,
        word_embed_proj_dim=HIDDEN, dropout=0.0, attention_dropout=0.0,
        do_layer_norm_before=True, attn_implementation="eager")
    rob_cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=HIDDEN, num_hidden_layers=2,
        num_attention_heads=HEADS, intermediate_size=FFN,
        max_position_embeddings=40, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5, attn_implementation="eager")
    clip_cfg = transformers.CLIPVisionConfig(
        hidden_size=HIDDEN, num_hidden_layers=2, num_attention_heads=HEADS,
        intermediate_size=FFN, image_size=IMG, patch_size=8,
        attention_dropout=0.0, attn_implementation="eager")
    hf_opt = transformers.OPTForCausalLM(opt_cfg).eval()
    hf_rob = transformers.RobertaModel(rob_cfg, add_pooling_layer=False).eval()
    hf_clip = transformers.CLIPVisionModel(clip_cfg).eval()

    class _Cfg:
        @staticmethod
        def from_pretrained(name, **kw):
            return rob_cfg if "roberta" in name else opt_cfg

    class _Lm:
        @staticmethod
        def from_pretrained(name, **kw):
            return hf_opt

    class _Rob:
        @staticmethod
        def from_pretrained(name, **kw):
            return hf_rob

    class _Clip:
        @staticmethod
        def from_pretrained(name, **kw):
            return hf_clip

    monkeypatch.setattr(msa, "AutoConfig", _Cfg)
    monkeypatch.setattr(msa, "AutoModelForCausalLM", _Lm)
    monkeypatch.setattr(msa, "RobertaModel", _Rob)
    monkeypatch.setattr(msa, "CLIPVisionModel", _Clip)

    args = types.SimpleNamespace(
        model_name_or_path="opt-ref-tiny", context="all",
        decoder_only=True, neighbor_mode="embedding",
        position_type="embedding", n_text_tokens=NTOK,
        n_visual_tokens=NTOK, max_output_length=MAX_OUT,
        max_text_neighbors=TN, max_image_neighbors=VN,
        text_model="roberta-tiny", visual_model="clip-tiny",
        peft_type="none", freeze_lm=False)
    ref = msa.SelfAttentionModel(args, tokenizer=None)
    # the reference's train() override returns None (no `return self`),
    # so .eval() cannot be chained
    ref.eval()
    return ref, (hf_opt, hf_rob, hf_clip)


def _our_fusion(hf_models):
    hf_opt, hf_rob, hf_clip = hf_models
    fcfg = FusionConfig(
        lm_type="opt", context="all", neighbor_mode="embedding",
        decoder_only=True, n_text_tokens=NTOK, n_visual_tokens=NTOK,
        position_type="embedding", max_text_neighbors=TN,
        max_image_neighbors=VN, max_input_length=10, max_output_length=MAX_OUT,
        text_model_name="roberta-tiny",
        opt=OPTConfig(vocab_size=VOCAB, hidden_size=HIDDEN,
                      num_hidden_layers=2, num_attention_heads=HEADS,
                      ffn_dim=FFN, max_position_embeddings=64,
                      word_embed_proj_dim=HIDDEN, dropout=0.0,
                      attention_dropout=0.0),
        text=RobertaConfig(vocab_size=120, hidden_size=HIDDEN,
                           num_hidden_layers=2, num_attention_heads=HEADS,
                           intermediate_size=FFN, max_position_embeddings=40,
                           layer_norm_eps=1e-5),
        vision=CLIPVisionConfig(hidden_size=HIDDEN, num_hidden_layers=2,
                                num_attention_heads=HEADS,
                                intermediate_size=FFN, image_size=IMG,
                                patch_size=8))
    return MMGLModel(fcfg), fcfg


def _port_fusion_weights(ref):
    """Reference SelfAttentionModel -> our MMGLModel param tree."""
    t = torch_state_dict_to_numpy

    def lin(mod):
        return {"kernel": np.asarray(mod.weight.detach().numpy().T),
                "bias": np.asarray(mod.bias.detach().numpy())}

    params = {
        "lm": import_opt(t(ref.lm.state_dict())),
        "text_model": import_roberta(t(ref.text_model.state_dict())),
        "text_pooler": {"dense": lin(ref.text_pooler.dense)},
        "text_embeddings": lin(ref.text_embeddings),
        "text_position_embeddings": {
            "embedding": np.asarray(
                ref.text_position_embeddings.weight.detach().numpy())},
        "visual_model": import_clip_vision(t(ref.visual_model.state_dict())),
        "visual_embeddings": lin(ref.visual_embeddings),
        "visual_position_embeddings": {
            "embedding": np.asarray(
                ref.visual_position_embeddings.weight.detach().numpy())},
    }
    return params


def _fusion_batch(seed=0, b=2, s=10):
    rng = np.random.RandomState(seed)
    batch = {
        "input_ids": rng.randint(4, VOCAB, size=(b, s)).astype(np.int32),
        "attention_mask": np.ones((b, s), np.int32),
        "labels": rng.randint(4, VOCAB, size=(b, s)).astype(np.int32),
        "neighbor_input_ids":
            rng.randint(4, 110, size=(b, TN, SN)).astype(np.int32),
        "neighbor_attention_mask": np.ones((b, TN, SN), np.int32),
        "neighbor_pos_ids": np.array([[1, 2, 0], [3, 0, 0]], np.int32),
        "text_locations": np.array([[0, 1, 4], [0, 2, 3]], np.int32),
        "neighbor_images":
            rng.randn(b, VN, 3, IMG, IMG).astype(np.float32),
        "neighbor_images_pos_ids": np.array([[3, 0], [1, 2]], np.int32),
        "image_locations": np.array([[2, 3], [1, 4]], np.int32),
    }
    batch["attention_mask"][1, 8:] = 0
    batch["input_ids"][1, 8:] = 1
    # padded image slots carry the reference's zeros-image placeholder
    # (wikiweb2m/data.py:188-189) — our valid-zeroing then matches exactly
    batch["neighbor_images"][0, 1] = 0.0
    batch["neighbor_images"][1, :0] = 0.0
    return batch


def test_fusion_logits_and_labels_match_reference(monkeypatch):
    ref, hf_models = _ref_fusion(monkeypatch)
    model, fcfg = _our_fusion(hf_models)
    params = _port_fusion_weights(ref)
    batch = _fusion_batch()

    tb = {}
    for k, v in batch.items():
        tv = torch.tensor(v)
        tb[k] = tv.long() if v.dtype == np.int32 else tv
    with torch.no_grad():
        out = ref(**tb)
    ref_logits = out.logits.numpy()

    got = model.apply({"params": params}, batch)
    got_logits = np.asarray(got["logits"])
    got_labels = np.asarray(got["labels"])

    assert got_logits.shape == ref_logits.shape  # input + soft-token span
    b, s = batch["input_ids"].shape
    soft_mask = np.zeros((b, (TN + VN) * NTOK), bool)
    # the reference fused mask: [attention_mask ; interleaved neighbor mask]
    for row in range(b):
        for j, loc in enumerate(batch["text_locations"][row]):
            if batch["neighbor_pos_ids"][row, j] > 0:
                soft_mask[row, loc * NTOK:(loc + 1) * NTOK] = True
        for j, loc in enumerate(batch["image_locations"][row]):
            if batch["neighbor_images_pos_ids"][row, j] > 0:
                soft_mask[row, loc * NTOK:(loc + 1) * NTOK] = True
    valid = np.concatenate([batch["attention_mask"].astype(bool), soft_mask],
                           axis=1)
    np.testing.assert_allclose(got_logits[valid], ref_logits[valid],
                               rtol=2e-4, atol=2e-4)

    # label -100 placement over the appended soft-token span
    # (modelling_self_attention.py:327-330)
    expect = np.concatenate(
        [batch["labels"],
         np.full((b, (TN + VN) * NTOK), -100, np.int32)], axis=1)
    np.testing.assert_array_equal(got_labels, expect)

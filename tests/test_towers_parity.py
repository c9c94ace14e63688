"""Parity: flax Roberta / CLIP towers vs HF torch models (tiny random weights)."""

import numpy as np
import pytest
import torch

from mmgl_tpu.models.clip import (CLIPTextConfig, CLIPTextModel,
                                  CLIPVisionConfig, CLIPVisionModel)
from mmgl_tpu.models.roberta import RobertaConfig, RobertaModel
from mmgl_tpu.utils.hf_import import (import_clip_text, import_clip_vision,
                                      import_roberta,
                                      torch_state_dict_to_numpy)


def test_roberta_matches_hf():
    import transformers

    torch.manual_seed(0)
    hf_cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5, attn_implementation="eager",
    )
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = RobertaConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=40, layer_norm_eps=1e-5)
    params = import_roberta(torch_state_dict_to_numpy(hf.state_dict()))
    model = RobertaModel(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(4, 120, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 7:] = 0
    ids[1, 7:] = 1  # pad token

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64))
                 ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, ids, mask))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_clip_vision_matches_hf():
    import transformers

    torch.manual_seed(1)
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        attention_dropout=0.0, attn_implementation="eager",
    )
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=64,
                           image_size=32, patch_size=8)
    params = import_clip_vision(torch_state_dict_to_numpy(hf.state_dict()))
    model = CLIPVisionModel(cfg)

    pixels = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pixels))
        ref_h, ref_p = out.last_hidden_state.numpy(), out.pooler_output.numpy()
    got_h, got_p = model.apply({"params": params}, pixels)
    np.testing.assert_allclose(np.asarray(got_h), ref_h, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), ref_p, rtol=2e-4, atol=2e-4)


def test_clip_text_matches_hf():
    import transformers

    torch.manual_seed(2)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=24, attention_dropout=0.0,
        attn_implementation="eager", eos_token_id=98, bos_token_id=97,
    )
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=24)
    params = import_clip_text(torch_state_dict_to_numpy(hf.state_dict()))
    model = CLIPTextModel(cfg)

    rng = np.random.RandomState(3)
    ids = rng.randint(1, 90, size=(2, 12)).astype(np.int32)
    ids[:, 0] = 97
    ids[:, -1] = 98  # eos = highest id -> pooled position
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids.astype(np.int64)))
        ref_h, ref_p = out.last_hidden_state.numpy(), out.pooler_output.numpy()
    got_h, got_p = model.apply({"params": params}, ids)
    np.testing.assert_allclose(np.asarray(got_h), ref_h, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), ref_p, rtol=2e-4, atol=2e-4)


def test_cliptext_fusion_pooling_matches_reference_semantics():
    """With text_model="clip*" the fusion wrapper must consume the CLIP
    tower's pooler_output DIRECTLY — no TextPooler head — exactly like the
    reference (modelling_cross_attention.py:992-996: pooler_output for
    clip, TextPooler(last_hidden_state) otherwise)."""
    import jax

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model

    args = Arguments(
        model_name_or_path="opt-tiny", context="text_only",
        neighbor_mode="embedding", text_model="clip-tiny",
        max_input_length=16, max_output_length=8, max_text_neighbors=2,
        n_text_tokens=2, n_visual_tokens=2, use_pallas=False)
    model, cfg = build_model(args, vocab_size=99)
    rng = np.random.RandomState(4)
    b, tn, sn = 2, cfg.max_text_neighbors, 12
    batch = {
        "input_ids": rng.randint(4, 90, (b, 24)).astype(np.int32),
        "attention_mask": np.ones((b, 24), np.int32),
        "labels": rng.randint(4, 90, (b, 24)).astype(np.int32),
        "neighbor_input_ids": rng.randint(4, 90,
                                          (b, tn, sn)).astype(np.int32),
        "neighbor_attention_mask": np.ones((b, tn, sn), np.int32),
        "neighbor_pos_ids": np.array([[1, 2], [1, 0]], np.int32),
        "text_locations": np.array([[0, 1], [0, 1]], np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    # no TextPooler head exists on the clip path (reference parity)
    assert "text_pooler" not in params
    assert "text_model" in params

    # the fusion's pooled features == the standalone CLIP tower's
    # pooler_output on the same ids (stop_gradient aside)
    pooled_fusion = model.apply(
        {"params": params},
        batch["neighbor_input_ids"].reshape(b * tn, sn),
        batch["neighbor_attention_mask"].reshape(b * tn, sn),
        method="pool_text")
    tower = CLIPTextModel(cfg.text)
    _, pooled_direct = tower.apply(
        {"params": params["text_model"]},
        batch["neighbor_input_ids"].reshape(b * tn, sn),
        batch["neighbor_attention_mask"].reshape(b * tn, sn))
    np.testing.assert_allclose(np.asarray(pooled_fusion),
                               np.asarray(pooled_direct),
                               rtol=1e-5, atol=1e-6)

    # end-to-end: neighbor text flows through the tower into the logits
    out = model.apply({"params": params}, batch, deterministic=True)
    batch2 = dict(batch)
    batch2["neighbor_input_ids"] = rng.randint(4, 90,
                                               (b, tn, sn)).astype(np.int32)
    out2 = model.apply({"params": params}, batch2, deterministic=True)
    assert not np.allclose(np.asarray(out["logits"]),
                           np.asarray(out2["logits"]))

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

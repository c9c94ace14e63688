"""Parity: flax T5 vs HF torch T5 (tiny random weights), plus cache decode."""

import numpy as np
import pytest
import torch

from mmgl_tpu.models.t5 import (T5Config, T5ForConditionalGeneration,
                                shift_right, t5_init_cache)
from mmgl_tpu.utils.hf_import import import_t5, torch_state_dict_to_numpy


def _make_pair(gated=False, seed=0):
    import transformers

    torch.manual_seed(seed)
    hf_cfg = transformers.T5Config(
        vocab_size=111, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        attn_implementation="eager", tie_word_embeddings=True,
        decoder_start_token_id=0,
    )
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(vocab_size=111, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=20,
                   feed_forward_proj="gated-gelu" if gated else "relu")
    params = import_t5(torch_state_dict_to_numpy(hf.state_dict()))
    return hf, T5ForConditionalGeneration(cfg), {"params": params}, cfg


@pytest.mark.parametrize("gated", [False, True])
def test_t5_logits_match_hf(gated):
    hf, model, variables, cfg = _make_pair(gated=gated)
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 111, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0
    ids[1, 6:] = 0
    labels = rng.randint(2, 111, size=(2, 5)).astype(np.int32)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 labels=torch.tensor(labels.astype(np.int64))).logits.numpy()
    got = model.apply(variables, input_ids=ids, attention_mask=mask,
                      labels=labels)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_t5_cache_decode_matches_full():
    hf, model, variables, cfg = _make_pair(seed=1)
    rng = np.random.RandomState(1)
    ids = rng.randint(2, 111, size=(1, 7)).astype(np.int32)
    mask = np.ones((1, 7), np.int32)
    dec_ids = rng.randint(2, 111, size=(1, 6)).astype(np.int32)

    full = model.apply(variables, input_ids=ids, attention_mask=mask,
                       decoder_input_ids=dec_ids)
    full = np.asarray(full)

    enc = model.apply(variables, method="encode", input_ids=ids,
                      attention_mask=mask)
    caches = t5_init_cache(cfg, batch=1, max_len=10)
    steps = []
    for t in range(dec_ids.shape[1]):
        logits, caches = model.apply(
            variables, method="decode",
            decoder_input_ids=dec_ids[:, t : t + 1], encoder_states=enc,
            attention_mask=mask, caches=caches, position_offset=t)
        steps.append(np.asarray(logits)[:, 0])
    inc = np.stack(steps, axis=1)
    np.testing.assert_allclose(inc, full, rtol=2e-4, atol=2e-4)


def test_shift_right():
    labels = np.array([[5, 6, -100]], np.int32)
    out = np.asarray(shift_right(labels, decoder_start_token_id=0,
                                 pad_token_id=0))
    assert out.tolist() == [[0, 5, 6]]

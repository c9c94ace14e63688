"""Numerical parity: our flax OPT vs HF torch OPT (random tiny weights).

This is the real weight-import test: build a tiny torch OPTForCausalLM,
convert its state dict with utils/hf_import.import_opt, and require logits
to match on padded batches. Covers pre-LN (125m-style) and post-LN +
word-embed-projection (350m-style) variants, plus KV-cache greedy decode
against the torch generate path.
"""

import numpy as np
import pytest
import torch

from mmgl_tpu.models.opt import OPTConfig, OPTForCausalLM, init_cache
from mmgl_tpu.utils.hf_import import import_opt, torch_state_dict_to_numpy


def _make_pair(hidden=32, layers=2, heads=2, vocab=101, proj=None,
               pre_ln=True, seed=0):
    import transformers

    torch.manual_seed(seed)
    hf_cfg = transformers.OPTConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, ffn_dim=hidden * 4,
        max_position_embeddings=64,
        word_embed_proj_dim=proj or hidden,
        do_layer_norm_before=pre_ln, dropout=0.0, attention_dropout=0.0,
        attn_implementation="eager",  # sdpa adds ~4e-5 torch-internal noise
    )
    hf_model = transformers.OPTForCausalLM(hf_cfg).eval()

    cfg = OPTConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, ffn_dim=hidden * 4,
        max_position_embeddings=64, word_embed_proj_dim=proj or hidden,
        do_layer_norm_before=pre_ln, dropout=0.0, attention_dropout=0.0,
    )
    params = import_opt(torch_state_dict_to_numpy(hf_model.state_dict()))
    return hf_model, OPTForCausalLM(cfg), {"params": params}, cfg


def _batch(vocab, b=2, s=12, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, vocab, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, :3] = 0  # left padding on one row (OPT convention)
    ids[0, :3] = 1
    return ids, mask


@pytest.mark.parametrize("pre_ln,proj", [(True, None), (False, 16)])
def test_logits_match_hf(pre_ln, proj):
    hf_model, model, variables, cfg = _make_pair(pre_ln=pre_ln, proj=proj)
    ids, mask = _batch(cfg.vocab_size)

    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                       attention_mask=torch.tensor(mask.astype(np.int64))
                       ).logits.numpy()
    got, _ = model.apply(variables, input_ids=ids, attention_mask=mask)
    got = np.asarray(got)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    hf_model, model, variables, cfg = _make_pair(seed=3)
    ids, mask = _batch(cfg.vocab_size, b=1, s=8, seed=1)
    mask[:] = 1

    # full forward
    full, _ = model.apply(variables, input_ids=ids, attention_mask=mask)
    full = np.asarray(full)

    # incremental decode with cache
    caches = init_cache(cfg, batch=1, max_len=16)
    logits_steps = []
    for t in range(ids.shape[1]):
        step_ids = ids[:, t : t + 1]
        pos = np.array([[t]], np.int32)
        logits, caches = model.apply(
            variables, input_ids=step_ids, caches=caches, position_ids=pos)
        logits_steps.append(np.asarray(logits)[:, 0])
    inc = np.stack(logits_steps, axis=1)
    np.testing.assert_allclose(inc, full, rtol=2e-4, atol=2e-4)


def test_mpt_cross_attention_layers_exist_and_gate_to_identity():
    """Flamingo gates init at 0 => MPT forward == pure OPT forward at init
    (tanh(0)=0 kills the cross-attn contribution)."""
    import jax

    cfg = OPTConfig(vocab_size=64, hidden_size=16, num_hidden_layers=4,
                    num_attention_heads=2, ffn_dim=32,
                    max_position_embeddings=32, dropout=0.0,
                    cross_attention=True, neighbor_layer_wise=2,
                    peft_type="flamingo")
    model = OPTForCausalLM(cfg)
    ids = np.ones((2, 6), np.int32)
    neigh = np.random.RandomState(0).randn(2, 8, 16).astype(np.float32)
    nmask = np.ones((2, 8), np.int32)
    variables = model.init(jax.random.PRNGKey(0), input_ids=ids,
                           neighbor_embeds=neigh, neighbor_mask=nmask)
    # 4 layers / layer_wise 2 -> 2 cross layers
    assert "neighbor_layers_0" in variables["params"]["decoder"]
    assert "neighbor_layers_1" in variables["params"]["decoder"]
    assert "gating1" in variables["params"]["decoder"]["neighbor_layers_0"]

    with_n, _ = model.apply(variables, input_ids=ids, neighbor_embeds=neigh,
                            neighbor_mask=nmask)
    cfg_plain = OPTConfig(**{**cfg.__dict__, "cross_attention": False,
                             "peft_type": "none"})
    plain = OPTForCausalLM(cfg_plain)
    pvars = {"params": {k: v for k, v in variables["params"].items()}}
    pparams = dict(pvars["params"])
    pparams["decoder"] = {k: v for k, v in variables["params"]["decoder"].items()
                          if not k.startswith("neighbor_layers")}
    without_n, _ = plain.apply({"params": pparams}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(with_n), np.asarray(without_n),
                               rtol=1e-5, atol=1e-5)

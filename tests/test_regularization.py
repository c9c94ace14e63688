"""Layerdrop (modelling_cross_attention.py:581-584) + remat smoke tests."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from mmgl_tpu.models.opt import OPTConfig, OPTForCausalLM

BASE = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, ffn_dim=64, dropout=0.0,
            attention_dropout=0.0, use_pallas=False)


def _ids():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(3, 60, (2, 12)), jnp.int32)


def test_layerdrop_one_skips_every_layer():
    """layerdrop=1.0 at train time must reduce the decoder to its embedding
    + final-LN pipeline — identical to a 0-layer decoder with the same
    embedding params (the reference's `continue` skips the whole layer)."""
    cfg = OPTConfig(layerdrop=1.0, **BASE)
    model = OPTForCausalLM(cfg)
    ids = _ids()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ids)
    out, _ = model.apply(variables, ids, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})

    cfg0 = replace(cfg, num_hidden_layers=0, layerdrop=0.0)
    model0 = OPTForCausalLM(cfg0)
    dec = variables["params"]["decoder"]
    params0 = {"decoder": {k: dec[k] for k in
                           ("embed_tokens", "embed_positions",
                            "final_layer_norm")}}
    out0, _ = model0.apply({"params": params0}, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)


def test_layerdrop_stochastic_and_eval_deterministic():
    cfg = OPTConfig(layerdrop=0.5, **BASE)
    model = OPTForCausalLM(cfg)
    ids = _ids()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ids)
    outs = [np.asarray(model.apply(variables, ids, deterministic=False,
                                   rngs={"dropout": jax.random.PRNGKey(k)})[0])
            for k in range(4)]
    assert any(not np.allclose(outs[0], o) for o in outs[1:]), \
        "layerdrop never fired across 4 rngs"

    # eval mode ignores layerdrop entirely
    full = OPTForCausalLM(replace(cfg, layerdrop=0.0))
    a, _ = model.apply(variables, ids, deterministic=True)
    b, _ = full.apply(variables, ids, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_matches_no_remat():
    """--remat (jax.checkpoint over decoder layers) must not change the
    gradients, only the memory/compute trade."""
    ids = _ids()
    cfg = OPTConfig(**BASE)
    model = OPTForCausalLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), ids)
    model_r = OPTForCausalLM(replace(cfg, remat=True))

    def loss(m):
        def fn(params):
            logits, _ = m.apply({"params": params}, ids)
            return jnp.mean(logits.astype(jnp.float32) ** 2)
        return fn

    g = jax.jit(jax.grad(loss(model)))(variables["params"])
    g_r = jax.jit(jax.grad(loss(model_r)))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g, g_r)


def test_t5_dropout_fires_in_training_mode():
    """T5 dropout (HF placement: embed, residuals, FF inner, final norm —
    the reference trains t5-base with dropout_rate=0.1) must be stochastic
    under deterministic=False and exactly off under deterministic=True."""
    from dataclasses import replace as dc_replace

    from mmgl_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=20, dropout_rate=0.5)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 64, size=(2, 7)).astype(np.int32)
    labels = rng.randint(2, 64, size=(2, 5)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), input_ids=ids, labels=labels)

    det = model.apply(variables, input_ids=ids, labels=labels,
                      deterministic=True)
    a = model.apply(variables, input_ids=ids, labels=labels,
                    deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(variables, input_ids=ids, labels=labels,
                    deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(det)), "dropout inert"
    assert not np.allclose(np.asarray(a), np.asarray(b)), "rng-independent"

    # dropout_rate=0 model: deterministic == training mode exactly
    m0 = T5ForConditionalGeneration(dc_replace(cfg, dropout_rate=0.0))
    c = m0.apply(variables, input_ids=ids, labels=labels,
                 deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(c), np.asarray(det))


def test_uint8_dropout_statistics():
    """The TPU uint8-threshold dropout math (backend-independent function):
    drop rate matches the quantized 1 - round(keep*256)/256 and the
    estimator is mean-preserving (E[out] == x) within sampling error."""
    from mmgl_tpu.ops.dropout import uint8_dropout

    x = jnp.ones((2000, 500), jnp.float32) * 3.0
    out = np.asarray(uint8_dropout(x, jax.random.PRNGKey(0), rate=0.1))

    dropped = (out == 0).mean()
    expected_drop = 1.0 - round(0.9 * 256) / 256.0   # 26/256 = 0.1015625
    np.testing.assert_allclose(dropped, expected_drop, atol=1e-3)
    # survivors are scaled by exactly 256/thr
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 3.0 * 256.0 / 230.0, rtol=1e-6)
    # unbiased: E[out] == x
    np.testing.assert_allclose(out.mean(), 3.0, rtol=2e-3)


def test_uint8_dropout_tiny_rate_is_noop():
    """rate <= ~0.2% rounds keep to 256/256: must return x unchanged rather
    than overflow jnp.uint8(256) (ADVICE r3 medium)."""
    from mmgl_tpu.ops.dropout import uint8_dropout

    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    for rate in (0.001, 0.0019, 1e-6):
        out = np.asarray(uint8_dropout(x, jax.random.PRNGKey(0), rate=rate))
        np.testing.assert_array_equal(out, np.asarray(x))
    # just above the quantization floor it must actually drop
    out = np.asarray(uint8_dropout(
        jnp.ones((512, 512)), jax.random.PRNGKey(0), rate=0.004))
    assert (out == 0).any()


def test_t5_attention_prob_dropout_fires():
    """HF T5 drops the softmax probabilities inside T5Attention during
    training (ADVICE r3); with every OTHER dropout site removed the training
    forward must still be stochastic, proving the attn-prob site is live."""
    from mmgl_tpu.models.t5 import T5Attention, T5Config

    cfg = T5Config(d_model=16, d_kv=4, num_heads=4, dropout_rate=0.5)
    attn = T5Attention(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 16), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), x)

    det, _ = attn.apply(variables, x, deterministic=True)
    a, _ = attn.apply(variables, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    b, _ = attn.apply(variables, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(det))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # deterministic path ignores the rng entirely
    c, _ = attn.apply(variables, x, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(c), np.asarray(det))

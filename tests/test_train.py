"""Train/eval/generate integration on tiny configs (CPU, 8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgl_tpu.config import Arguments
from mmgl_tpu.models.factory import build_model
from mmgl_tpu.parallel import make_mesh, shard_batch, shard_params
from mmgl_tpu.peft import trainable_mask
from mmgl_tpu.train.generate import greedy_generate
from mmgl_tpu.train.optim import build_optimizer, lr_schedule
from mmgl_tpu.train.steps import (create_train_state, make_eval_step,
                                  make_train_step)

S_IN, S_OUT = 24, 8


def _setup(peft="none", name="opt-tiny", accum=1):
    args = Arguments(model_name_or_path=name, context="section_only",
                     neighbor_mode="raw", peft_type=peft,
                     max_input_length=S_IN, max_output_length=S_OUT,
                     grad_accumulation_steps=accum, use_pallas=False,
                     learning_rate=1e-3, lr_warmup_steps=2)
    model, cfg = build_model(args, vocab_size=64)
    t = S_IN + S_OUT if cfg.decoder_only else S_IN
    rng = np.random.RandomState(0)
    b = 2 * max(1, accum)
    batch = {
        "input_ids": rng.randint(4, 64, (b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "labels": rng.randint(4, 64, (b, t if cfg.decoder_only else S_OUT)
                              ).astype(np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    mask = trainable_mask(variables["params"], peft, args.freeze_lm)
    tx = build_optimizer(args, mask)
    state = create_train_state(dict(variables["params"]), tx)
    return args, model, cfg, state, tx, batch, mask


def test_train_step_reduces_loss():
    args, model, cfg, state, tx, batch, _ = _setup()
    step = jax.jit(make_train_step(model, tx, cfg.decoder_only, S_IN, 0))
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_grad_accumulation_matches_big_batch():
    """accum=2 over two microbatches == one batch of both (same gradients;
    post-Adam params are NOT compared — sign normalization amplifies float
    noise on near-zero grads)."""
    from mmgl_tpu.train.steps import make_loss_fn

    args, model, cfg, state, tx, batch, _ = _setup(accum=2)
    loss_fn = make_loss_fn(model, cfg.decoder_only, S_IN, 0)
    grad_fn = jax.jit(jax.grad(lambda p, b: loss_fn(p, b)[0]))

    micro = [{k: v[:2] for k, v in batch.items()},
             {k: v[2:] for k, v in batch.items()}]
    g_micro = [grad_fn(state.params, m) for m in micro]
    g_acc = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, *g_micro)
    g_big = grad_fn(state.params, batch)

    l1, l2 = jax.tree_util.tree_leaves(g_acc), jax.tree_util.tree_leaves(g_big)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_peft_masks_freeze_lm_params():
    args, model, cfg, state, tx, batch, mask = _setup(peft="lora")
    step = jax.jit(make_train_step(model, tx, cfg.decoder_only, S_IN, 0))
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    after = state.params
    # frozen: a base kernel inside the LM must not move
    b_k = before["lm"]["decoder"]["layers_0"]["self_attn"]["k_proj"]["kernel"]
    a_k = after["lm"]["decoder"]["layers_0"]["self_attn"]["k_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(b_k), np.asarray(a_k))
    # trainable: lora_a must move
    b_l = before["lm"]["decoder"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    a_l = after["lm"]["decoder"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    assert np.abs(np.asarray(b_l) - np.asarray(a_l)).max() > 0


def test_eval_step_prediction_shapes():
    args, model, cfg, state, tx, batch, _ = _setup()
    eval_step = jax.jit(make_eval_step(model, cfg.decoder_only, S_IN, 0))
    out = eval_step(state.params, batch)
    assert out["predictions"].shape == (2, S_OUT - 1)  # span = T - S_IN - 1
    assert np.isfinite(float(out["loss"]))


def test_generate_shapes_and_eos_padding():
    args, model, cfg, state, tx, batch, _ = _setup()
    toks = jax.jit(lambda v, b: greedy_generate(model, v, b,
                                                max_new_tokens=6))(
        {"params": state.params}, batch)
    assert toks.shape == (2, 6)
    assert toks.dtype == jnp.int32


def test_t5_generate():
    args, model, cfg, state, tx, batch, _ = _setup(name="t5-tiny")
    toks = jax.jit(lambda v, b: greedy_generate(model, v, b,
                                                max_new_tokens=5))(
        {"params": state.params}, batch)
    assert toks.shape == (2, 5)


def test_lr_schedule_warmup_then_decay():
    args = Arguments(learning_rate=1.0, lr_warmup_steps=10,
                     lr_schedule_step_size=1, steps_per_epoch=20,
                     grad_accumulation_steps=1, lr_schedule_gamma=0.5)
    fn = lr_schedule(args)
    assert float(fn(0)) == pytest.approx(0.1)
    assert float(fn(9)) == pytest.approx(1.0)
    assert float(fn(10)) == pytest.approx(1.0)
    assert float(fn(30)) == pytest.approx(0.5)
    assert float(fn(50)) == pytest.approx(0.25)


def test_sharded_train_step_dp_tp():
    """Full train step over a (4,2) dp x tp mesh of fake CPU devices."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    args, model, cfg, state, tx, batch, _ = _setup()
    batch = {k: np.concatenate([v, v], axis=0) for k, v in batch.items()}  # b=4
    mesh = make_mesh((4, 2))
    step = jax.jit(make_train_step(model, tx, cfg.decoder_only, S_IN, 0))
    with mesh:
        params = shard_params(dict(state.params), mesh)
        state = create_train_state(params, tx)
        sharded = shard_batch(batch, mesh)
        state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_causal_losses_single_pass_parity():
    """causal_losses must equal (causal_lm_loss, summary_loss) exactly —
    it exists to halve the full-vocab CE bandwidth, not change values."""
    import jax.numpy as jnp

    from mmgl_tpu.train.losses import (causal_lm_loss, causal_losses,
                                       summary_loss)

    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
    labels = rng.randint(0, 32, (2, 24)).astype(np.int32)
    labels[0, 5:8] = -100   # fused/neighbor positions
    labels[:, 20:] = 1      # trailing pads (pad_token_id=1)
    labels = jnp.asarray(labels)

    loss, s_loss = causal_losses(logits, labels, max_input_length=16,
                                 pad_token_id=1)
    np.testing.assert_allclose(float(loss),
                               float(causal_lm_loss(logits, labels)),
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(s_loss),
        float(summary_loss(logits, labels, 16, 1)), rtol=1e-6)


def test_split_step_matches_monolithic():
    """make_split_train_step (two programs, donated update) must produce
    byte-identical params/opt_state/metrics to the monolithic step — it
    exists purely because XLA schedules the combined program ~30 ms/step
    slower on v5e (steps.py docstring)."""
    from mmgl_tpu.train.steps import make_split_train_step

    args, model, cfg, state, tx, batch, mask = _setup(peft="lora")
    mono = jax.jit(make_train_step(model, tx, cfg.decoder_only, S_IN, 0,
                                   trainable_mask=mask))
    split = make_split_train_step(model, tx, cfg.decoder_only, S_IN, 0,
                                  trainable_mask=mask)
    rng = jax.random.PRNGKey(7)
    sm = create_train_state(jax.tree_util.tree_map(np.asarray, state.params),
                            tx)
    ss = create_train_state(jax.tree_util.tree_map(np.asarray, state.params),
                            tx)
    for i in range(3):
        r = jax.random.fold_in(rng, i)
        sm, mm = mono(sm, batch, r)
        ss, ms = split(ss, batch, r)
    for key in ("loss", "summary_loss", "grad_norm"):
        np.testing.assert_allclose(float(ms[key]), float(mm[key]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        ss.params, sm.params)
    assert int(ss.step) == int(sm.step) == 3


def test_ce_custom_vjp_matches_autodiff():
    """_ce_core's hand-written backward must equal plain-autodiff CE in
    value AND gradient — it exists to kill the fp32 (B,T,V) residual
    (profiled at 11.5 ms/step on v5e), not to change math."""
    import jax
    import jax.numpy as jnp

    from mmgl_tpu.train.losses import _token_ce

    def ref_ce(logits, labels):
        lf = logits.astype(jnp.float32)
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        logz = jax.nn.logsumexp(lf, axis=-1)
        gold = jnp.take_along_axis(lf, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, logz - gold, 0.0), valid

    rng = np.random.RandomState(7)
    labels = rng.randint(0, 64, (3, 17)).astype(np.int32)
    labels[0, 2:5] = -100
    labels[2, 11:] = -100
    labels = jnp.asarray(labels)
    w = jnp.asarray(rng.rand(3, 17), jnp.float32)  # mixed upstream weights

    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 1e-6)):
        logits = jnp.asarray(rng.randn(3, 17, 64), jnp.float32).astype(dtype)

        def ours(lg):
            ce, _ = _token_ce(lg, labels)
            return (ce * w).sum()

        def theirs(lg):
            ce, _ = ref_ce(lg, labels)
            return (ce * w).sum()

        v0, g0 = jax.value_and_grad(ours)(logits)
        v1, g1 = jax.value_and_grad(theirs)(logits)
        np.testing.assert_allclose(float(v0), float(v1), rtol=tol)
        np.testing.assert_allclose(np.asarray(g0, np.float32),
                                   np.asarray(g1, np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_zero1_moments_sharded_and_trajectory_identical():
    """ZeRO-1 (mesh.zero1_opt_shardings): AdamW moments shard over the data
    axis, the sharding survives steps, and the 3-step trajectory is
    numerically identical to the unsharded run — annotations must change
    layout, never math."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding

    from mmgl_tpu.parallel import apply_zero1

    args, model, cfg, state, tx, batch, _ = _setup()
    batch = {k: np.concatenate([v] * 4, axis=0) for k, v in batch.items()}
    step = jax.jit(make_train_step(model, tx, cfg.decoder_only, S_IN, 0))
    rng = jax.random.PRNGKey(3)

    # reference: unsharded single-device trajectory
    ref_state = create_train_state(
        jax.tree_util.tree_map(np.asarray, dict(state.params)), tx)
    ref_losses = []
    for i in range(3):
        ref_state, m = step(ref_state, batch, jax.random.fold_in(rng, i))
        ref_losses.append(float(m["loss"]))

    mesh = make_mesh((8, 1))
    with mesh:
        params = shard_params(
            jax.tree_util.tree_map(np.asarray, dict(state.params)), mesh)
        z_state = create_train_state(params, tx)
        z_state = apply_zero1(z_state, mesh)

        # moments are sharded over "data"
        def has_data_axis(tree):
            found = []
            for leaf in jax.tree_util.tree_leaves(tree):
                sh = getattr(leaf, "sharding", None)
                if isinstance(sh, NamedSharding) and "data" in tuple(
                        s for s in sh.spec if s):
                    found.append(leaf)
            return found

        sharded_before = has_data_axis(z_state.opt_state)
        assert sharded_before, "no moment picked up the data axis"
        # a sharded moment holds 1/8 of the elements per device
        leaf = sharded_before[0]
        assert leaf.addressable_shards[0].data.size == leaf.size // 8

        sharded_batch = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            z_state, m = step(z_state, sharded_batch,
                              jax.random.fold_in(rng, i))
            losses.append(float(m["loss"]))
        # sharding survives the jitted update (propagated, not constrained)
        assert has_data_axis(z_state.opt_state), \
            "moment sharding lost after a step"

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5)


def test_fused_ce_flag_equivalence():
    """causal_losses(fused_ce=False) (plain-autodiff CE, the memory-lean
    path for billion-param configs) must match the fused custom-VJP default
    in loss values AND gradients."""
    from mmgl_tpu.train.losses import causal_losses

    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(2, 24, 64), jnp.float32)
    labels = rng.randint(0, 64, (2, 24)).astype(np.int32)
    labels[0, 3:6] = -100
    labels = jnp.asarray(labels)

    def total(lg, fused):
        loss, s_loss = causal_losses(lg, labels, max_input_length=16,
                                     pad_token_id=1, fused_ce=fused)
        return loss + 0.5 * s_loss

    vf, gf = jax.value_and_grad(lambda lg: total(lg, True))(logits)
    vp, gp = jax.value_and_grad(lambda lg: total(lg, False))(logits)
    np.testing.assert_allclose(float(vf), float(vp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                               rtol=1e-5, atol=1e-7)


def test_chunked_ce_matches_materialized():
    """chunked_ce streams the vocab in chunks (the (B,T,V) logits/dlogits
    never materialize); value and grads wrt hidden AND the tied embedding
    must match the materialized attend+CE path, including ignore labels,
    a vocab size that does not divide the chunk count, and labels in the
    zero-padded tail region of the last chunk."""
    from mmgl_tpu.train.losses import (causal_losses, chunked_causal_losses,
                                       chunked_ce)

    rng = np.random.RandomState(11)
    b, t, d, v = 3, 19, 16, 203     # v = 203: pads to 2 chunks of 128
    hidden = jnp.asarray(rng.randn(b, t, d), jnp.float32) * 0.3
    emb = jnp.asarray(rng.randn(v, d), jnp.float32) * 0.2
    labels = rng.randint(0, v, (b, t)).astype(np.int32)
    labels[0, 2:5] = -100
    labels[1, 0] = v - 1            # last row of the padded chunk
    labels = jnp.asarray(labels)
    mil = 8

    def mat(h, e):
        logits = jnp.einsum("btd,vd->btv", h, e)
        loss, s_loss = causal_losses(logits, labels, mil, 1)
        return loss + 0.5 * s_loss

    v0, g0 = jax.value_and_grad(mat, argnums=(0, 1))(hidden, emb)
    for n_chunks in (1, 2, 4):
        def ch(h, e, n=n_chunks):
            loss, s_loss = chunked_causal_losses(h, e, labels, mil, 1,
                                                 n_chunks=n)
            return loss + 0.5 * s_loss

        v1, g1 = jax.value_and_grad(ch, argnums=(0, 1))(hidden, emb)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a, b_ in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=1e-5)

    # forward-only entry point agrees with the per-token reference too
    ce = chunked_ce(hidden, emb, labels, 2)
    logits = jnp.einsum("btd,vd->btv", hidden, emb).astype(jnp.float32)
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    ref = jnp.where(valid, logz - gold, 0.0)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_chunked_ce_step_matches_materialized():
    """Full train step with chunked_ce=4 (head folded into the loss, logits
    never materialized) vs the default path: loss, summary_loss, and the
    updated params — including the tied embedding, whose gradient is the
    SUM of the lookup and head contributions — must match."""
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state, make_train_step

    args = Arguments(model_name_or_path="opt-tiny", max_input_length=16,
                     max_output_length=8, use_pallas=False,
                     learning_rate=1e-2, lr_warmup_steps=1)
    model, _ = build_model(args, vocab_size=64)
    rng = np.random.RandomState(3)
    batch = {"input_ids": rng.randint(2, 60, (2, 24)).astype(np.int32),
             "attention_mask": np.ones((2, 24), np.int32),
             "labels": rng.randint(2, 60, (2, 24)).astype(np.int32)}
    batch["labels"][0, 20:] = -100
    variables = model.init(jax.random.PRNGKey(0), batch)
    mask = trainable_mask(variables["params"], "none", False)

    results = {}
    for n_chunks in (0, 4):
        tx = build_optimizer(args, mask)
        state = create_train_state(dict(variables["params"]), tx)
        step = jax.jit(make_train_step(model, tx, decoder_only=True,
                                       max_input_length=16, pad_token_id=1,
                                       chunked_ce=n_chunks))
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        results[n_chunks] = (state.params, metrics)

    m0, m4 = results[0][1], results[4][1]
    np.testing.assert_allclose(float(m4["loss"]), float(m0["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m4["summary_loss"]),
                               float(m0["summary_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m4["grad_norm"]),
                               float(m0["grad_norm"]), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6),
        results[4][0], results[0][0])


def test_chunked_ce_sharded_step_matches_unsharded():
    """chunked_ce under pjit: the embedding is fsdp-sharded over 'data' and
    the vocab scan must compile and match the 1-device chunked step."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    args, model, cfg, state, tx, batch, mask = _setup()
    batch = {k: np.concatenate([v, v], axis=0) for k, v in batch.items()}
    step = jax.jit(make_train_step(model, tx, cfg.decoder_only, S_IN, 0,
                                   chunked_ce=4))
    _, m1 = step(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh((4, 2))
    with mesh:
        params = shard_params(dict(state.params), mesh, fsdp=True)
        state_s = create_train_state(params, tx)
        sharded = shard_batch(batch, mesh)
        _, m8 = step(state_s, sharded, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(m8["grad_norm"]),
                               float(m1["grad_norm"]), rtol=2e-3)

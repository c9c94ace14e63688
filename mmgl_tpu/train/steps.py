"""Jitted train / eval steps.

The reference's train_loop body (run_generation.py:462-494) — forward,
summary-loss bookkeeping, loss/accum backward, optimizer step — becomes ONE
compiled function: gradient accumulation is a jax.lax.scan over microbatches
inside the step (the batch arrives as (accum, micro, ...)), the optimizer
update applies once per call, and metric reductions are on-device scalars
(cross-device reduction happens implicitly through sharded averaging under
pjit — DDP allreduce and meter all_reduce both disappear into XLA).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmgl_tpu.train.losses import (causal_losses, chunked_causal_losses,
                                   seq2seq_loss)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def dropout_stream_key(seed: int) -> jax.Array:
    """Key for the training dropout stream.

    On TPU this uses the `rbg` PRNG (hardware RNG instruction): measured on
    v5e at the production OPT-125M/640-token shape, threefry dropout costs
    35.7 ms/step in the grads program vs 7.6 ms with rbg — 15% of the step
    for identically-distributed Bernoulli masks (scripts/ab_dropout.py).
    (The mask *generation* on top of the stream is further cut by
    FastDropout's uint8 thresholding — ops/dropout.py.) Only the
    dropout/layerdrop stream changes; param init and data shuffling
    keep the default PRNG. CPU keeps threefry so CPU-run parity/trajectory
    tests are bit-stable across this change.
    """
    if jax.default_backend() == "tpu":
        return jax.random.key(seed, impl="rbg")
    return jax.random.PRNGKey(seed)


def make_loss_fn(model, decoder_only: bool, max_input_length: int,
                 pad_token_id: int, fused_ce: bool = True,
                 chunked_ce: int = 0):
    if chunked_ce > 0:
        assert decoder_only, "chunked CE is decoder-only (tied OPT head)"

        def loss_fn(params, batch, rng=None):
            rngs = {"dropout": rng} if rng is not None else None
            out = model.apply({"params": params}, batch,
                              deterministic=rng is None, rngs=rngs,
                              return_hidden=True)
            # the tied head's table: autodiff sums this leaf's gradient
            # contributions from the chunked head matmul here AND the
            # token-embedding lookup inside the forward — exactly the
            # tied-weights gradient the attend() path produces
            emb = params["lm"]["decoder"]["embed_tokens"]["embedding"]
            loss, s_loss = chunked_causal_losses(
                out["hidden"], emb, out["labels"], max_input_length,
                pad_token_id, n_chunks=chunked_ce)
            return loss, {"loss": loss, "summary_loss": s_loss}

        return loss_fn

    def loss_fn(params, batch, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        out = model.apply({"params": params}, batch,
                          deterministic=rng is None, rngs=rngs)
        logits, labels = out["logits"], out["labels"]
        if decoder_only:
            # one CE pass yields both the training loss and the logged
            # "summary loss" metric (run_generation.py:470-481)
            loss, s_loss = causal_losses(logits, labels, max_input_length,
                                         pad_token_id, fused_ce=fused_ce)
        else:
            loss = seq2seq_loss(logits, labels)
            s_loss = loss
        return loss, {"loss": loss, "summary_loss": s_loss}

    return loss_fn


def _make_grads_fn(model, tx, decoder_only: bool, max_input_length: int,
                   pad_token_id: int, grad_accumulation_steps: int,
                   trainable_mask, fused_ce: bool = True,
                   chunked_ce: int = 0):
    """(params, batch, rng) -> (grads, metrics incl. grad_norm)."""
    loss_fn = make_loss_fn(model, decoder_only, max_input_length, pad_token_id,
                           fused_ce=fused_ce, chunked_ce=chunked_ce)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _norm(grads):
        if trainable_mask is None:
            return optax.global_norm(grads)
        kept = jax.tree_util.tree_map(
            lambda g, t: g if t else None, grads, trainable_mask)
        return optax.global_norm(kept)

    def grads_of(params, batch: Dict, rng):
        if grad_accumulation_steps > 1:
            def micro(carry, xs):
                acc_grads, acc_metrics = carry
                mb, mb_rng = xs
                (_, metrics), grads = grad_fn(params, mb, mb_rng)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree_util.tree_map(jnp.add, acc_metrics,
                                                     metrics)
                return (acc_grads, acc_metrics), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            zero_m = {"loss": jnp.zeros(()), "summary_loss": jnp.zeros(())}
            rngs = jax.random.split(rng, grad_accumulation_steps)
            (grads, metrics), _ = jax.lax.scan(
                micro, (zeros, zero_m), (batch, rngs))
            scale = 1.0 / grad_accumulation_steps
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            metrics = jax.tree_util.tree_map(lambda m: m * scale, metrics)
        else:
            (_, metrics), grads = grad_fn(params, batch, rng)
        metrics["grad_norm"] = _norm(grads)
        return grads, metrics

    return grads_of


def make_train_step(model, tx, decoder_only: bool, max_input_length: int,
                    pad_token_id: int,
                    grad_accumulation_steps: int = 1,
                    trainable_mask=None, fused_ce: bool = True,
                    chunked_ce: int = 0) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics) — ONE fused
    program (forward + backward + optimizer update).

    With accumulation > 1 the batch leaves must be shaped
    (accum, micro_batch, ...); gradients average over microbatches via scan.

    trainable_mask (optional bool pytree): grad_norm is then computed over
    trainable leaves ONLY. Beyond monitoring what actually updates, this
    lets XLA dead-code-eliminate the frozen-parameter gradient outputs —
    for PEFT configs (flamingo/LoRA on multi-billion-param bases) that is
    the difference between fitting in HBM and not.

    Production entry point: make_production_train_step (this, jitted with
    state donation).
    """
    grads_of = _make_grads_fn(model, tx, decoder_only, max_input_length,
                              pad_token_id, grad_accumulation_steps,
                              trainable_mask, fused_ce=fused_ce,
                              chunked_ce=chunked_ce)

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        grads, metrics = grads_of(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, metrics

    return step


def make_split_train_step(model, tx, decoder_only: bool,
                          max_input_length: int, pad_token_id: int,
                          grad_accumulation_steps: int = 1,
                          trainable_mask=None) -> Callable:
    """Two-program train step: grads+metrics, then the optimizer update.

    Same contract as jax.jit(make_train_step(...), donate_argnums=(0,)) —
    step(state, batch, rng) -> (state, metrics), the input state is
    CONSUMED (its buffers are donated to the update program).

    History: an r3 experiment (scripts/step_variants.py) measured the split
    30 ms/step faster than the monolithic program, but the comparison was
    confounded — the split variant ran WITHOUT dropout while the monolithic
    baseline ran threefry dropout (35.7 ms/step; scripts/ab_dropout.py).
    With the dropout stream controlled (rbg keys) the two are equal on v5e:
    159.1 ms monolithic-donated vs 160.7 split (scripts/ab_split_tower.py).
    The monolithic step is the production default (one dispatch, full
    buffer aliasing); this stays for comparison and as a two-program option
    when update-side HBM pressure matters. Numerical output is identical
    (test_train.py asserts it).
    """
    grads_of = _make_grads_fn(model, tx, decoder_only, max_input_length,
                              pad_token_id, grad_accumulation_steps,
                              trainable_mask)
    grad_prog = jax.jit(grads_of)

    def _update(params, opt_state, step_ct, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step_ct + 1

    # params/opt_state/grads buffers are all dead after the update
    update_prog = jax.jit(_update, donate_argnums=(0, 1, 3))

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        grads, metrics = grad_prog(state.params, batch, rng)
        params, opt_state, step_ct = update_prog(
            state.params, state.opt_state, state.step, grads)
        return TrainState(step=step_ct, params=params,
                          opt_state=opt_state), metrics

    return step


def make_production_train_step(model, tx, decoder_only: bool,
                               max_input_length: int, pad_token_id: int,
                               grad_accumulation_steps: int = 1,
                               trainable_mask=None,
                               fused_ce: bool = True,
                               chunked_ce: int = 0) -> Callable:
    """The production train step: ONE fused jitted program (forward +
    backward + optimizer update) with the input state donated.

    step(state, batch, rng) -> (state, metrics); the input state is
    CONSUMED (its buffers alias the output state). Measured on v5e at the
    production OPT-125M/640-token shape: 159.1 ms/step — equal to the
    two-program split step (160.7) once the dropout RNG is the rbg stream,
    and simpler (single dispatch, complete donation).
    """
    step = make_train_step(model, tx, decoder_only, max_input_length,
                           pad_token_id, grad_accumulation_steps,
                           trainable_mask, fused_ce=fused_ce,
                           chunked_ce=chunked_ce)
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, decoder_only: bool, max_input_length: int,
                   pad_token_id: int) -> Callable:
    """Teacher-forced eval: loss + argmax predictions over the label span
    (run_generation.py:580-606 val path)."""

    def step(params, batch) -> Dict:
        out = model.apply({"params": params}, batch, deterministic=True)
        logits, labels = out["logits"], out["labels"]
        if decoder_only:
            loss, s_loss = causal_losses(logits, labels, max_input_length,
                                         pad_token_id)
            span = logits[:, max_input_length:-1]
        else:
            loss = seq2seq_loss(logits, labels)
            s_loss = loss
            span = logits
        preds = jnp.argmax(span, axis=-1)
        return {"loss": loss, "summary_loss": s_loss, "predictions": preds}

    return step

"""Optimizers & schedules.

Reference recipe (run_generation.py:321-333): T5 -> Adafactor(lr, no
parameter scaling); OPT/MPT -> AdamW(betas, weight_decay, eps 1e-8) +
GradualWarmupScheduler(linear to lr over lr_warmup_steps) into
StepLR(step_size = lr_schedule_step_size*steps_per_epoch/accum, gamma).
Gradient clipping: the reference's is effectively disabled (fires only when
grad_clip > 2, AFTER the step — SURVEY Q7); we implement the intended
clip-by-global-norm before the update.

PEFT/freezing is an optax.masked pair over the trainable mask
(peft/masks.py): the real optimizer state exists ONLY for trainable leaves
(multi_transform would allocate Adam moments for the whole tree — 2x full
model memory wasted when only adapters train), and frozen leaves get
set_to_zero so tower params never move.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from mmgl_tpu.config import Arguments


def lr_schedule(args: Arguments):
    base = args.learning_rate
    warmup = max(1, args.lr_warmup_steps)
    decay_every = max(1, (args.lr_schedule_step_size * args.steps_per_epoch)
                      // args.grad_accumulation_steps)
    gamma = args.lr_schedule_gamma

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base * jnp.minimum(1.0, (step + 1.0) / warmup)
        n_decays = jnp.floor(jnp.maximum(step - warmup, 0.0) / decay_every)
        decayed = base * gamma ** n_decays
        return jnp.where(step < warmup, warm, decayed)

    return fn


def build_optimizer(args: Arguments, trainable_mask=None) -> optax.GradientTransformation:
    if args.model_name_or_path and "t5" in args.model_name_or_path:
        # min_dim_size_to_factor=2: HF/transformers Adafactor (the
        # reference's optimizer) factors EVERY >=2D tensor; optax's default
        # (128) would keep small matrices unfactored and diverge from the
        # reference trajectory (test_trajectory_parity.py locks this)
        tx = optax.adafactor(learning_rate=args.learning_rate,
                             multiply_by_parameter_scale=False,
                             min_dim_size_to_factor=2)
    else:
        tx = optax.adamw(learning_rate=lr_schedule(args),
                         b1=args.adam_beta1, b2=args.adam_beta2,
                         eps=1e-8, weight_decay=args.weight_decay)
    if args.grad_clip and args.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), tx)
    if trainable_mask is not None:
        inverse = jax.tree_util.tree_map(lambda t: not t, trainable_mask)
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            optax.masked(optax.set_to_zero(), inverse))
    return tx

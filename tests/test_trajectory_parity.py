"""Matched-trajectory training parity vs the reference's own torch stack.

The strongest CIDEr-parity proxy available without WikiWeb2M data or
pretrained weights (VERDICT r2 missing #4): instantiate the reference
MPTForCausalLM (tiny, random init, flamingo gates forced nonzero), port its
exact weights into our flax model, and train BOTH for N steps on the same
synthetic corpus under matched AdamW hyperparameters (betas/eps/wd from
Arguments; identical per-step lr from our lr_schedule, the reference's
GradualWarmup->StepLR recipe, run_generation.py:325-333). Loss curves must
agree step by step and teacher-forced predictions must agree at the end.

Matching choices (documented divergences from the literal snapshot):
  * grad_clip disabled on both sides — the reference's clip effectively
    never fires (SURVEY Q7), ours would fire at 1.0.
  * labels carry no pads, so the reference's full-CE (Q10) and our
    causal_lm_loss are the same mean shifted CE.
Only flamingo-trainable params update on both sides (the reference's
mark_only_peft_as_trainable, modelling_cross_attention.py:731-737, vs our
trainable_mask) — so this also locks the PEFT masking semantics together.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax

from mmgl_tpu.config import Arguments
from mmgl_tpu.peft import trainable_mask
from mmgl_tpu.train.optim import build_optimizer, lr_schedule
from mmgl_tpu.train.steps import create_train_state, make_train_step
from mmgl_tpu.utils.hf_import import import_mpt, torch_state_dict_to_numpy
from tests.test_reference_model_parity import (_mpt_inputs, _our_mpt,
                                               _ref_mpt)

N_STEPS = 120
N_BATCHES = 6


def _corpus():
    """Fixed synthetic corpus: N_BATCHES batches cycled for N_STEPS."""
    out = []
    for i in range(N_BATCHES):
        ids, mask, neigh, nmask = _mpt_inputs(seed=100 + i, b=4, s=20, sn=6)
        out.append({"ids": ids, "mask": mask, "neigh": neigh,
                    "nmask": nmask})
    return out


def test_training_trajectory_matches_reference():
    args = Arguments(model_name_or_path="opt-tiny", learning_rate=5e-4,
                     lr_warmup_steps=10, steps_per_epoch=60,
                     lr_schedule_step_size=1, lr_schedule_gamma=0.5,
                     grad_accumulation_steps=1, grad_clip=0.0)
    sched = lr_schedule(args)

    # ---- reference stack (torch) ----
    ref = _ref_mpt(seed=5)
    ref.train()
    trainable = [p for p in ref.parameters() if p.requires_grad]
    assert trainable, "flamingo must leave cross layers trainable"
    opt = torch.optim.AdamW(trainable, lr=args.learning_rate,
                            betas=(args.adam_beta1, args.adam_beta2),
                            weight_decay=args.weight_decay, eps=1e-8)

    # ---- our stack (flax), identical weights ----
    params = import_mpt(torch_state_dict_to_numpy(ref.state_dict()))
    model, _ = _our_mpt()
    mask = trainable_mask(params, "flamingo", freeze_lm=False)

    def apply_fn(variables, batch, deterministic=True, rngs=None):
        logits, _ = model.apply(variables, input_ids=batch["ids"],
                                attention_mask=batch["mask"],
                                neighbor_embeds=batch["neigh"],
                                neighbor_mask=batch["nmask"],
                                deterministic=deterministic)
        # dec-only label convention: labels == full id sequence (Q10)
        return {"logits": logits, "labels": batch["ids"]}

    shim = type("Shim", (), {"apply": staticmethod(
        lambda v, b, deterministic=True, rngs=None: apply_fn(
            v, b, deterministic, rngs))})
    tx = build_optimizer(args, mask)
    step = jax.jit(make_train_step(shim, tx, decoder_only=True,
                                   max_input_length=0, pad_token_id=-1,
                                   trainable_mask=mask))
    state = create_train_state(params, tx)

    corpus = _corpus()
    ours, theirs = [], []
    rng = jax.random.PRNGKey(0)
    for i in range(N_STEPS):
        b = corpus[i % N_BATCHES]
        # torch step with the SAME per-step lr as our schedule
        for g in opt.param_groups:
            g["lr"] = float(sched(i))
        out = ref(input_ids=torch.tensor(b["ids"].astype(np.int64)),
                  attention_mask=torch.tensor(b["mask"].astype(np.int64)),
                  neighbor_embeds=torch.tensor(b["neigh"]),
                  neighbor_attention_mask=torch.tensor(
                      b["nmask"].astype(np.int64)),
                  labels=torch.tensor(b["ids"].astype(np.int64)))
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        theirs.append(float(out.loss.detach()))

        state, metrics = step(state, b, rng)
        ours.append(float(metrics["loss"]))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    # both must actually learn (flamingo trains only the cross layers,
    # so the drop is modest at this tiny scale)
    assert ours[-1] < ours[0] - 0.05 and theirs[-1] < theirs[0] - 0.05, (
        ours[0], ours[-1], theirs[0], theirs[-1])
    # early steps: tight agreement; later: bounded fp32 drift
    np.testing.assert_allclose(ours[:10], theirs[:10], rtol=1e-4)
    rel = np.abs(ours - theirs) / theirs
    assert rel.max() < 0.005, (rel.max(), rel.argmax())
    assert rel.mean() < 0.001, rel.mean()

    # end-state functional agreement: teacher-forced argmax predictions
    b = corpus[0]
    with torch.no_grad():
        ref_logits = ref(
            input_ids=torch.tensor(b["ids"].astype(np.int64)),
            attention_mask=torch.tensor(b["mask"].astype(np.int64)),
            neighbor_embeds=torch.tensor(b["neigh"]),
            neighbor_attention_mask=torch.tensor(
                b["nmask"].astype(np.int64))).logits.numpy()
    our_logits, _ = model.apply(
        {"params": state.params}, input_ids=b["ids"],
        attention_mask=b["mask"], neighbor_embeds=b["neigh"],
        neighbor_mask=b["nmask"])
    valid = b["mask"].astype(bool)
    agree = (np.argmax(np.asarray(our_logits), -1) == np.argmax(
        ref_logits, -1))[valid].mean()
    assert agree > 0.995, agree
    print(f"\n[trajectory] loss[0] ours={ours[0]:.4f} ref={theirs[0]:.4f} | "
          f"loss[{N_STEPS - 1}] ours={ours[-1]:.4f} ref={theirs[-1]:.4f} | "
          f"max rel diff={rel.max():.4f} | argmax agreement={agree:.4f}")


def test_t5_adafactor_trajectory_matches_reference():
    """Second optimizer family: T5 + Adafactor (the reference's T5 recipe,
    run_generation.py:321-324 — transformers Adafactor with
    scale_parameter=False, relative_step=False, no scheduler) vs our
    optax.adafactor(multiply_by_parameter_scale=False). Same imported
    weights, same corpus, N steps; loss curves must agree."""
    from transformers.optimization import Adafactor

    from mmgl_tpu.train.losses import seq2seq_loss
    from tests.test_t5_parity import _make_pair

    hf, model, variables, cfg = _make_pair(seed=9)
    hf.train()
    args = Arguments(model_name_or_path="t5-tiny", learning_rate=1e-3,
                     grad_clip=0.0)
    opt = Adafactor(hf.parameters(), scale_parameter=False,
                    relative_step=False, warmup_init=False,
                    lr=args.learning_rate)
    tx = build_optimizer(args, None)

    rng = np.random.RandomState(42)
    n_b = 4
    corpus = []
    for i in range(n_b):
        ids = rng.randint(2, 111, size=(4, 9)).astype(np.int32)
        mask = np.ones((4, 9), np.int32)
        mask[0, 7:] = 0
        ids[0, 7:] = 0
        labels = rng.randint(2, 111, size=(4, 5)).astype(np.int32)
        labels[1, 4:] = -100  # enc-dec ignore positions (data.py:284)
        corpus.append({"ids": ids, "mask": mask, "labels": labels})

    def loss_fn(params, b):
        logits = model.apply({"params": params}, input_ids=b["ids"],
                             attention_mask=b["mask"], labels=b["labels"])
        return seq2seq_loss(logits, b["labels"])

    @jax.jit
    def step(params, opt_state, b):
        loss, grads = jax.value_and_grad(loss_fn)(params, b)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    opt_state = tx.init(params)
    ours, theirs = [], []
    for i in range(80):
        b = corpus[i % n_b]
        out = hf(input_ids=torch.tensor(b["ids"].astype(np.int64)),
                 attention_mask=torch.tensor(b["mask"].astype(np.int64)),
                 labels=torch.tensor(b["labels"].astype(np.int64)))
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        theirs.append(float(out.loss.detach()))
        params, opt_state, loss = step(params, opt_state, b)
        ours.append(float(loss))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    assert ours[-1] < ours[0] - 0.2 and theirs[-1] < theirs[0] - 0.2
    np.testing.assert_allclose(ours[:5], theirs[:5], rtol=2e-3)
    rel = np.abs(ours - theirs) / theirs
    assert rel.max() < 0.05, (rel.max(), rel.argmax())
    print(f"\n[t5-adafactor] loss[0] ours={ours[0]:.4f} ref={theirs[0]:.4f}"
          f" | loss[79] ours={ours[-1]:.4f} ref={theirs[-1]:.4f}"
          f" | max rel diff={rel.max():.4f}")

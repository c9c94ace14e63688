"""Mesh/sharding helper units (multi-host plumbing, single-process paths)."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from mmgl_tpu.parallel import (batch_sharding, gather_tokens, make_mesh,
                               param_shardings, shard_batch)


def test_gather_tokens_identity_single_process():
    x = np.arange(12).reshape(3, 4)
    np.testing.assert_array_equal(gather_tokens(x), x)

    mesh = make_mesh((4, 2))
    arr = jax.device_put(np.arange(32).reshape(8, 4), batch_sharding(mesh))
    np.testing.assert_array_equal(gather_tokens(arr),
                                  np.arange(32).reshape(8, 4))


def test_shard_batch_spec_for_accum():
    """Grad-accum batches shard the SECOND axis so lax.scan's leading axis
    stays unsharded."""
    mesh = make_mesh((4, 2))
    batch = {"x": np.zeros((2, 8, 5), np.float32)}
    out = shard_batch(batch, mesh, spec=P(None, "data"))
    spec = out["x"].sharding.spec
    assert tuple(spec) == (None, "data")

    default = shard_batch({"x": np.zeros((8, 5), np.float32)}, mesh)
    assert tuple(default["x"].sharding.spec) == ("data",)


def test_param_shardings_tp_rules_and_guards():
    mesh = make_mesh((4, 2))
    params = {
        "q_proj": {"kernel": np.zeros((16, 8)), "bias": np.zeros((8,))},
        "out_proj": {"kernel": np.zeros((8, 16))},
        "fc1": {"kernel": np.zeros((16, 7))},   # 7 % 2 != 0 -> replicated
        "ln": {"scale": np.zeros((16,))},
    }
    sh = param_shardings(params, mesh)
    assert tuple(sh["q_proj"]["kernel"].spec) == (None, "model")
    assert tuple(sh["out_proj"]["kernel"].spec) == ("model", None)
    assert tuple(sh["fc1"]["kernel"].spec) == ()      # indivisible: guarded
    assert tuple(sh["ln"]["scale"].spec) == ()        # no rule: replicated


def _tp_setup(peft):
    """Tiny OPT + fixed batch for numerical TP-equivalence checks."""
    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state, make_train_step

    s_in, s_out = 16, 8
    args = Arguments(model_name_or_path="opt-tiny", context="section_only",
                     neighbor_mode="raw", peft_type=peft,
                     max_input_length=s_in, max_output_length=s_out,
                     use_pallas=False, learning_rate=1e-3, lr_warmup_steps=2)
    model, cfg = build_model(args, vocab_size=64)
    t = s_in + s_out
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(4, 64, (4, t)).astype(np.int32),
        "attention_mask": np.ones((4, t), np.int32),
        "labels": rng.randint(4, 64, (4, t)).astype(np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    mask = trainable_mask(variables["params"], peft, args.freeze_lm)
    tx = build_optimizer(args, mask)
    train = make_train_step(model, tx, cfg.decoder_only, s_in, 0,
                            trainable_mask=mask)

    def evalf(params, b):
        out = model.apply({"params": params}, b, deterministic=True)
        return {"logits": out["logits"]}

    return dict(variables["params"]), tx, batch, train, evalf


def _tp_run(params, tx, batch, train, evalf, mesh_shape, fsdp=False):
    """One train step + one eval forward on the given mesh; everything
    fetched to host for cross-topology comparison."""
    from mmgl_tpu.parallel import shard_batch, shard_params
    from mmgl_tpu.train.steps import create_train_state

    mesh = make_mesh(mesh_shape)
    with mesh:
        sp = shard_params(params, mesh, fsdp=fsdp)
        state = create_train_state(sp, tx)
        sb = shard_batch(batch, mesh)
        state, metrics = jax.jit(train)(state, sb, jax.random.PRNGKey(0))
        out = jax.jit(evalf)(state.params, sb)
    return (float(metrics["loss"]), float(metrics["grad_norm"]),
            np.asarray(out["logits"]), state)


def test_tp_numerical_equivalence():
    """tp=1 vs tp=2 vs dp2 x tp2 on identical params/batch: logits, loss and
    grad-norm must agree — a wrong row/column rule in _TP_RULES would pass
    the isfinite-only sharded test but fail here. The lora variant covers
    the lora_b column rule (mesh.py)."""
    import pytest

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    from mmgl_tpu.train.steps import create_train_state

    for peft in ("none", "lora"):
        params, tx, batch, train, evalf = _tp_setup(peft)
        # unsharded single-device truth
        state = create_train_state(params, tx)
        state, metrics = jax.jit(train)(state, batch, jax.random.PRNGKey(0))
        out = jax.jit(evalf)(state.params, batch)
        base = (float(metrics["loss"]), float(metrics["grad_norm"]),
                np.asarray(out["logits"]))
        for shape in ((4, 1), (1, 2), (2, 2)):
            got = _tp_run(params, tx, batch, train, evalf, shape)
            np.testing.assert_allclose(got[0], base[0], rtol=1e-5,
                                       err_msg=f"loss {peft} {shape}")
            np.testing.assert_allclose(got[1], base[1], rtol=1e-4,
                                       err_msg=f"grad_norm {peft} {shape}")
            np.testing.assert_allclose(got[2], base[2], rtol=2e-4, atol=2e-4,
                                       err_msg=f"logits {peft} {shape}")


def test_fsdp_numerical_equivalence_and_sharding():
    """--fsdp (ZeRO-3 from annotations): params shard over the data axis,
    the post-step loss/grad-norm/logits match the unsharded truth, params
    remain data-sharded after the step (XLA must keep the FSDP layout, not
    silently re-replicate), and the optimizer moments inherit the sharding
    (ZeRO-1 for free)."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding

    from mmgl_tpu.train.steps import create_train_state

    def data_sharded_leaves(tree):
        out = []
        for leaf in jax.tree_util.tree_leaves(tree):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding):
                axes = set()
                for s in sh.spec:
                    axes.update(s if isinstance(s, (tuple, list)) else [s])
                if "data" in axes:
                    out.append(leaf)
        return out

    params, tx, batch, train, evalf = _tp_setup("none")
    batch = {k: np.concatenate([v] * 2, axis=0) for k, v in batch.items()}
    state = create_train_state(params, tx)
    state, metrics = jax.jit(train)(state, batch, jax.random.PRNGKey(0))
    out = jax.jit(evalf)(state.params, batch)
    base = (float(metrics["loss"]), float(metrics["grad_norm"]),
            np.asarray(out["logits"]))

    for shape in ((8, 1), (4, 2)):   # pure FSDP and FSDP x TP
        got = _tp_run(params, tx, batch, train, evalf, shape, fsdp=True)
        np.testing.assert_allclose(got[0], base[0], rtol=1e-5,
                                   err_msg=f"loss fsdp {shape}")
        np.testing.assert_allclose(got[1], base[1], rtol=1e-4,
                                   err_msg=f"grad_norm fsdp {shape}")
        np.testing.assert_allclose(got[2], base[2], rtol=2e-4, atol=2e-4,
                                   err_msg=f"logits fsdp {shape}")
        end_state = got[3]
        sharded = data_sharded_leaves(end_state.params)
        assert sharded, f"no param kept the data axis after a step {shape}"
        leaf = max(sharded, key=lambda l: l.size)
        n_data = shape[0]
        assert leaf.addressable_shards[0].data.size == leaf.size // n_data, \
            f"param shard not 1/{n_data} of the leaf {shape}"
        assert data_sharded_leaves(end_state.opt_state), \
            f"moments did not inherit the FSDP sharding {shape}"

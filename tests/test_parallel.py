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

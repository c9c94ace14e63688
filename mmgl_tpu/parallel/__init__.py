from mmgl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, param_shardings, batch_sharding, shard_params, shard_batch,
    gather_tokens, init_distributed, zero1_opt_shardings, apply_zero1)

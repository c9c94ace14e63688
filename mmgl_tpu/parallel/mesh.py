"""Device mesh + sharding rules (DP/TP over ICI).

Replaces the reference's single-node DDP/NCCL stack (mp.spawn +
init_process_group + DistributedDataParallel, run_generation.py:265-319) with
a jax.sharding.Mesh: the batch shards over the "data" axis, tensor-parallel
params shard over the "model" axis, and XLA inserts the gradient psums /
activation collectives that DDP and megatron-style layers do by hand.

Rules are path-regex -> PartitionSpec, megatron-style:
  qkv/fc1 kernels column-parallel (output dim on "model"),
  out_proj/fc2 kernels row-parallel (input dim on "model"),
  embeddings vocab-sharded, everything else replicated.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder taking the model-axis name)
_TP_RULES = [
    # attention projections (LoRADense nests kernels under /dense/)
    (r"(q_proj|k_proj|v_proj|query|key|value)(/dense)?/kernel$",
     lambda m: P(None, m)),
    (r"(q_proj|k_proj|v_proj|query|key|value)(/dense)?/bias$",
     lambda m: P(m)),
    (r"(out_proj|out|o)/kernel$", lambda m: P(m, None)),
    # FFN
    (r"(fc1|intermediate|wi|wi_0|wi_1|q|k|v)/kernel$", lambda m: P(None, m)),
    (r"(fc1|intermediate|wi|wi_0|wi_1)/bias$", lambda m: P(m)),
    (r"(fc2|output|wo)/kernel$", lambda m: P(m, None)),
    # embeddings: vocab-sharded
    (r"embed_tokens/embedding$", lambda m: P(m, None)),
    (r"shared/embedding$", lambda m: P(m, None)),
    (r"lm_head/kernel$", lambda m: P(None, m)),
    # LoRA adapters: B column-parallel to match the base projection
    (r"lora_a$", lambda m: P(None, None)),
    (r"lora_b$", lambda m: P(None, m)),
]


def make_mesh(shape: Tuple[int, ...] = None,
              axes: Tuple[str, ...] = ("data", "model")) -> Mesh:
    """Mesh over the local devices.

    shape=None or the default (1,1) means "use everything as data-parallel";
    an explicit non-default shape is honored exactly, taking the first
    prod(shape) devices (so --mesh_shape 1,1 really runs single-device)."""
    devices = np.asarray(jax.devices())
    if shape is None or tuple(shape) == (1, 1):
        shape = (devices.size, 1)
    n = int(np.prod(shape))
    if n > devices.size:
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {devices.size}")
    return Mesh(devices[:n].reshape(shape), axes)


def _spec_for(path: str, model_axis: str) -> P:
    for pattern, builder in _TP_RULES:
        if re.search(pattern, path):
            return builder(model_axis)
    return P()


def param_shardings(params: Dict, mesh: Mesh,
                    model_axis: str = "model",
                    fsdp: bool = False, data_axis: str = "data",
                    fsdp_min_size: int = 1024) -> Dict:
    """NamedSharding pytree for the param tree.

    TP (when the model axis has >1 devices): megatron path-regex rules.
    FSDP (ZeRO-3, `fsdp=True`): every weight leaf >= fsdp_min_size elements
    additionally shards its first free, evenly-divisible dimension over the
    data axis. Params then live sharded in HBM; XLA all-gathers each layer's
    weights just-in-time for its matmuls and reduce-scatters the gradients —
    the FSDP schedule, derived entirely from sharding annotations. (The
    reference's DDP replicates the full model per GPU,
    run_generation.py:319.) Optimizer moments initialized with
    jnp.zeros_like inherit the sharding, so ZeRO-1 comes for free.
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    tp = mesh.shape.get(model_axis, 1) > 1
    n_data = mesh.shape.get(data_axis, 1)
    out = {}
    for path, leaf in flat.items():
        spec = _spec_for(path, model_axis) if tp else P()
        # drop specs that don't divide the axis size evenly
        if tp and any(s is not None for s in spec):
            ok = True
            for dim, axis_name in enumerate(spec):
                if axis_name is None:
                    continue
                if dim >= leaf.ndim or leaf.shape[dim] % mesh.shape[axis_name]:
                    ok = False
            if not ok:
                spec = P()
        if fsdp and n_data > 1 and np.size(leaf) >= fsdp_min_size:
            dims = list(spec) + [None] * (leaf.ndim - len(spec))
            for dim in range(leaf.ndim):
                if dims[dim] is None and leaf.shape[dim] % n_data == 0:
                    dims[dim] = data_axis
                    spec = P(*dims)
                    break
        out[path] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out, sep="/")


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for host batches (DistributedSampler parity)."""
    return NamedSharding(mesh, P(data_axis))


def shard_params(params: Dict, mesh: Mesh, fsdp: bool = False) -> Dict:
    shardings = param_shardings(params, mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch: Dict, mesh: Mesh,
                spec: Optional[P] = None) -> Dict:
    """Host batch -> batch-sharded global device arrays.

    Single-process: plain device_put. Multi-process (DCN): each host holds
    only its shard of the global batch (the loader is sharded by
    process_index, replacing DistributedSampler, run_generation.py:366-368);
    make_array_from_process_local_data assembles the global array without
    any cross-host data movement.

    spec defaults to P("data") (batch axis 0); grad-accumulation batches
    shaped (accum, batch, ...) pass P(None, "data") so the scan axis stays
    unsharded.
    """
    sharding = (batch_sharding(mesh) if spec is None
                else NamedSharding(mesh, spec))
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def gather_tokens(x) -> np.ndarray:
    """Gather a (possibly batch-sharded, multi-host) array onto every host.

    Counterpart of the reference's eval all_gather of generated/label ids
    (run_generation.py:608-617). Single-process: plain fetch. Multi-process
    jax.Array: reshard to fully-replicated with a jitted identity (XLA
    all-gathers exactly the distinct shards, so model-axis replicas of the
    same batch rows are NOT duplicated — naive per-device shard
    concatenation would double rows on a dp x tp mesh and misalign the
    pred/ref zip downstream). Host numpy (e.g. labels local to this
    process's loader shard): process_allgather, tiled along the batch axis.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        sharding = x.sharding
        assert isinstance(sharding, NamedSharding), sharding
        replicate = jax.jit(
            lambda a: a, out_shardings=NamedSharding(sharding.mesh, P()))
        return np.asarray(jax.device_get(replicate(x)))
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x), tiled=True))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (replaces dist.init_process_group + mp.spawn,
    run_generation.py:265-283): one call per host; the JAX runtime handles
    rendezvous and builds the global device view over DCN."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def zero1_opt_shardings(opt_state, mesh: Mesh, data_axis: str = "data",
                        min_size: int = 1024):
    """ZeRO-1 sharding tree for optimizer state: moments over the data axis.

    The reference's DDP replicates AdamW moments on every rank
    (run_generation.py:319 — torch DDP has no optimizer-state sharding).
    On a TPU mesh the moments feed only the elementwise update, so each
    data-parallel chip can own a slice: annotate the moments with a
    data-axis sharding and XLA partitions the update and all-gathers only
    the parameter deltas — the ZeRO-1 pattern, from sharding annotations
    alone, no hand-written collectives.

    Each array leaf keeps its existing spec (e.g. a TP axis inherited from
    its parameter) and additionally shards the first free, evenly-divisible
    dimension over `data_axis`. Leaves smaller than `min_size` elements
    (step counts, scalars) stay as they are.
    """
    n_data = mesh.shape.get(data_axis, 1)

    def refine(leaf):
        if not hasattr(leaf, "ndim"):
            return None
        if isinstance(getattr(leaf, "sharding", None), NamedSharding):
            spec = list(leaf.sharding.spec)
        else:
            spec = []
        spec = spec + [None] * (leaf.ndim - len(spec))
        used = set()
        for s in spec:
            used.update(s if isinstance(s, (tuple, list)) else [s])
        if (n_data > 1 and leaf.ndim >= 1 and leaf.size >= min_size
                and data_axis not in used):
            for dim in range(leaf.ndim):
                if spec[dim] is None and leaf.shape[dim] % n_data == 0:
                    spec[dim] = data_axis
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(refine, opt_state)


def apply_zero1(state, mesh: Mesh, data_axis: str = "data"):
    """Reshard a TrainState's opt_state per zero1_opt_shardings."""
    shardings = zero1_opt_shardings(state.opt_state, mesh, data_axis)
    opt_state = jax.tree_util.tree_map(
        lambda a, s: a if s is None else jax.device_put(a, s),
        state.opt_state, shardings)
    return state.replace(opt_state=opt_state)

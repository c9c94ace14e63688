"""Orbax checkpointing.

Counterpart of the reference's torch.save/load flow
(run_generation.py:336-350,400-416): save {epoch, best_acc1, params (minus
frozen tower weights), opt_state} when val BLEU-4 improves; restore for
resume and for the final test pass. Tower stripping mirrors the
'.text_model'/'.visual_model' key filter (run_generation.py:402-405) — the
towers are frozen and reloadable from their pretrained checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPTR = None


def _checkpointer() -> "ocp.PyTreeCheckpointer":
    """One process-wide checkpointer: each PyTreeCheckpointer owns thread
    pools, and constructing a fresh one per save (2x per epoch over a long
    run) accumulates host memory (r4 soak RSS finding)."""
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.PyTreeCheckpointer()
    return _CKPTR


def _strip_towers(params: Dict) -> Dict:
    return {k: v for k, v in params.items()
            if k not in ("text_model", "visual_model")}


def save_checkpoint(path: str, state, epoch: int, best_acc1: float,
                    keep_towers: bool = False):
    path = os.path.abspath(path)
    params = state.params if keep_towers else _strip_towers(state.params)
    # leave leaves as (possibly sharded, multi-host) jax.Arrays — orbax
    # writes them collectively; materializing with np.asarray would raise
    # on model-sharded leaves that span processes (e.g. --mesh_shape 1,N)
    payload = {
        "epoch": np.asarray(epoch),
        "best_acc1": np.asarray(best_acc1, np.float32),
        "params": params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    _checkpointer().save(path, payload, force=True)


def restore_checkpoint(path: str, state=None,
                       keep_towers: bool = False) -> Optional[Dict[str, Any]]:
    """Restore a checkpoint, optionally re-typed against a live TrainState.

    Without `state`, orbax returns an untyped pytree (plain dicts/lists) —
    fine for reading scalars or params, but `opt_state` loses its optax
    container types (ScaleByAdamState, multi_transform inner states) and
    cannot be fed back into `tx.update`. Passing the current TrainState
    builds a typed template so every leaf restores into the exact structure
    the optimizer expects (reference resume: run_generation.py:336-350).
    """
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    ckptr = _checkpointer()
    if state is None:
        return ckptr.restore(path)
    params = state.params if keep_towers else _strip_towers(state.params)
    # abstract template: structure + dtype + live sharding, without
    # materializing values, so non-fully-addressable (model-sharded,
    # multi-host) leaves don't raise. Carrying the leaf's sharding matters:
    # jit-produced arrays can hold GSPMD shardings orbax can't serialize to
    # its `_sharding` file at save time, so a template without shardings
    # would make restore consult that file and miss (e.g. --zero1 moments).
    def _abs(x):
        if np.ndim(x) == 0:
            return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                    sharding=getattr(x, "sharding", None))

    abstract = lambda t: jax.tree_util.tree_map(_abs, t)
    template = {
        "epoch": np.asarray(0),
        "best_acc1": np.asarray(0.0, np.float32),
        "params": abstract(params),
        "opt_state": abstract(state.opt_state),
        "step": np.asarray(0),
    }
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = ckptr.restore(path, item=template, restore_args=restore_args)
    return _canonicalize_restored(restored)


def _canonicalize_restored(tree):
    """Round-trip restored device arrays through host + device_put.

    Orbax-restored arrays can carry on-device layouts that differ from
    what the fresh-init path (device_put of host values) produces. A jit
    train step then compiles a DIFFERENT executable for the resumed run —
    numerically fine for matmuls, but the TPU `rbg` dropout PRNG's
    bit-stream is only stable per-executable (jax PRNG docs: RngBitGenerator
    output may vary across compilations), so a layout-changed resume
    silently re-randomizes the dropout stream. The r4 soak caught this as a
    non-exact kill+resume replay (every post-resume loss window differed,
    reproducibly). The roundtrip re-creates each leaf exactly the way the
    fresh path does — same sharding, default layout — so the resumed step
    hits the original executable (and its rbg stream) again. Values are
    copied bitwise. Non-fully-addressable (multi-host-sharded) leaves are
    left untouched: they cannot be materialized locally, and the multi-host
    path re-shards explicitly.
    """
    def _c(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return jax.device_put(np.asarray(x), x.sharding)
        return x

    return jax.tree_util.tree_map(_c, tree)


def merge_restored_params(current: Dict, restored: Dict) -> Dict:
    """Overlay restored (tower-stripped) params onto the current tree."""
    merged = dict(current)
    for k, v in restored.items():
        if k in ("text_model", "visual_model") and k not in current:
            continue
        merged[k] = v
    return merged

"""PEFT as parameter-partition masks.

The reference delegates PEFT to HF `peft` wrappers (modelling_self_attention.py
:76-102) and a custom `mark_only_peft_as_trainable` for the MPT path
(modelling_cross_attention.py:731-737). The JAX-idiomatic equivalent: the
adapter/virtual-token params live in the one param pytree (LoRADense in
models/layers.py, PrefixTuning/PromptTuning in peft/virtual_tokens.py), and a
boolean mask of the same structure decides what the optimizer updates
(optax.masked). This also fixes SURVEY Q8 — the reference's LoRA
target_modules match no actual module names; ours target the real q/v
projections.
"""

from __future__ import annotations

from typing import Dict

import jax
from flax import traverse_util


def _path_trainable(path: str, peft_type: str, freeze_lm: bool) -> bool:
    """Trainability of one param leaf by its '/'-joined path."""
    # frozen towers: never trainable (reference freezes text/vision models,
    # modelling_self_attention.py:117-119,129-132)
    if path.startswith(("text_model/", "visual_model/")):
        return False

    is_lm = path.startswith(("lm/", "decoder/", "encoder/", "shared/",
                             "lm_head/"))
    # adapter params & fusion-side modules (projections, position embeddings,
    # pooler, gnn/lpe) always train
    if "lora_a" in path or "lora_b" in path:
        return True
    if "prefix_tuning" in path or "prompt_tuning" in path:
        return True
    if "neighbor_layers_" in path:  # flamingo/MPT cross-attn layers
        return True

    if peft_type == "lora":
        # reference keeps lm_head trainable (modules_to_save=["lm_head"],
        # modelling_self_attention.py:86)
        return ("lm_head" in path) if is_lm else True
    if peft_type in ("prefix", "prompt"):
        return (not is_lm)
    if peft_type == "flamingo":
        # MPT: ONLY cross-attn layers train (mark_only_peft_as_trainable);
        # non-LM fusion params (projections etc.) stay trainable
        return (not is_lm)
    # peft_type == none
    if freeze_lm and is_lm:
        return False
    return True


def trainable_mask(params: Dict, peft_type: str = "none",
                   freeze_lm: bool = False) -> Dict:
    """Boolean pytree with the same structure as `params`."""
    flat = traverse_util.flatten_dict(params, sep="/")
    mask = {k: _path_trainable(k, peft_type, freeze_lm) for k in flat}
    return traverse_util.unflatten_dict(mask, sep="/")


def count_params(params: Dict, mask: Dict = None) -> Dict[str, int]:
    """{'trainable': n, 'non_trainable': n, 'total': n} (parity with
    utils.get_params_count, language_modelling/utils.py:26-30)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(x.size for x in leaves)
    if mask is None:
        return {"trainable": total, "non_trainable": 0, "total": total}
    mleaves = jax.tree_util.tree_leaves(mask)
    trainable = sum(x.size for x, m in zip(leaves, mleaves) if m)
    return {"trainable": trainable, "non_trainable": total - trainable,
            "total": total}

"""Console/observability meters.

TPU-native counterpart of the reference's AverageMeter/ProgressMeter
(language_modelling/utils.py:66-137). Cross-device reduction happens inside
the jitted step via jax.lax.psum (parallel/mesh.py) rather than an explicit
NCCL all_reduce on host tensors, so `all_reduce` here merges values that were
already summed across the mesh (a no-op fold kept for API familiarity).
"""

from __future__ import annotations

from enum import Enum


class Summary(Enum):
    NONE = 0
    AVERAGE = 1
    SUM = 2
    COUNT = 3


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f",
                 summary_type: Summary = Summary.AVERAGE):
        self.name = name
        self.fmt = fmt
        self.summary_type = summary_type
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def all_reduce(self):
        # metric sums are already psum'd on-device in the step fn; keep the
        # reference surface without a host-side collective.
        if self.count:
            self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)

    def summary(self):
        if self.summary_type is Summary.NONE:
            return ""
        if self.summary_type is Summary.AVERAGE:
            return f"{self.name} {self.avg:.3f}"
        if self.summary_type is Summary.SUM:
            return f"{self.name} {self.sum:.3f}"
        if self.summary_type is Summary.COUNT:
            return f"{self.name} {self.count:.3f}"
        raise ValueError(f"invalid summary type {self.summary_type!r}")


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        num_digits = len(str(num_batches))
        fmt = "{:" + str(num_digits) + "d}"
        self.batch_fmtstr = "[" + fmt + "/" + fmt.format(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries))

    def display_summary(self):
        entries = [" *"] + [m.summary() for m in self.meters]
        print(" ".join(entries))


def get_params_count(params, mask=None) -> tuple:
    """(per-leaf table, trainable, non-trainable) given a param pytree and an
    optional trainability mask. Counterpart of utils.get_params_count
    (language_modelling/utils.py:26-30)."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(params)
    mleaves = (jax.tree_util.tree_leaves(mask) if mask is not None
               else [True] * len(leaves))
    table = [(jax.tree_util.keystr(path), leaf.size, tuple(leaf.shape), bool(m))
             for (path, leaf), m in zip(leaves, mleaves)]
    trainable = sum(x[1] for x in table if x[3])
    non_trainable = sum(x[1] for x in table if not x[3])
    return table, trainable, non_trainable


def get_params_count_str(params, mask=None, max_name_len: int = 72) -> str:
    """Formatted parameter table (utils.get_params_count_str, utils.py:33-46)."""
    table, trainable, non_trainable = get_params_count(params, mask)
    pad = 40
    out = ["=" * (max_name_len + pad),
           f"| {'Module':<{max_name_len}} | {'Trainable':<9} "
           f"| {'Shape':>16} | {'Count':>12} |",
           "-" * (max_name_len + pad)]
    for name, count, shape, is_train in table:
        out.append(f"| {name[:max_name_len]:<{max_name_len}} "
                   f"| {str(is_train):<9} | {str(shape):>16} | {count:>12,} |")
    out.append("-" * (max_name_len + pad))
    out.append(f"| {'Total trainable params':<{max_name_len}} |           "
               f"|                  | {trainable:>12,} |")
    out.append(f"| {'Total non-trainable params':<{max_name_len}} |           "
               f"|                  | {non_trainable:>12,} |")
    out.append("=" * (max_name_len + pad))
    return "\n".join(out)


def postprocess_text(preds, labels):
    """Strip + sentence-per-line (rougeLsum convention) — counterpart of
    utils.postprocess_text (language_modelling/utils.py:55-63); uses nltk
    when available, falling back to period splitting."""
    def split(text):
        text = text.strip()
        try:
            import nltk

            return "\n".join(nltk.sent_tokenize(text))
        except Exception:
            parts = [p.strip() for p in text.split(". ") if p.strip()]
            return "\n".join(parts)

    return [split(p) for p in preds], [split(l) for l in labels]

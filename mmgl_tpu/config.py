"""Public configuration surface.

Mirrors the reference `Arguments` dataclass (run_generation.py:66-229) flag for
flag so that a user of the reference can drive this framework with the same
command lines, and adds TPU-specific knobs (mesh shape, dtypes, remat) that
replace the reference's DDP/NCCL environment assumptions.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class Arguments:
    # ---- data (reference run_generation.py:75-92) ----
    overwrite_cache: bool = False
    dataset: str = "wikiweb2m"
    task: str = "section"
    context: str = "section_only"  # section_only | section_all | text_only | all
    max_input_length: int = 512
    max_output_length: int = 128

    # ---- logging (reference :94-108) ----
    wandb_project: str = "MMGL"
    wandb_run: str = "default"
    log_dir: str = "log"
    save_dir: Optional[str] = None
    resume: Optional[str] = None
    # every N epochs also write a "latest" checkpoint (mid-run kill+resume;
    # 0 = reference behavior: only the best-val checkpoint is kept)
    save_every_epochs: int = 0
    # when > 0: at each epoch boundary, if host RSS exceeds this many GB,
    # checkpoint and re-exec the process, resuming at the next epoch. Because
    # kill+resume is an exact replay (scripts/verify_replay.py), the restart
    # is trajectory-invisible. Mitigates environments whose host->device
    # transfer layer leaks host memory per transfer (measured on this
    # harness's tunnel client at ~1.0x transferred bytes:
    # scripts/probe_rss_leak.py). 0 = off.
    rss_watchdog_gb: float = 0.0

    # ---- precision & seeding (reference :110-118) ----
    seed: Optional[int] = None
    fp16: bool = False   # kept for surface parity; TPU path maps it to fp32
    bf16: bool = False

    test: bool = False

    # ---- batching (reference :124-132) ----
    per_device_train_batch_size: int = 4
    per_device_val_batch_size: int = 4
    dataloader_num_workers: int = 4

    # ---- schedule (reference :134-148) ----
    start_epoch: int = 0
    epochs: int = 90
    steps_per_epoch: int = 2000
    val_steps_per_epoch: int = 1000
    print_freq: int = 50

    # ---- optimization (reference :150-176) ----
    learning_rate: float = 0.001
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    weight_decay: float = 0.01
    grad_accumulation_steps: int = 4
    grad_clip: float = 1.0
    lr_warmup_steps: int = 2000
    lr_schedule_step_size: int = 5
    lr_schedule_gamma: float = 0.1

    # ---- model (reference :178-213) ----
    model_name_or_path: Optional[str] = None
    decoder_only: bool = False
    cross_attention: bool = False
    text_model: str = "roberta-base"
    visual_model: str = "openai/clip-vit-base-patch16"
    n_text_tokens: int = 4
    n_visual_tokens: int = 4
    freeze_lm: bool = False
    neighbor_mode: str = "raw"  # raw | embedding | cross_attention
    layerdrop: float = 0.0      # decoder layerdrop (cross_attention.py:581-584)
    max_text_neighbors: int = 11
    max_image_neighbors: int = 5
    position_type: str = "none"  # none | embedding | laplacian | gnn

    # ---- PEFT (reference :215-229) ----
    num_neighbor_layers: int = 4  # == reference's intended `neighbor_layer_wise`
    peft_type: str = "none"  # none | prefix | prompt | lora | flamingo
    lora_r: int = 64
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0

    # ---- TPU-native extensions (no reference equivalent; replace DDP/NCCL) ----
    data_dir: str = "./wikiweb2m/raw"     # parquet/pickle/image root (data.py:46)
    mesh_shape: Tuple[int, ...] = (1, 1)  # (data, model) axes over the device grid
    mesh_axes: Tuple[str, ...] = ("data", "model")
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    remat: bool = False                   # activation checkpointing (jax.checkpoint)
    use_pallas: bool = True               # fused attention kernels on TPU
    cache_neighbor_embeddings: bool = False  # precompute frozen-tower outputs
    neighbor_cache_dir: Optional[str] = None  # persist tower outputs to disk
                                          # (None -> in-memory only)
    tokenizer_path: Optional[str] = None  # local HF tokenizer dir; None -> byte tokenizer
    prefetch_batches: int = 10            # loader prefetch depth (DataLoader prefetch_factor=10)
    zero1: bool = False                   # ZeRO-1: shard optimizer moments over the data axis
    fsdp: bool = False                    # ZeRO-3: shard params (and their moments) over the data axis
    fused_ce: bool = True                 # custom-VJP CE (saves a softmax recompute; pins bf16 logits —
                                          # set False on memory-tight billion-param configs instead of --remat)
    chunked_ce: int = 0                   # >0: vocab-chunked CE with the tied head folded in (n_chunks);
                                          # the (B,T,V) logits/dlogits never materialize. OPT-family only.
                                          # Adoption measurement-gated (scripts/ab_ce.py --chunked)
    distributed: bool = False             # multi-host: jax.distributed.initialize()
    coordinator_address: Optional[str] = None  # host:port of process 0 (multi-host)
    num_processes: Optional[int] = None   # world size for jax.distributed
    process_id: Optional[int] = None      # this host's rank for jax.distributed
    log_to_wandb: bool = False
    profile_dir: Optional[str] = None     # jax.profiler trace output (TPU-native
                                          # upgrade of the wall-clock meters,
                                          # SURVEY §5 tracing)
    compilation_cache_dir: Optional[str] = "~/.cache/mmgl_tpu_xla"
                                          # persistent XLA compile cache. Besides
                                          # skipping recompiles across runs, it
                                          # pins the EXECUTABLE a resumed process
                                          # runs to the one the original run
                                          # compiled — which pins the rbg dropout
                                          # bit-stream (executable-dependent per
                                          # jax PRNG docs) and keeps kill+resume
                                          # an exact replay. "" / "none" disables.

    def __post_init__(self):
        if isinstance(self.mesh_shape, list):
            self.mesh_shape = tuple(self.mesh_shape)
        if isinstance(self.mesh_axes, list):
            self.mesh_axes = tuple(self.mesh_axes)
        if self.fp16 and not self.bf16:
            # SURVEY Q6: the reference's --fp16 casts to fp32
            # (run_generation.py:304-305); we reproduce that documented
            # behavior — fp16 trains fp32 unless bf16 is also requested.
            self.compute_dtype = "float32"
        if self.neighbor_mode == "cross_attention":
            # SURVEY Q3: the reference's MPT gate wants
            # neighbor_mode=="cross_attention" but its dataset only emits
            # neighbor tensors for "embedding" (and the README documents
            # only raw|embedding). Both names mean the same batches here;
            # normalize so the assembler builds neighbor tensors either way.
            self.neighbor_mode = "embedding"


_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(Arguments) if f.type in ("bool", bool)
}


def parse_args(argv=None) -> Arguments:
    """CLI parser with the same flag names as the reference's HfArgumentParser."""
    parser = argparse.ArgumentParser(description="MMGL-TPU generation fine-tuning")
    for f in dataclasses.fields(Arguments):
        name = "--" + f.name
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.name in _BOOL_FIELDS:
            parser.add_argument(name, type=_str2bool, nargs="?", const=True,
                                default=default)
        elif f.name in ("mesh_shape", "mesh_axes"):
            parser.add_argument(name, type=str, default=None)
        elif f.type in ("int", "Optional[int]"):
            parser.add_argument(name, type=int, default=default)
        elif f.type in ("float", "Optional[float]"):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    ns = parser.parse_args(argv)
    kwargs = vars(ns)
    if kwargs.get("mesh_shape") is None:
        kwargs["mesh_shape"] = (1, 1)
    elif isinstance(kwargs["mesh_shape"], str):
        kwargs["mesh_shape"] = tuple(int(x) for x in kwargs["mesh_shape"].split(",") if x)
    if kwargs.get("mesh_axes") is None:
        kwargs["mesh_axes"] = ("data", "model")
    elif isinstance(kwargs["mesh_axes"], str):
        kwargs["mesh_axes"] = tuple(x for x in kwargs["mesh_axes"].split(",") if x)
    return Arguments(**kwargs)


def _str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "t", "yes", "y")

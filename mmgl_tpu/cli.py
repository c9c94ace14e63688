"""Training/eval driver — counterpart of language_modelling/run_generation.py.

Same public surface (Arguments flags, metric names, best-BLEU4 checkpoint
selection, epoch-0 pre-train eval, final test pass with the best checkpoint)
with the DDP machinery replaced by a device mesh: one process drives all
local TPU chips; pjit shards the batch over the "data" axis and (optionally)
params over "model".

Data: real WikiWeb2M parquet if present under --data_dir, else a synthetic
corpus (tests/benchmarks; the ETL in data/preprocess.py produces the real
files).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mmgl_tpu.config import Arguments, parse_args
from mmgl_tpu.data.assemble import AssemblerConfig, WikiWeb2MAssembler
from mmgl_tpu.data.loader import PrefetchLoader
from mmgl_tpu.data.synthetic import make_synthetic_corpus
from mmgl_tpu.metrics import Cider, bleu_score, rouge_score
from mmgl_tpu.models.factory import build_model, maybe_import_pretrained
from mmgl_tpu.parallel import (apply_zero1, gather_tokens, init_distributed,
                               make_mesh, shard_batch, shard_params)
from mmgl_tpu.peft import count_params, trainable_mask
from mmgl_tpu.train import checkpoints
from mmgl_tpu.train.generate import greedy_generate
from mmgl_tpu.train.optim import build_optimizer
from mmgl_tpu.train.steps import (create_train_state, dropout_stream_key,
                                  make_eval_step, make_production_train_step)
from mmgl_tpu.utils import AverageMeter, ProgressMeter, get_tokenizer


def setup_data(args: Arguments, tokenizer):
    cfg = AssemblerConfig.from_args(args)
    parquet = os.path.join(args.data_dir, "wikiweb2m_train_large.parquet")
    if os.path.exists(parquet):
        from mmgl_tpu.data.store import load_wikiweb2m
        from mmgl_tpu.data.images import disk_image_provider

        train_s, val_s, test_s, ids = load_wikiweb2m(args.task, args.data_dir)
        provider = disk_image_provider(args.data_dir, args.visual_model)
        mk = lambda store, idl: WikiWeb2MAssembler(cfg, store, idl, tokenizer,
                                                   provider)
        return (mk(train_s, ids["train"]), mk(val_s, ids["val"]),
                mk(test_s, ids["test"]))
    # synthetic fallback
    print(f"[data] no parquet under {args.data_dir}; using synthetic corpus")
    cfg.image_size = 32 if "tiny" in (args.model_name_or_path or "") else 224
    store, ids, provider = make_synthetic_corpus(
        num_pages=64, image_size=cfg.image_size, seed=args.seed or 0)
    n = len(ids)
    cut1, cut2 = int(n * 0.8), int(n * 0.9)
    mk = lambda idl: WikiWeb2MAssembler(cfg, store, idl, tokenizer, provider)
    return mk(ids[:cut1]), mk(ids[cut1:cut2]), mk(ids[cut2:])


def first_period_truncate(caption: str) -> str:
    """Eval heuristic (run_generation.py:624-630)."""
    stop = caption.find(".")
    return caption[:stop] if stop > 5 else caption


def main(argv=None):
    args = parse_args(argv)
    run_training(args)


def _honor_platform_env():
    """Re-assert JAX_PLATFORMS via jax.config.

    The axon sitecustomize registers the TPU backend before user code runs,
    which latches the platform list past the env var; backends are still
    lazy, so jax.config.update here (before any device use) restores
    `JAX_PLATFORMS=cpu ... python -m mmgl_tpu.cli` semantics.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized (e.g. under pytest conftest)


def _host_rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        pass
    return 0.0


def _watchdog_reexec(args, state, epoch, best_acc1, step_fp, n_procs,
                     is_main, wandb_run):
    """RSS watchdog (--rss_watchdog_gb): checkpoint at this epoch boundary
    and replace the process image, resuming at epoch+1. Kill+resume is an
    exact replay (epoch-indexed dropout stream + (epoch, pass)-deterministic
    loader, scripts/verify_replay.py), so the restart does not perturb the
    trajectory. Exists because some host<->device transport layers leak host
    memory per transfer (scripts/probe_rss_leak.py measured ~1.0x transferred
    bytes per step on this harness's tunnel client); re-exec is the only way
    to return that memory. No-ops (with a warning) when it cannot guarantee
    a correct resume: multi-process runs (ranks would need to agree) or an
    explicit --save_dir outside --log_dir (resume paths are log_dir-relative,
    cli.py resume block)."""
    import sys

    rss = _host_rss_gb()
    if n_procs > 1:
        if is_main:
            print(f"[rss-watchdog] RSS {rss:.2f} GB > "
                  f"{args.rss_watchdog_gb} GB but --distributed: skipping "
                  "re-exec (ranks cannot agree on a host-local trigger)")
        return
    run_dir = os.path.dirname(args.save_dir)
    resume_name = os.path.relpath(run_dir, args.log_dir)
    if resume_name.startswith(".."):
        print(f"[rss-watchdog] RSS {rss:.2f} GB > {args.rss_watchdog_gb} GB "
              f"but --save_dir {args.save_dir} is outside --log_dir "
              f"{args.log_dir}: cannot form a resume path, skipping re-exec")
        return
    if not (args.save_every_epochs
            and (epoch + 1) % args.save_every_epochs == 0):
        # the periodic save didn't cover this boundary — write one now so
        # the re-exec'd process resumes at exactly epoch+1
        checkpoints.save_checkpoint(args.save_dir + "_latest", state,
                                    epoch, best_acc1)
        if step_fp is not None:
            checkpoints.save_fingerprint(args.save_dir + "_latest", step_fp)
    if wandb_run is not None:
        wandb_run.finish()
    argv = list(sys.argv[1:])
    if "--resume" in argv:
        i = argv.index("--resume")
        del argv[i:i + 2]
    argv += ["--resume", resume_name]
    print(f"[rss-watchdog] RSS {rss:.2f} GB > {args.rss_watchdog_gb} GB "
          f"after epoch {epoch}: re-exec'ing to reclaim host memory "
          f"(resume {resume_name}, exact replay)")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, "-m", "mmgl_tpu.cli"] + argv)


def run_training(args: Arguments, log_fn=None) -> Dict[str, float]:
    _honor_platform_env()
    if args.compilation_cache_dir and str(
            args.compilation_cache_dir).lower() not in ("", "none"):
        cache_dir = os.path.expanduser(args.compilation_cache_dir)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache every program (default skips sub-second compiles)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception as e:
            print(f"[xla-cache] disabled: {e}")
    if args.distributed:
        # multi-host (DCN): replaces mp.spawn + dist.init_process_group
        # (run_generation.py:265-283)
        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)
    is_main = jax.process_index() == 0
    n_procs = jax.process_count()
    if args.seed is not None:
        np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed or 0)   # param-init stream
    # dropout stream: hardware-RNG keys on TPU (see dropout_stream_key)
    drop_rng = dropout_stream_key(args.seed or 0)

    # log dir (run_generation.py:238-244)
    i = 0
    log_dir = os.path.join(args.log_dir, f"{args.wandb_run}_{i}")
    while os.path.exists(log_dir):
        i += 1
        log_dir = os.path.join(args.log_dir, f"{args.wandb_run}_{i}")
    if is_main:
        os.makedirs(log_dir, exist_ok=True)
    if args.save_dir is None:
        args.save_dir = os.path.join(log_dir, "ckpt")

    wandb_run = None
    if args.log_to_wandb and is_main:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project,
                                   name=args.wandb_run)
            wandb_run.config.update(vars(args), allow_val_change=True)
        except Exception as e:  # offline boxes
            print(f"[wandb] disabled: {e}")

    def log(scalars: Dict[str, float], step: int):
        if wandb_run is not None:
            wandb_run.log(scalars, step=step)
        if log_fn is not None:
            log_fn(scalars, step)

    tokenizer = get_tokenizer(args.tokenizer_path)

    # model select by substring (run_generation.py:286-301)
    name = args.model_name_or_path or "opt-tiny"
    args.decoder_only = "t5" not in name
    args.cross_attention = "mpt" in name
    model, fcfg = build_model(args, vocab_size=tokenizer.vocab_size,
                              tokenizer=tokenizer)

    train_ds, val_ds, test_ds = setup_data(args, tokenizer)
    print(f"Training with {len(train_ds)} examples, validating with "
          f"{len(val_ds)} examples, testing with {len(test_ds)} examples.")

    mesh = make_mesh(args.mesh_shape, args.mesh_axes)
    n_data = mesh.shape.get("data", 1)
    # loaders produce this host's shard of the global batch; with one
    # process the shard IS the global batch (DistributedSampler parity,
    # run_generation.py:366-368)
    global_bs = args.per_device_train_batch_size * n_data
    val_bs = args.per_device_val_batch_size * n_data
    local_bs = global_bs // n_procs
    local_val_bs = val_bs // n_procs
    shard_kw = dict(shard_id=jax.process_index(), num_shards=n_procs)

    # init params on a sample batch
    sample_loader = PrefetchLoader(train_ds, batch_size=local_bs,
                                   prefetch=1, num_workers=1, **shard_kw)
    sample_batch = next(iter(sample_loader))
    variables = model.init(rng, sample_batch)
    params = maybe_import_pretrained(dict(variables["params"]), args)

    mask = trainable_mask(params, args.peft_type, args.freeze_lm)
    counts = count_params(params, mask)
    if is_main:
        # full per-module table like run_generation.py:310-315
        from mmgl_tpu.utils.meters import get_params_count_str

        print(get_params_count_str(params, mask))
    print(f"Total params: {counts['total']:,} | trainable: "
          f"{counts['trainable']:,} | non-trainable: "
          f"{counts['non_trainable']:,}")
    if wandb_run is not None:
        wandb_run.config.update({"total_params": counts["total"],
                                 "trainable_params": counts["trainable"],
                                 "non_trainable_params":
                                 counts["non_trainable"]},
                                allow_val_change=True)

    if args.cache_neighbor_embeddings and (
            args.neighbor_mode == "embedding"
            or args.context in ("section_all", "all")):
        from mmgl_tpu.data.neighbor_cache import CachedNeighborDataset

        print("[neighbor-cache] precomputing frozen tower outputs ...")
        variables_c = {"params": params}
        cache_dir = args.neighbor_cache_dir
        mk_cache = lambda ds, split: CachedNeighborDataset(
            ds, model, variables_c, cache_dir=cache_dir, split=split,
            num_workers=args.dataloader_num_workers)
        train_ds = mk_cache(train_ds, "train")
        val_ds = mk_cache(val_ds, "val")
        test_ds = mk_cache(test_ds, "test")

    tx = build_optimizer(args, mask)
    with mesh:
        params = shard_params(params, mesh, fsdp=args.fsdp)
        state = create_train_state(params, tx)
        if args.zero1:
            # ZeRO-1: moments sharded over the data axis (see mesh.py)
            state = apply_zero1(state, mesh)

    # resume (run_generation.py:336-350). Candidates: the best-val
    # checkpoint AND, when --save_every_epochs wrote one, the periodic
    # "latest" checkpoint — whichever is newer wins (mid-run kill+resume,
    # scripts/soak.py).
    best_acc1 = 0.0
    restored_fp = None
    if args.resume:
        ckpt_path = os.path.join(args.log_dir, args.resume, "ckpt")
        restored = checkpoints.restore_checkpoint(ckpt_path, state=state)
        latest = checkpoints.restore_checkpoint(ckpt_path + "_latest",
                                                state=state)
        if latest is not None and (restored is None or
                                   int(latest["epoch"])
                                   > int(restored["epoch"])):
            restored, ckpt_path = latest, ckpt_path + "_latest"
        if restored is not None:
            print(f"=> loaded checkpoint '{ckpt_path}' "
                  f"(epoch {restored['epoch']})")
            restored_fp = checkpoints.load_fingerprint(ckpt_path)
            # epoch E was COMPLETE when saved: resume replays E+1 onward.
            # Divergence from the reference, which restarts AT the saved
            # epoch and so retrains it on post-E weights
            # (run_generation.py:342 vs :408) — see DIVERGENCES.md; with
            # the epoch-indexed dropout stream and (epoch, pass)-
            # deterministic loader this makes kill+resume an exact replay
            # of the uninterrupted trajectory.
            args.start_epoch = int(restored["epoch"]) + 1
            best_acc1 = float(restored["best_acc1"])
            state = state.replace(
                params=checkpoints.merge_restored_params(
                    dict(state.params), restored["params"]),
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"]))
            if args.zero1:
                with mesh:
                    state = apply_zero1(state, mesh)
        else:
            print(f"=> no checkpoint found at '{ckpt_path}'")

    accum = max(1, args.grad_accumulation_steps)
    pad_id = tokenizer.pad_token_id
    # one fused donated program (make_production_train_step docstring);
    # the input state is consumed each call
    train_step = make_production_train_step(
        model, tx, fcfg.decoder_only, args.max_input_length, pad_id,
        grad_accumulation_steps=accum, trainable_mask=mask,
        fused_ce=args.fused_ce,
        chunked_ce=args.chunked_ce if fcfg.decoder_only else 0)
    eval_step = jax.jit(make_eval_step(
        model, fcfg.decoder_only, args.max_input_length, pad_id))
    generate_fn = jax.jit(partial(greedy_generate, model,
                                  max_new_tokens=32))

    train_loader = PrefetchLoader(
        train_ds, batch_size=local_bs * accum, shuffle=True,
        seed=args.seed or 0, prefetch=args.prefetch_batches,
        num_workers=args.dataloader_num_workers, **shard_kw)
    val_loader = PrefetchLoader(val_ds, batch_size=local_val_bs,
                                prefetch=args.prefetch_batches,
                                num_workers=args.dataloader_num_workers,
                                **shard_kw)
    test_loader = PrefetchLoader(test_ds, batch_size=local_val_bs,
                                 prefetch=args.prefetch_batches,
                                 num_workers=args.dataloader_num_workers,
                                 **shard_kw)

    def reshape_accum(batch):
        if accum == 1:
            return batch
        return {k: v.reshape((accum, local_bs) + v.shape[1:])
                for k, v in batch.items()}

    if args.test:
        results = evaluate_loop(test_loader, model, state, eval_step,
                                generate_fn, tokenizer, args, fcfg, mesh,
                                args.start_epoch, log, prefix="test")
        return results

    results = {}
    train_updates = 0
    step_fp = None   # executable fingerprint, computed once at first update
    updates_per_epoch = max(1, args.steps_per_epoch // accum)
    for epoch in range(args.start_epoch, args.epochs):
        epoch_start = time.time()
        if epoch == 0:
            evaluate_loop(val_loader, model, state, eval_step, generate_fn,
                          tokenizer, args, fcfg, mesh, epoch - 1, log)

        # ---- train (run_generation.py:430-524) ----
        train_loader.set_epoch(epoch)
        # epoch-indexed dropout stream: a killed-and-resumed run re-derives
        # the exact keys the uninterrupted run used for this epoch (the
        # loader is already (epoch, pass)-deterministic), so mid-training
        # kill+resume reproduces the loss trajectory (scripts/soak.py)
        drop_rng = jax.random.fold_in(dropout_stream_key(args.seed or 0),
                                      epoch)
        batch_time = AverageMeter("Time", ":6.3f")
        data_time = AverageMeter("Data", ":6.3f")
        losses = AverageMeter("Loss", ":.4e")
        progress = ProgressMeter(updates_per_epoch, [batch_time, losses],
                                 prefix=f"Epoch: [{epoch}]")
        end = time.time()
        if args.profile_dir and epoch == args.start_epoch:
            jax.profiler.start_trace(args.profile_dir)
        it = iter(train_loader)
        spec = P(None, "data") if accum > 1 else None
        data_pass = [0]

        def next_sharded(u):
            nonlocal it
            try:
                batch = next(it)
            except StopIteration:
                # deterministic (epoch, pass) reshuffle — identical on every
                # process, preserving shard disjointness mid-epoch
                data_pass[0] += 1
                train_loader.set_epoch(epoch, data_pass[0])
                it = iter(train_loader)
                batch = next(it)
            with mesh:
                return shard_batch(reshape_accum(batch), mesh, spec=spec)

        # double-buffer: the NEXT batch's host->device transfer is issued
        # while the device executes the current (async-dispatched) step, so
        # input streaming overlaps compute instead of serializing with it
        sharded = next_sharded(0)
        dbg = os.environ.get("MMGL_DEBUG_DUMP")
        for u in range(updates_per_epoch):
            data_time.update(time.time() - end)
            drop_rng, step_rng = jax.random.split(drop_rng)
            if step_fp is None:
                # once per run, BEFORE the first step (donation invalidates
                # the input state's buffers): fingerprint the executable
                # this run compiles. A resumed run whose fingerprint differs
                # from the original's recompiles a different program — the
                # rbg dropout stream re-randomizes and kill+resume is no
                # longer an exact replay (r4 soak root-cause). Detect and
                # surface it instead of failing silently.
                try:
                    with mesh:
                        step_fp = checkpoints.executable_fingerprint(
                            train_step, state, sharded, step_rng)
                except Exception as e:   # forensics must never kill a run
                    print(f"[replay] fingerprint unavailable: {e}")
                    step_fp = {"hash": "unavailable"}
                if restored_fp is not None:
                    match = restored_fp.get("hash") == step_fp.get("hash")
                    log({"replay/executable_match": float(match)},
                        int(state.step))
                    if not match:
                        print("[replay] WARNING: resumed executable "
                              f"fingerprint {step_fp.get('hash')} != "
                              f"checkpoint's {restored_fp.get('hash')} "
                              "(jax upgrade / flag / code / shape change?) "
                              "— the rbg dropout stream differs and this "
                              "resume is NOT an exact replay of the "
                              "original trajectory.")
            if dbg and u < 64:
                # replay-divergence forensics: per-update inputs + output.
                # MMGL_DEBUG_DUMP=<file> appends one line per early update;
                # diffing a fresh run against a resumed run pinpoints which
                # stream (rng key / batch bytes / params / step math) breaks
                # first when a kill+resume is not an exact replay.
                import hashlib
                kd = np.asarray(jax.random.key_data(step_rng)).tolist()
                bh = hashlib.md5(b"".join(
                    np.ascontiguousarray(np.asarray(sharded[k])).tobytes()
                    for k in sorted(sharded))).hexdigest()[:12]
                ph = hashlib.md5(b"".join(
                    np.ascontiguousarray(np.asarray(x)).tobytes()
                    for x in jax.tree_util.tree_leaves(state.params)
                )).hexdigest()[:12] if u == 0 else "-"
                # arg-signature fingerprint: if values match but the loss
                # differs, the jit signature (dtype/sharding/layout of any
                # state leaf) picked a different executable
                sig = hashlib.md5("|".join(
                    f"{x.aval}/{x.sharding}/{getattr(x, 'format', '')}"
                    for x in jax.tree_util.tree_leaves(state)
                    if isinstance(x, jax.Array)).encode()
                ).hexdigest()[:12] if u == 0 else "-"
                with open(dbg, "a") as f:
                    f.write(f"epoch={epoch} u={u} key={kd} batch={bh} "
                            f"params={ph} sig={sig} "
                            f"step={int(state.step)}\n")
            with mesh:
                state, metrics = train_step(state, sharded, step_rng)
            train_updates += 1
            if dbg and u < 64:
                with open(dbg, "a") as f:
                    f.write(f"epoch={epoch} u={u} "
                            f"loss={float(metrics['loss']):.10e}\n")
            if u + 1 < updates_per_epoch:
                sharded = next_sharded(u + 1)
            batch_time.update(time.time() - end)
            end = time.time()

            if (args.profile_dir and epoch == args.start_epoch
                    and u == min(3, updates_per_epoch - 1)):
                jax.profiler.stop_trace()
            actual_step = epoch * updates_per_epoch + u + 1
            if actual_step == 1 or actual_step % args.print_freq == 0:
                # fetch the loss ONLY at print intervals: a per-step
                # float(...) is a device sync that stalls the dispatch
                # pipeline (the reference pays .item() every step,
                # run_generation.py:496-517; we sample instead). The fetch
                # drains the queue, so batch_time.avg stays honest across a
                # print window.
                loss_val = float(metrics["summary_loss" if fcfg.decoder_only
                                         else "loss"])
                losses.update(loss_val, global_bs)
                ex_per_sec = (global_bs * accum) / max(batch_time.avg, 1e-9)
                progress.display(u + 1)
                log({"train/loss": losses.avg,
                     "metrics/total_secs_per_batch": batch_time.avg,
                     "metrics/data_secs_per_batch": data_time.avg,
                     "metrics/examples_per_sec": ex_per_sec}, actual_step)
                losses.reset(); batch_time.reset(); data_time.reset()

        # ---- validate + best checkpoint (run_generation.py:394-416) ----
        results = evaluate_loop(val_loader, model, state, eval_step,
                                generate_fn, tokenizer, args, fcfg, mesh,
                                epoch, log)
        acc1 = results["bleu4"]
        if acc1 > best_acc1 or epoch == 0:
            # the decision is identical on every rank (metrics come from the
            # gathered global predictions), and orbax's save is a collective
            # — ALL ranks call it; orbax writes from the primary host only
            # (the reference's rank-0 torch.save, run_generation.py:397-416)
            best_acc1 = max(acc1, best_acc1)
            if is_main:
                print("=> save best val model ...", args.save_dir)
            checkpoints.save_checkpoint(args.save_dir, state, epoch, acc1)
            if is_main and step_fp is not None:
                checkpoints.save_fingerprint(args.save_dir, step_fp)
        if args.save_every_epochs and (
                (epoch + 1) % args.save_every_epochs == 0):
            # periodic "latest" checkpoint for mid-run kill+resume — kept
            # separate from the best-val checkpoint the final test restores
            checkpoints.save_checkpoint(args.save_dir + "_latest", state,
                                        epoch, best_acc1)
            if is_main and step_fp is not None:
                checkpoints.save_fingerprint(args.save_dir + "_latest",
                                             step_fp)
        print(f"Epoch {epoch} time: {time.time() - epoch_start}s")
        if (args.rss_watchdog_gb and epoch < args.epochs - 1
                and _host_rss_gb() > args.rss_watchdog_gb):
            _watchdog_reexec(args, state, epoch, best_acc1, step_fp,
                             n_procs, is_main, wandb_run)

    # ---- final test with best checkpoint (run_generation.py:421-428) ----
    if n_procs > 1:
        # non-zero ranks must not read the checkpoint before rank 0
        # finishes writing it
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mmgl-final-ckpt")
    restored = checkpoints.restore_checkpoint(args.save_dir, state=state)
    if restored is not None:
        state = state.replace(params=checkpoints.merge_restored_params(
            dict(state.params), restored["params"]))
    results = evaluate_loop(test_loader, model, state, eval_step, generate_fn,
                            tokenizer, args, fcfg, mesh, args.epochs, log,
                            prefix="test")
    results["train_updates"] = float(train_updates)
    if wandb_run is not None:
        wandb_run.finish()
    return results


def _score_corpus(all_preds, all_refs, parallel: bool = True):
    """BLEU-1..4 + ROUGE + CIDEr over the gathered corpus.

    The three metric families are independent pure-python/numpy work
    (~11 s serial at 10K sections); run them in separate processes so the
    wall-clock is the slowest family, not the sum. Falls back to inline on
    any pool failure (e.g. daemonized test processes)."""
    if parallel and len(all_preds) >= 2048:
        try:
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(max_workers=3) as pool:
                fb = pool.submit(_score_bleus, all_preds, all_refs)
                fr = pool.submit(_score_rouges, all_preds, all_refs)
                fc = pool.submit(_score_cider, all_preds, all_refs)
                return fb.result(), fr.result(), fc.result()
        except Exception as e:
            print(f"[eval] metric process pool unavailable ({e}); "
                  f"scoring inline")
    return (_score_bleus(all_preds, all_refs),
            _score_rouges(all_preds, all_refs),
            _score_cider(all_preds, all_refs))


# module-level so ProcessPoolExecutor can pickle them
def _score_bleus(preds, refs):
    return [bleu_score(preds, refs, n_gram=n) for n in (1, 2, 3, 4)]


def _score_rouges(preds, refs):
    return rouge_score(preds, refs)


def _score_cider(preds, refs):
    cands = {i: [p] for i, p in enumerate(preds)}
    rdict = {i: r for i, r in enumerate(refs)}
    return Cider().compute_score(rdict, cands)[0]


def evaluate_loop(loader, model, state, eval_step, generate_fn, tokenizer,
                  args: Arguments, fcfg, mesh, epoch: int, log,
                  prefix: str = "val") -> Dict[str, float]:
    """Counterpart of run_generation.py:527-703.

    Pipelined: batch i+1's device compute is dispatched BEFORE batch i's
    outputs are fetched/decoded, so host-side gather + detokenization
    overlaps device eval instead of serializing with it (the reference
    syncs on .item()/decode every batch, run_generation.py:580-630). Loss
    scalars stay on device until the end."""
    losses = AverageMeter("Loss", ":.4e")
    # forward wall-clock, the reference's total_secs_captioning
    # (run_generation.py:509-512)
    forward_time = AverageMeter("Forward", ":6.3f")
    all_preds, all_refs = [], []
    pending_losses = []
    steps = 0
    variables = {"params": state.params}

    def process(item):
        generated, labels = item
        # cross-host gather of ids before decode (run_generation.py:608-617)
        generated = gather_tokens(generated)
        labels = gather_tokens(labels)
        # invariant: one prediction per gathered reference row — catches
        # model-axis replica duplication in the gather, which would
        # misalign the pred/ref zip and silently corrupt every metric
        assert generated.shape[0] == labels.shape[0], (
            f"gathered preds ({generated.shape[0]}) != refs "
            f"({labels.shape[0]}) — replica-duplicated gather?")
        preds = tokenizer.batch_decode(np.asarray(generated),
                                       skip_special_tokens=True)
        labels = np.where(labels == -100, tokenizer.pad_token_id, labels)
        refs = tokenizer.batch_decode(labels, skip_special_tokens=True)
        for p, r in zip(preds, refs):
            all_preds.append(first_period_truncate(p))
            all_refs.append([r])

    pending = None
    fwd_start = time.time()
    for batch in loader:
        with mesh:
            sharded = shard_batch(batch, mesh)
            out = eval_step(state.params, sharded)
            if prefix == "test":
                generated = generate_fn(variables, sharded)
            else:
                generated = out["predictions"]
        pending_losses.append((out["loss"], batch["input_ids"].shape[0]))
        if fcfg.decoder_only:
            labels = batch["labels"][:, args.max_input_length + 1:]
        else:
            labels = batch["labels"]
        # process the PREVIOUS batch's outputs while the device runs this one
        if pending is not None:
            process(pending)
        pending = (generated, labels)
        steps += 1
        if steps >= args.val_steps_per_epoch:
            break
    if pending is not None:
        process(pending)
    for loss_dev, bs in pending_losses:
        losses.update(float(loss_dev), bs)
    forward_time.update((time.time() - fwd_start) / max(1, steps), steps)

    if not all_preds:
        raise RuntimeError(
            f"{prefix} loader produced no batches — dataset smaller than the "
            f"global batch (drop_last)? len={len(loader.dataset)} "
            f"batch_size={loader.batch_size}")

    print("=" * 30)
    print(f"Computing BLEU with {len(all_preds)} generated captions and "
          f"{len(all_refs)} groundtruth captions.")
    for i, cap in enumerate(all_preds[:5]):
        print(f"{i}) {cap}")
    print("=" * 30)

    bleus, rouges, cider = _score_corpus(all_preds, all_refs)

    print("BLEU", *bleus)
    print("ROUGE", rouges["rouge1_fmeasure"], rouges["rouge2_fmeasure"],
          rouges["rougeL_fmeasure"], rouges["rougeLsum_fmeasure"])
    print("CIDER", cider)

    actual_step = max(0, (epoch + 1) * args.steps_per_epoch
                      // args.grad_accumulation_steps)
    log({f"{prefix}/loss": losses.avg,
         "metrics/total_secs_captioning": forward_time.avg,
         f"{prefix}/bleu1": bleus[0], f"{prefix}/bleu2": bleus[1],
         f"{prefix}/bleu3": bleus[2], f"{prefix}/bleu4": bleus[3],
         f"{prefix}/rouge1": rouges["rouge1_fmeasure"],
         f"{prefix}/rouge2": rouges["rouge2_fmeasure"],
         f"{prefix}/rougeL": rouges["rougeL_fmeasure"],
         f"{prefix}/rougeLsum": rouges["rougeLsum_fmeasure"],
         f"{prefix}/cider": cider}, actual_step)

    return {"loss": losses.avg, "bleu1": bleus[0], "bleu2": bleus[1],
            "bleu3": bleus[2], "bleu4": bleus[3], "cider": cider,
            "n_eval_pairs": float(len(all_preds)),
            **{k: v for k, v in rouges.items()}}


if __name__ == "__main__":
    main()

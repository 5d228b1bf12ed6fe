"""Training entry: dataset/model/optimizer assembly + epoch loop.

Behavioural reference: train.py in the upstream repo (main :293-425,
run_one_epoch :228-290, get_dataloader :106-153, prepare_params :189-225,
create_ckpt_path :170-186). Differences by design:

- one process per host; devices come from the jax mesh, not torchrun
  (``num_gpus``/``workers`` config keys are honored where meaningful);
- the whole train iteration is one jitted XLA program (see runner.py);
- checkpoints carry optimizer/epoch state AND are actually resumable
  (``train.resume=true``), fixing the reference's dead resume path;
- per-epoch timing uses host perf counters around the device step, with
  ``block_until_ready`` at epoch boundaries for honest numbers.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, instantiate
from ..data.dataset import ZeroMaskFeats
from ..data.loader import BatchLoader, get_dataset
from ..models.base_model import BaseModel
from ..parallel.mesh import (init_distributed, make_mesh, replicate_tree,
                             shard_batch)
from . import optim as O
from .checkpoint import (CKPT_BEST_DIRNAME, CKPT_LAST_DIRNAME,
                         init_from_model, load_checkpoint, save_checkpoint,
                         to_host_tree, wait_for_pending_saves)
from .metrics import MetricTracker
from .mixup import MixUp
from .runner import Runner
from ..utils.logging import ExperimentLogger, ProfilerHook, human_format

DATASET_TRAIN_CFG_KEY = "dataset_train"
DATASET_EVAL_CFG_KEY = "dataset_eval"

log = logging.getLogger(__name__)


def get_transforms(cfg, train: bool):
    """ZeroMask augmentation on train features; identity on eval
    (reference train.py:32-52; the permute is folded into the loader)."""
    mods = list(cfg.model.modal_dims.keys())
    if train and cfg.data_train.zero_mask_rate > 0:
        return {m: ZeroMaskFeats(cfg.data_train.zero_mask_rate) for m in mods}
    return {m: None for m in mods}


def create_ckpt_path(cfg, interactive=True):
    """Reference train.py:170-186 naming scheme."""
    expt_name = cfg.get("experiment_name")
    fusion_method = cfg.model.fuser._target_.split(".")[-1]
    fp_method = cfg.model.CMFP._target_.split(".")[-1]
    modalities = "_".join(cfg.model.modal_dims.keys())
    experiment_name = f"{fp_method}_{fusion_method}_{modalities}"
    if expt_name is not None:
        experiment_name += f"_{expt_name}"
    ckpt_path = os.path.join(cfg.cwd, "checkpoints", experiment_name)
    os.makedirs(ckpt_path, exist_ok=True)
    best = os.path.join(ckpt_path, CKPT_BEST_DIRNAME)
    if os.path.exists(best) and not cfg.train.get("resume", False):
        # reference train.py:179-185 raises unless explicitly confirmed;
        # non-interactive runs must opt in via +overwrite=true
        confirmed = bool(cfg.get("overwrite", False))
        if not confirmed and interactive and os.isatty(0):
            ans = input("This experiment already exists. Override? (y/N) ")
            confirmed = ans.strip().lower() in ("y", "yes")
        if not confirmed:
            raise ValueError(
                "This experiment is already done. Rename it, set "
                "train.resume=true, or pass +overwrite=true.")
        import shutil
        shutil.rmtree(best, ignore_errors=True)
    return experiment_name, ckpt_path


def build_dataloaders(cfg, dist_info):
    transforms_train = get_transforms(cfg, train=True)
    transforms_val = get_transforms(cfg, train=False)
    datasets_train = [
        get_dataset(cfg[el], cfg.data_train, transforms_train, log)
        for el in cfg.keys() if el.startswith(DATASET_TRAIN_CFG_KEY)
    ]
    if len(datasets_train) > 1:
        from ..data.dataset import ConcatClipDataset
        dataset_train = ConcatClipDataset(datasets_train)
    else:
        dataset_train = datasets_train[0]
    dataset_val = get_dataset(cfg[DATASET_EVAL_CFG_KEY], cfg.data_eval,
                              transforms_val, log)

    n_dev = jax.device_count()
    local_batch = cfg.train.batch_size * jax.local_device_count()
    eval_batch = (cfg.eval.batch_size or cfg.train.batch_size * 4) * \
        jax.local_device_count()
    sample_weights = None
    cb_alpha = float(cfg.train.get("class_balanced_alpha") or 0.0)
    if cb_alpha > 0.0:
        from ..data.stats import balanced_sample_weights, summarize
        target = dataset_train.label_type[0] \
            if hasattr(dataset_train, "label_type") \
            else next(iter(dataset_train.classes))
        sample_weights = balanced_sample_weights(dataset_train, target,
                                                 cb_alpha)
        log.info("class-balanced resampling on %r (alpha=%.2f); "
                 "long-tail stats: %s", target, cb_alpha,
                 summarize(dataset_train).get(target))
    loader_train = BatchLoader(
        dataset_train, batch_size=local_batch, shuffle=True, seed=cfg.seed,
        num_workers=cfg.workers, shard_id=dist_info["rank"],
        num_shards=dist_info["world_size"], sample_weights=sample_weights)
    loader_val = BatchLoader(
        dataset_val, batch_size=eval_batch, shuffle=False, seed=cfg.seed,
        num_workers=cfg.workers, shard_id=dist_info["rank"],
        num_shards=dist_info["world_size"])
    log.info("train %d clips / val %d clips; global batch %d over %d devices",
             len(dataset_train), len(dataset_val), local_batch *
             dist_info["world_size"], n_dev)
    return dataset_train, loader_train, dataset_val, loader_val


def build_schedule(cfg, iters_per_epoch, world_size):
    main_sched = instantiate(cfg.opt.scheduler,
                             iters_per_epoch=iters_per_epoch,
                             world_size=world_size)
    return instantiate(cfg.opt.warmup, main_sched,
                       iters_per_epoch=iters_per_epoch,
                       world_size=world_size)


_PREEMPTED = None  # threading.Event, installed by _install_preemption_handler


def _install_preemption_handler():
    """Graceful preemption (production TPU VMs send SIGTERM with ~30 s
    notice): mark a flag; the train loop checkpoints and exits cleanly at
    the next safe point instead of losing the epoch. Returns the Event
    (None when handlers can't be installed, e.g. non-main thread)."""
    global _PREEMPTED
    import signal
    import threading
    ev = threading.Event()

    def handler(signum, frame):
        ev.set()
        log.warning("SIGTERM: checkpointing and exiting at the next "
                    "safe point")

    try:
        signal.signal(signal.SIGTERM, handler)
    except ValueError:  # not the main thread (embedded use) — no handler
        _PREEMPTED = None  # clear any event from a previous main() run:
        return None        # a stale set flag would abort every epoch at 0
    _PREEMPTED = ev
    return ev


def _preempt_requested_globally(ev) -> bool:
    """Consistent cross-process decision: SIGTERM delivery can skew
    between hosts, and a rank exiting while others enter the next
    epoch's collectives would deadlock — any rank's flag stops all."""
    if ev is None:
        return False
    if jax.process_count() == 1:
        return ev.is_set()
    from ..parallel.mesh import gather_from_all
    flags = gather_from_all(np.asarray([int(ev.is_set())]))
    return bool(np.asarray(flags).sum() > 0)


def run_one_epoch(runner, mesh, params, opt_state, loader, metric_tracker,
                  *, is_training, lr_schedule=None, base_lr=None,
                  step_counter=0, rng=None, log_every=200, profiler=None):
    t_dl = time.perf_counter()
    accum = None
    for idx, batch in enumerate(loader):
        if (_PREEMPTED is not None and _PREEMPTED.is_set()
                and jax.process_count() == 1):
            # single-process: abandon the epoch mid-stream (metrics
            # absorbed below are partial). Multi-process keeps the epoch
            # running — mid-epoch exit would desync the ranks' collective
            # schedules; the globally-synced check at the epoch boundary
            # handles it.
            log.warning("preemption: stopping epoch at iter %d", idx)
            break
        dl_time = time.perf_counter() - t_dl
        device_batch = shard_batch(mesh, {
            k: v for k, v in batch.items()
            if k in ("data_dict", "target", "target_subclips", "valid")})
        if "mixup_lam" in batch:  # trajectory-parity hook (runner._forward)
            device_batch["mixup_lam"] = jnp.asarray(
                batch["mixup_lam"], jnp.float32)

        t_fw = time.perf_counter()
        if is_training:
            lr = lr_schedule(step_counter, base_lr)
            rng, step_key = jax.random.split(rng)
            # readbacks only at the logging cadence: the NaN guard + log
            # line sync the device there, keeping the step pipeline free of
            # per-iteration host round-trips (metrics accumulate inside the
            # jitted step and are absorbed once at epoch end)
            check = idx % log_every == 0
            params, opt_state, losses, metrics, accum = runner.train_step(
                params, opt_state, device_batch, lr, base_lr, step_key,
                check_nan=check, accum=accum)
            step_counter += 1
            if profiler is not None:
                profiler.step(step_counter)
        else:
            losses, metrics, _, accum = runner.eval_step(
                params, device_batch, accum=accum)
        step_time = time.perf_counter() - t_fw

        metric_tracker.update(
            {"T DataLoader": dl_time, "T Step": step_time},
            int(batch["valid"].sum()), is_training)
        if is_training and idx % log_every == 0:
            log.info("iter %d: loss %.4f lr %.2e (T data %.3fs step %.3fs)",
                     idx, float(losses["total_loss"]), lr, dl_time,
                     step_time)
        t_dl = time.perf_counter()
    runner.absorb_accum(metric_tracker, accum, is_training)
    metric_tracker.synchronize_between_processes(is_training)
    return params, opt_state, step_counter, rng


def main(cfg: Config, interactive: bool = True):
    # persistent XLA compile cache (repo-local .jax_cache by default):
    # flagship programs cost minutes to compile on TPU; restarted/resumed
    # runs should not pay twice. Opt out with AFFT_NO_COMPILE_CACHE=1
    # (honored inside enable_compile_cache, uniformly for every entry).
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    dist_info = init_distributed(log)
    is_master = dist_info["rank"] == 0
    preempt_ev = _install_preemption_handler()
    experiment_name, ckpt_path = create_ckpt_path(cfg, interactive)

    np.random.seed(cfg.seed)
    rng = jax.random.key(cfg.seed)

    dataset_train, loader_train, dataset_val, loader_val = \
        build_dataloaders(cfg, dist_info)
    num_classes = {k: len(v) for k, v in dataset_train.classes.items()}

    model = BaseModel(cfg.model, num_classes=num_classes,
                      class_mappings=dataset_train.class_mappings)
    rng, init_key = jax.random.split(rng)
    params = model.init(init_key)
    # training-time mask stream (dropout/drop-path/mixup): the key impl
    # travels with the key, so creating it as rbg routes every bernoulli/
    # uniform in the step through the hardware bit generator instead of
    # threefry (see conf train.rng_impl; ~11 ms/step on the flagship)
    # fold_in decorrelates the mask stream from the param-init key: with
    # rng_impl=threefry2x32 a bare key(cfg.seed) would make step 0's
    # first split reproduce init_key exactly
    rng = jax.random.fold_in(
        jax.random.key(cfg.seed, impl=str(cfg.train.get("rng_impl")
                                          or "threefry2x32")), 1)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log.info("Model: %s with %s params", experiment_name,
             human_format(n_params))

    exp_logger = None
    profiler = ProfilerHook(cfg.get("profile_dir"),
                            int(cfg.get("profile_start_step", 10)),
                            int(cfg.get("profile_stop_step", 20)))
    if is_master:
        exp_logger = ExperimentLogger(
            ckpt_path, cfg.get("project_name", "Anticipation"),
            experiment_name, use_wandb=bool(cfg.get("use_wandb", True)),
            config=cfg.to_container(resolve=True))

    if cfg.get("init_from_model"):
        paths = cfg.init_from_model
        if not isinstance(paths, list):
            paths = [paths]
        paths = [os.path.join(cfg.cwd, "checkpoints", p) for p in paths]
        params, _ = init_from_model(model, params, paths,
                                    cfg.train.modules_to_keep, log)

    master_dtype = jnp.bfloat16 \
        if cfg.train.get("master_dtype") == "bfloat16" else jnp.float32
    if master_dtype != jnp.float32:
        if cfg.model.get("compute_dtype") != "bfloat16":
            raise ValueError("train.master_dtype=bfloat16 requires "
                             "model.compute_dtype=bfloat16")
        # bf16 master weights (train.master_dtype=bfloat16): params and
        # optimizer state live in the compute dtype; updates apply with
        # stochastic rounding (runner/optim). ~2x less optimizer-pass HBM
        # traffic than fp32 masters; checkpoints then store bf16 params.
        params = jax.tree.map(
            lambda x: x.astype(master_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    pipe_stages = int(cfg.train.get("pipeline_stages") or 0)
    if pipe_stages > 1:
        # GPipe for the predictor block stack: mesh gains a "pipe" axis,
        # the stack runs parallel/pipeline.py's one-scan schedule inside
        # the same jitted train step; composes with DP (and ZeRO below)
        # because the schedule maps over the pipe axis only
        from ..parallel.pipeline import (PipelineCtx,
                                         check_uniform_layer_groups,
                                         make_mesh_data_pipe,
                                         stack_predictor_blocks)
        mesh = make_mesh_data_pipe(pipe_stages)
        micro = int(cfg.train.get("pipeline_microbatches") or pipe_stages)
        proto = model.future_predictor.predictor_proto
        assert proto.n_layer % pipe_stages == 0, \
            f"fp_layers={proto.n_layer} must divide over " \
            f"pipeline_stages={pipe_stages}"
        proto.pipeline_ctx = PipelineCtx(mesh, microbatches=micro)
        # natively stacked predictor storage: the schedule consumes the
        # leading-layer-dim layout directly (no per-step re-stack paying
        # an extra HBM read+write of the predictor weights). Group tree
        # and optimizer state are built on the stacked tree below;
        # checkpoints stay canonical — unstacked on save, restacked on
        # resume.
        check_uniform_layer_groups(O.build_group_tree(
            params, cfg.opt.lr_wd, cfg.opt.lr, cfg.opt.wd))
        params = stack_predictor_blocks(params)
        log.info("pipeline parallelism: %d stages x %d-way data, "
                 "%d microbatches (stacked predictor storage)", pipe_stages,
                 mesh.devices.shape[0], micro)
    else:
        mesh = make_mesh()

    groups = O.build_group_tree(params, cfg.opt.lr_wd, cfg.opt.lr, cfg.opt.wd)
    optimizer = instantiate(cfg.opt.optimizer)
    opt_state = optimizer.init(params, groups)

    lr_schedule = build_schedule(cfg, len(loader_train),
                                 dist_info["world_size"])
    mixup_fn = None
    if cfg.train.use_mixup:
        mixup_fn = MixUp(alpha=cfg.train.mixup_alpha,
                         label_smoothing=dict(cfg.train.label_smoothing.items()),
                         num_classes=num_classes)

    compute_dtype = jnp.bfloat16 \
        if cfg.model.get("compute_dtype") == "bfloat16" else jnp.float32
    class_weights = None
    cw_beta = cfg.train.get("class_weight_beta")
    if cw_beta is not None:
        from ..data.stats import class_counts, effective_number_class_weights
        sub_dfs = [d.df for d in dataset_train.datasets] \
            if hasattr(dataset_train, "datasets") else [dataset_train.df]
        class_weights = {
            t: effective_number_class_weights(
                class_counts(dataset_train, t), float(cw_beta))
            for t in num_classes
            if all(f"{t}_class" in df for df in sub_dfs)}
        log.info("effective-number class weighting (beta=%s) on %s",
                 cw_beta, sorted(class_weights))
    runner = Runner(model, optimizer, groups,
                    loss_wts=dict(cfg.train.loss_wts.items()),
                    mixup=mixup_fn, mixup_backbone=cfg.train.mixup_backbone,
                    grad_clip=cfg.opt.grad_clip, compute_dtype=compute_dtype,
                    watch_gradients=bool(cfg.train.get("watch_gradients")),
                    class_weights=class_weights, master_dtype=master_dtype,
                    grad_accum=int(cfg.train.get("grad_accum") or 1))
    metric_tracker = MetricTracker(num_classes)

    if cfg.train.get("zero_sharding"):
        # ZeRO-1: optimizer state sharded over the data axis; GSPMD turns
        # the DP update into reduce-scatter -> local update -> all-gather.
        # Updated params are pinned replicated inside the step (Runner
        # param_shardings) so the shard never propagates onto the weights.
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.sharding import shard_opt_state
        place_opt_state = lambda t: shard_opt_state(mesh, t)
        repl = NamedSharding(mesh, PartitionSpec())
        runner.param_shardings = jax.tree.map(lambda _: repl, params)
        log.info("optimizer state sharded over %d-way data axis (ZeRO-1)",
                 mesh.devices.shape[0])
    else:
        place_opt_state = lambda t: replicate_tree(mesh, t)

    start_epoch, step_counter, best_metric = 0, 0, 0.0
    last_path = os.path.join(ckpt_path, CKPT_LAST_DIRNAME)
    if cfg.train.get("resume", False) and (
            os.path.exists(last_path)
            # crash between the swap renames: previous complete checkpoint
            # survives under .old-tmp; load_checkpoint recovers it
            or os.path.exists(last_path + ".old-tmp")):
        ckpt = load_checkpoint(last_path)
        if pipe_stages > 1:
            # checkpoints are canonical (per-layer block lists); the live
            # pipelined trees use the stacked predictor storage
            from ..parallel.pipeline import stack_predictor_blocks
            ckpt["model"] = stack_predictor_blocks(ckpt["model"])
            ckpt["optimizer"] = stack_predictor_blocks(ckpt["optimizer"])
        # reconcile restored dtypes with the configured master/state dtypes
        # (the live params/opt_state trees are only dtype TEMPLATES here —
        # placement happens once, below, on whichever source wins):
        # resuming an fp32-master checkpoint under
        # train.master_dtype=bfloat16 must not silently disable the
        # bf16-master fast path (Runner keys its cast-skipping and
        # stochastic rounding off the config), and a bf16-master
        # checkpoint resumed at fp32 must upcast
        cast_like = lambda tmpl, loaded: jax.tree.map(
            lambda t, x: x.astype(t.dtype)
            if hasattr(t, "dtype") and getattr(x, "dtype", t.dtype) != t.dtype
            else x, tmpl, loaded)
        params = replicate_tree(mesh, cast_like(params, ckpt["model"]))
        opt_state = place_opt_state(cast_like(opt_state, ckpt["optimizer"]))
        start_epoch = int(ckpt["epoch"])
        step_counter = int(ckpt["step"])
        best_metric = float(ckpt["best_metric"])
        if ckpt.get("schedule") and hasattr(lr_schedule, "load_state_dict"):
            # metric-driven schedules (ReduceLROnPlateau): restore
            # scale/best/patience so resume keeps prior lr reductions
            lr_schedule.load_state_dict(
                {k: v.item() if hasattr(v, "item") else v
                 for k, v in ckpt["schedule"].items()})
        log.info("Resumed from %s at epoch %d", last_path, start_epoch)
    else:
        # fresh run: place the initialized trees (on resume the restored
        # trees are placed above instead — placing both would transfer
        # GiB-scale state twice at startup)
        params = replicate_tree(mesh, params)
        opt_state = place_opt_state(opt_state)

    # optional HBM-resident feature cache: per-batch host traffic becomes a
    # tiny index upload (see afft_tpu/data/device_cache.py). Requires the
    # deterministic clip plan and no host-side augmentations.
    cache_train = cache_val = None
    if cfg.get("data_on_device"):
        from ..data.device_cache import DeviceFeatureCache
        cache_dtype = "int8" \
            if cfg.get("data_on_device_dtype") == "int8" else None
        try:
            cache_train = DeviceFeatureCache(dataset_train, dtype=cache_dtype)
            cache_val = DeviceFeatureCache(dataset_val, dtype=cache_dtype)
            log.info("serving features from HBM (data_on_device)")
        except AssertionError as e:
            log.warning("data_on_device unavailable (%s); host loader", e)
            cache_train = cache_val = None  # never leave one side cached

    def epoch_loaders(epoch):
        if cache_train is not None:
            # same per-host batch sizes as the host loaders (single source:
            # BatchLoader carries what build_dataloaders computed)
            bt = loader_train.batch_size
            bv = loader_val.batch_size
            return (cache_train.iter_batches(
                        bt, shuffle=True, seed=cfg.seed, epoch=epoch,
                        shard_id=dist_info["rank"],
                        num_shards=dist_info["world_size"],
                        # class-balanced resampling applies on this path
                        # too (train.class_balanced_alpha)
                        sample_weights=loader_train.sample_weights),
                    cache_val.iter_batches(
                        bv, shuffle=False, shard_id=dist_info["rank"],
                        num_shards=dist_info["world_size"]))
        loader_train.set_epoch(epoch)
        return loader_train, loader_val

    for epoch in range(start_epoch, cfg.train.num_epochs):
        epoch_train_loader, epoch_val_loader = epoch_loaders(epoch)
        lr = lr_schedule(step_counter, cfg.opt.lr)
        log.info("Epoch %d of %d with lr %g", epoch + 1,
                 cfg.train.num_epochs, lr)
        metric_tracker.reset()

        epoch_start_step = step_counter
        params, opt_state, step_counter, rng = run_one_epoch(
            runner, mesh, params, opt_state, epoch_train_loader,
            metric_tracker, is_training=True, lr_schedule=lr_schedule,
            base_lr=cfg.opt.lr, step_counter=step_counter, rng=rng,
            profiler=profiler)
        params, opt_state, _, _ = run_one_epoch(
            runner, mesh, params, opt_state, epoch_val_loader,
            metric_tracker, is_training=False)
        # single-process preemption may have aborted the epoch mid-stream:
        # its train metrics are partial and its val metric is a biased
        # prefix — never use it to crown a best checkpoint, and resume
        # must REDO the epoch (record epoch, not epoch+1)
        interrupted = preempt_ev is not None and preempt_ev.is_set() \
            and jax.process_count() == 1

        observe = getattr(lr_schedule, "observe", None)
        if observe is not None:
            # metric-driven schedules (ReduceLROnPlateau): epoch-end update
            # with the synced primary val metric — deterministic across
            # processes because MetricTracker already all-reduced it
            plateau_metric = metric_tracker.get_data(cfg.primary_metric,
                                                     is_training=False)
            if plateau_metric is not None:
                observe(float(plateau_metric))

        # checkpoint decisions + device->host materialization run on EVERY
        # process: metric_tracker is already all-reduced (identical
        # decisions), and to_host_tree may launch a collective gather for
        # non-fully-addressable leaves (multi-host / ZeRO state) — rank-0-
        # only execution would deadlock the other ranks' next collective.
        # Only logging and the disk write below are master-only.
        sched_state = getattr(lr_schedule, "state_dict", lambda: None)()
        primary = metric_tracker.get_data(cfg.primary_metric,
                                          is_training=False)
        # async (default): the device→host copy happens here, the
        # minutes-long disk write on a background thread (newest-wins
        # per path), overlapped with subsequent epochs; joined after
        # the loop. train.async_checkpoint=false restores blocking
        # saves. train.save_last_every=N thins the resume checkpoint
        # cadence (the final epoch always saves).
        block = not cfg.train.get("async_checkpoint", True)
        is_best = not interrupted \
            and primary is not None and primary > best_metric
        last_every = int(cfg.train.get("save_last_every") or 1)
        is_last = not interrupted and ((epoch + 1) % last_every == 0
                                       or epoch + 1 == cfg.train.num_epochs)
        every = cfg.train.get("checkpoint_every")
        is_every = not interrupted \
            and bool(every) and (epoch + 1) % int(every) == 0
        host_params = host_opt = None
        if is_best or is_last or is_every:
            # one device->host copy per epoch, shared by every
            # destination (save_checkpoint passes host leaves through).
            # Non-writers only run the collective gather part — the numpy
            # materialization is skipped off-master (materialize=False)
            host_params = to_host_tree(params, materialize=is_master)
            host_opt = to_host_tree(
                {k: v for k, v in opt_state.items() if k != "params_c"}
                if isinstance(opt_state, dict) else opt_state,
                materialize=is_master)
            if is_master and pipe_stages > 1:
                # canonical layer-list layout on disk: a checkpoint written
                # under pipelining resumes under any parallelism config
                from ..parallel.pipeline import unstack_predictor_blocks
                host_params = unstack_predictor_blocks(host_params)
                host_opt = unstack_predictor_blocks(host_opt)
        if is_best:
            best_metric = primary
        if is_master:
            log.info(metric_tracker.to_string(is_training=True))
            log.info(metric_tracker.to_string(is_training=False))
            if is_best:
                save_checkpoint(os.path.join(ckpt_path, CKPT_BEST_DIRNAME),
                                host_params, host_opt, epoch + 1,
                                step_counter, best_metric,
                                schedule_state=sched_state, block=block)
            if is_last:
                save_checkpoint(last_path, host_params, host_opt, epoch + 1,
                                step_counter, best_metric,
                                schedule_state=sched_state, block=block)
            if is_every:
                save_checkpoint(
                    os.path.join(ckpt_path, f"checkpoint_epoch{epoch + 1}"),
                    host_params, host_opt, epoch + 1, step_counter,
                    best_metric, schedule_state=sched_state, block=block)
            if not interrupted:  # partial-epoch metrics would masquerade
                exp_logger.log({  # as a completed epoch's
                    **metric_tracker.get_all_data(is_training=True),
                    **metric_tracker.get_all_data(is_training=False),
                    "lr": lr,
                }, step=epoch + 1)
        if _preempt_requested_globally(preempt_ev):
            # graceful preemption: one final resume checkpoint, then exit
            # clean. A mid-epoch interrupt records (epoch, epoch-start
            # step) so resume REDOES the partial epoch (the alternative —
            # epoch+1 — would silently skip its untrained remainder); an
            # epoch-boundary preempt whose checkpoint_last was just saved
            # (is_last) skips the duplicate GiB-scale write — the ~30 s
            # preemption window is better spent flushing the async queue.
            ck_epoch = epoch if interrupted else epoch + 1
            ck_step = epoch_start_step if interrupted else step_counter
            if interrupted or not is_last:
                if host_params is None:
                    host_params = to_host_tree(params,
                                               materialize=is_master)
                    host_opt = to_host_tree(
                        {k: v for k, v in opt_state.items()
                         if k != "params_c"}
                        if isinstance(opt_state, dict) else opt_state,
                        materialize=is_master)
                    if is_master and pipe_stages > 1:
                        from ..parallel.pipeline import \
                            unstack_predictor_blocks
                        host_params = unstack_predictor_blocks(host_params)
                        host_opt = unstack_predictor_blocks(host_opt)
                if is_master:
                    save_checkpoint(last_path, host_params, host_opt,
                                    ck_epoch, ck_step, best_metric,
                                    schedule_state=sched_state, block=True)
            log.warning("preemption: checkpoint saved at epoch %d; "
                        "exiting (resume with train.resume=true)", ck_epoch)
            break
    profiler.close()
    if is_master:
        wait_for_pending_saves()
    if is_master and exp_logger is not None:
        exp_logger.summary(cfg.primary_metric, best_metric)
    log.info("Best %s: %s", cfg.primary_metric, best_metric)
    return best_metric

"""Checkpoint save/load with working resume.

Save layout mirrors the reference payload {model, optimizer, epoch}
(reference train.py:156-167) via orbax, plus the partial/prefix-filtered
init path of reference train.py:55-103 (init_from_model with
modules_to_keep and shape-mismatch tolerance) — including importing the
reference's torch .pth checkpoints. Unlike the reference, loading restores
optimizer state and epoch, so training actually resumes (the reference
never reloads them; SURVEY §5.3 flags this as a gap to fix).
"""

from __future__ import annotations

import logging
import os
import shutil
import threading
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

CKPT_BEST_DIRNAME = "checkpoint_best"
CKPT_LAST_DIRNAME = "checkpoint_last"

# Native-parameter layout version. v2 = heads-major qkv packing in the
# predictor c_attn (torch_import._conv1d_qkv); checkpoints written before
# that switch carry no version and would silently scramble q/k/v if loaded
# into the current layout — load_checkpoint fails loudly instead.
CKPT_FORMAT_VERSION = 2


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


_OLD_SUFFIX = ".old-tmp"
_NEW_SUFFIX = ".new-tmp"


def _write_and_swap(path: Path, payload: dict, epoch):
    """Write to a sibling tmp dir, then swap in via renames.

    Orbax's own ``force=True`` DELETES the existing directory before the
    new one is complete, so a crash mid-write (slow disks take minutes at
    flagship size) destroys the only resumable checkpoint. Writing to
    ``<path>.new-tmp`` and swapping keeps a complete checkpoint on disk at
    every instant; a crash can at worst leave it under ``<path>.old-tmp``,
    which load_checkpoint recovers."""
    new_tmp = path.with_name(path.name + _NEW_SUFFIX)
    old_tmp = path.with_name(path.name + _OLD_SUFFIX)
    # stale tmps from a previous crash (incl. orbax's internal tmp name)
    for stale in (new_tmp,
                  path.with_name(new_tmp.name + ".orbax-checkpoint-tmp"),
                  path.with_name(path.name + ".orbax-checkpoint-tmp")):
        if stale.exists():
            shutil.rmtree(stale)
    _checkpointer().save(new_tmp, payload, force=True)
    if old_tmp.exists():
        shutil.rmtree(old_tmp)
    if path.exists():
        path.rename(old_tmp)
    new_tmp.rename(path)
    if old_tmp.exists():
        shutil.rmtree(old_tmp)
    logging.info("Stored checkpoint at epoch %s to %s", epoch, path)


class _AsyncSaver:
    """One background writer; newest payload per path wins (coalescing).

    Flagship checkpoints are ~3 GiB and this environment's disk writes
    them at ~27 MiB/s (minutes per save), while a train epoch can be
    seconds of device time — blocking saves would dominate wall clock.
    Coalescing by path bounds queued host memory to one payload per
    distinct checkpoint name."""

    def __init__(self):
        self._cv = threading.Condition()
        self._pending: Dict[Path, tuple] = {}
        self._order: List[Path] = []
        self._thread = None
        self._busy = False
        self._errors: List = []  # every failed (path, exc), not just first

    def submit(self, path: Path, payload: dict, epoch):
        with self._cv:
            # queue BEFORE surfacing any earlier failure: a stale error
            # must never drop the caller's new payload (whether it raced
            # ahead of this submit is a thread-scheduling accident)
            if path not in self._pending:
                self._order.append(path)
            self._pending[path] = (payload, epoch)
            if self._thread is None:
                # liveness is tracked by this attribute, mutated only under
                # the lock (the worker nulls it in its exit decision): a
                # Thread.is_alive() check would race with a worker that has
                # decided to exit but not yet died, stranding this payload
                self._thread = threading.Thread(target=self._run,
                                                name="ckpt-writer",
                                                daemon=True)
                self._thread.start()
            self._cv.notify_all()
            self._raise_pending_error()

    def _run(self):
        while True:
            with self._cv:
                if not self._order:
                    self._busy = False
                    self._thread = None
                    self._cv.notify_all()
                    return
                path = self._order.pop(0)
                payload, epoch = self._pending.pop(path)
                self._busy = True
            try:
                _write_and_swap(path, payload, epoch)
            except BaseException as e:  # surfaced on next submit()/wait()
                with self._cv:
                    self._errors.append((str(path), e))
                # keep draining: queued saves to OTHER paths still get
                # attempted (and wait() can terminate) after one failure

    def wait(self):
        with self._cv:
            self._cv.wait_for(lambda: not self._order and not self._busy)
            self._raise_pending_error()

    def has_pending(self) -> bool:
        with self._cv:
            return bool(self._order) or self._busy

    def _raise_pending_error(self):
        if self._errors:
            errs, self._errors = self._errors, []
            detail = "; ".join(f"{p}: {e!r}" for p, e in errs)
            raise RuntimeError(
                f"async checkpoint save failed ({detail})") from errs[0][1]


_ASYNC_SAVER = _AsyncSaver()


def wait_for_pending_saves():
    """Block until all async checkpoint writes are on disk (call at end of
    training); re-raises any writer failure."""
    _ASYNC_SAVER.wait()


def to_host_tree(tree, materialize: bool = True):
    """Device→host copy of a pytree for checkpointing.

    Leaves already on the host pass through without copying — callers that
    save the same state to several paths (best + last on an improving
    epoch) can materialize once and share the result. bf16 leaves read
    back via an fp32 cast: a direct np.asarray of a bf16 device array
    aborts this TPU backend (see .claude/skills/verify).

    ``materialize=False`` runs ONLY the collective gather below (which
    every process of a multi-host mesh must join) and returns the leaves
    un-copied — non-writer ranks use it so the GiB-scale numpy readback
    happens on rank 0 alone."""
    import jax.numpy as jnp
    import ml_dtypes

    leaves, treedef = jax.tree.flatten(tree)
    # sharded state (ZeRO-1 / multi-host meshes): all-gather to replicated
    # before readback — np.asarray of an array spanning non-addressable
    # devices raises. ONE jitted gather per mesh covers all such leaves (a
    # fresh per-leaf jit wrapper would re-trace and dispatch one program
    # per optimizer-state leaf on every save). NOTE: the gather is a
    # collective — to_host_tree must run on EVERY process of a multi-host
    # mesh (loop.py materializes on all ranks, writes on rank 0 only).
    by_mesh = {}
    for i, x in enumerate(leaves):
        if hasattr(x, "sharding") and not x.is_fully_addressable:
            by_mesh.setdefault(x.sharding.mesh, []).append(i)
    for mesh, idxs in by_mesh.items():
        gathered = _replicating_gather(mesh)(tuple(leaves[i] for i in idxs))
        for i, g in zip(idxs, gathered):
            leaves[i] = g

    if not materialize:
        return jax.tree.unflatten(treedef, leaves)

    def leaf(x):
        if isinstance(x, np.ndarray) or np.isscalar(x):
            return x
        if getattr(x, "dtype", None) == jnp.bfloat16:
            # fp32-cast readback: direct np.asarray of a bf16 device array
            # aborts this TPU backend (see .claude/skills/verify)
            return np.asarray(x.astype(jnp.float32)).astype(
                ml_dtypes.bfloat16)
        return np.asarray(x)

    return jax.tree.unflatten(treedef, [leaf(x) for x in leaves])


_GATHER_JITS = {}


def _replicating_gather(mesh):
    """Cached jitted identity with replicated out_shardings for ``mesh``
    (the jit executable cache is per-wrapper, so the wrapper must be
    reused across checkpoint saves)."""
    fn = _GATHER_JITS.get(mesh)
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec
        fn = jax.jit(lambda xs: xs,
                     out_shardings=NamedSharding(mesh, PartitionSpec()))
        _GATHER_JITS[mesh] = fn
    return fn


def save_checkpoint(path, params, opt_state, epoch: int, step: int,
                    best_metric: float, schedule_state: dict = None,
                    block: bool = True):
    """Rank-0-only save (callers gate on process_index).

    ``schedule_state`` carries metric-driven scheduler state
    (ReduceLROnPlateau scale/best/patience counters) — without it a resume
    would silently revert every prior lr reduction.

    ``block=False`` hands the disk write to a background thread (the
    device→host copy still happens here, so donated/mutated buffers are
    safe); call :func:`wait_for_pending_saves` before exiting."""
    if isinstance(opt_state, dict) and "params_c" in opt_state:
        # derived compute-dtype copy (runner mixed precision) — rebuilt on
        # resume, don't double the checkpoint size
        opt_state = {k: v for k, v in opt_state.items() if k != "params_c"}
    payload = {
        "model": to_host_tree(params),
        "optimizer": to_host_tree(opt_state),
        "epoch": epoch,
        "step": step,
        "best_metric": float(best_metric),
        "format_version": np.int64(CKPT_FORMAT_VERSION),
    }
    if schedule_state:
        payload["schedule"] = {k: np.asarray(v)
                               for k, v in schedule_state.items()}
    path = Path(path).absolute()
    if block and not _ASYNC_SAVER.has_pending():
        _write_and_swap(path, payload, epoch)
    elif block:
        # a background save may be mid-write to this very path (e.g. a
        # preemption save racing the epoch's async save): route through
        # the single writer thread (serialized, newest-wins) and wait
        _ASYNC_SAVER.submit(path, payload, epoch)
        _ASYNC_SAVER.wait()
    else:
        _ASYNC_SAVER.submit(path, payload, epoch)


def load_checkpoint(path) -> Dict:
    path = Path(path).absolute()
    if not path.exists():
        old_tmp = path.with_name(path.name + _OLD_SUFFIX)
        if old_tmp.exists():
            # crash window between the two swap renames: the previous
            # complete checkpoint survives under .old-tmp — recover it
            logging.warning("Recovering checkpoint from %s", old_tmp)
            old_tmp.rename(path)
    ckptr = _checkpointer()
    ckpt = ckptr.restore(path)
    if isinstance(ckpt, dict) and "model" in ckpt:
        version = int(ckpt.get("format_version", 1))
        if version != CKPT_FORMAT_VERSION:
            raise ValueError(
                f"Checkpoint {path} has parameter-layout version {version}, "
                f"this build expects {CKPT_FORMAT_VERSION} (heads-major qkv "
                "packing). Loading it would silently scramble q/k/v. "
                "Re-import from the torch .pth, or repack the predictor "
                "c_attn weights (see train.torch_import._conv1d_qkv).")
    return ckpt


def flatten_with_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_with_paths(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_with_paths(v, f"{prefix}{i}."))
    elif tree is not None:
        out[prefix[:-1]] = tree
    return out


def merge_matching(params, loaded, modules_to_keep: Optional[List[str]] = None,
                   logger=None):
    """Merge loaded leaves into params where paths exist and shapes match
    (reference init_model semantics, train.py:55-103)."""
    logger = logger or logging.getLogger(__name__)
    flat_params = flatten_with_paths(params)
    flat_loaded = flatten_with_paths(loaded)

    if modules_to_keep:
        if not isinstance(modules_to_keep, (list, tuple)):
            modules_to_keep = [modules_to_keep]
        flat_loaded = {k: v for k, v in flat_loaded.items()
                       if any(k.startswith(m) for m in modules_to_keep)}

    used, skipped = [], []
    for k, v in flat_loaded.items():
        if k in flat_params and tuple(np.shape(v)) == \
                tuple(np.shape(flat_params[k])):
            flat_params[k] = np.asarray(v)
            used.append(k)
        else:
            skipped.append(k)
    missing = [k for k in flat_params if k not in flat_loaded]
    if skipped:
        logger.warning("Skipped %d ckpt keys (missing/shape mismatch): %s...",
                       len(skipped), skipped[:5])
    if missing:
        logger.warning("Model keys not in ckpt: %d (e.g. %s)",
                       len(missing), missing[:5])

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}.") for i, v in enumerate(tree)]
        if tree is None:
            return None
        return flat_params[prefix[:-1]]

    return rebuild(params), used


def init_from_model(model, params, ckpt_paths, modules_to_keep=None,
                    logger=None):
    """Initialize params from one or more checkpoints (torch .pth from the
    reference, or afft orbax dirs), merged in order (reference train.py:64-75).
    """
    logger = logger or logging.getLogger(__name__)
    if not isinstance(ckpt_paths, (list, tuple)):
        ckpt_paths = [ckpt_paths]
    used_all = []
    for path in ckpt_paths:
        path = str(path)
        if path.endswith(".pth") or path.endswith(".pt"):
            from .torch_import import load_torch_checkpoint, import_base_model
            sd = load_torch_checkpoint(path)
            if modules_to_keep:
                mods = modules_to_keep if isinstance(modules_to_keep,
                                                     (list, tuple)) \
                    else [modules_to_keep]
                sd = {k: v for k, v in sd.items()
                      if any(k.startswith(m) for m in mods)}
            loaded = import_base_model(model, sd)
            params, used = merge_matching(params, loaded, None, logger)
        else:
            ckpt = load_checkpoint(path)
            loaded = ckpt["model"] if "model" in ckpt else ckpt
            params, used = merge_matching(params, loaded, modules_to_keep,
                                          logger)
        used_all += used
        logger.info("Initialized %d tensors from %s", len(used), path)
    return params, used_all

"""Test/eval entry: logits export and marginalized evaluation.

Behavioural reference: test.py in the upstream repo (save_logits :33-61,
store_append_h5 :20-30, evaluate :64-98, main :101-141). Single jitted
forward per batch on the device mesh; h5 layout matches the reference so
its logits files and ours late-fuse interchangeably.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import BatchLoader, get_dataset
from ..models.base_model import BaseModel
from ..parallel.mesh import init_distributed, make_mesh, replicate_tree, \
    shard_batch
from ..train.checkpoint import init_from_model
from ..train.loop import DATASET_EVAL_CFG_KEY, get_transforms
from .challenge import LOGITS_DIR, marginalize_verb_noun, \
    print_accuracies_epic

log = logging.getLogger(__name__)


def store_append_h5(endpoints, output_dir, save_file_name):
    import h5py
    output_fpath = os.path.join(output_dir, save_file_name)
    os.makedirs(output_dir, exist_ok=True)
    with h5py.File(output_fpath, "a") as fout:
        for key, val in endpoints.items():
            if key not in fout:
                fout.create_dataset(
                    key, data=val, compression="gzip", compression_opts=9,
                    chunks=True, maxshape=(None,) + val.shape[1:])
            else:
                fout[key].resize(
                    (fout[key].shape[0] + val.shape[0],) + val.shape[1:])
                fout[key][-val.shape[0]:, ...] = val


def _forward_all(model, params, loader, mesh, num_heads_key="logits/action"):
    """Run the eval forward over a loader; yields
    (valid logits, uids, dataset row idx, head key)."""
    cmfp = model.future_predictor
    heads = cmfp.classifier_keys.get("action", ["all-fused"])
    modk = "all-fused" if "all-fused" in heads else heads[0]

    @jax.jit
    def fwd(p, data):
        outputs, _ = model.apply(p, data, train=False)
        # fp32 cast ON DEVICE: np.asarray of a bf16 device array aborts the
        # TPU backend on this platform; fp32 readback is also what the h5
        # export and marginalization math need
        return outputs[num_heads_key][modk][:, 0, :].astype(jnp.float32)

    for batch in loader:
        # host batches need staging; device-cache batches are already jax
        # arrays but must still be RE-sharded so a multi-device mesh splits
        # the batch instead of replicating the forward on every device
        # (device_put is a no-op when the sharding already matches)
        data = shard_batch(mesh, batch["data_dict"])
        logits = fwd(params, data)
        valid = batch["valid"]
        yield (np.asarray(logits)[valid], batch["uid"][valid],
               np.asarray(batch["idx"])[valid], modk)


def _merge_shards(logits, idx):
    """Restore dataset row order and drop the DistributedSampler-style
    wrap-around duplicates after a cross-process gather."""
    order = np.argsort(idx, kind="stable")
    logits, idx = logits[order], idx[order]
    keep = np.ones(len(idx), bool)
    keep[1:] = np.diff(idx) > 0
    return logits[keep], idx[keep]


def collect_logits(model, params, loader, mesh):
    """Forward the (possibly per-process-sharded) loader, allgather the
    shards, and return logits in dataset order. Replaces the reference's
    every-process-evaluates-everything DataParallel eval (test.py:130)."""
    chunks, idxs, modk = [], [], None
    for logits, _, idx, modk in _forward_all(model, params, loader, mesh):
        chunks.append(logits)
        idxs.append(idx)
    # shard_indices tiles small datasets so every rank's shard is
    # non-empty whenever the dataset is; an empty loader here means an
    # empty dataset — fail with a diagnosis, not a bare concatenate error
    assert chunks, "eval loader yielded no batches (empty dataset?)"
    logits = np.concatenate(chunks, axis=0)
    idx = np.concatenate(idxs, axis=0)
    if jax.process_count() > 1:
        from ..parallel.mesh import gather_from_all
        logits = gather_from_all(logits)
        idx = gather_from_all(idx)
    logits, idx = _merge_shards(logits, idx)
    return logits, idx, modk


def save_logits(model, params, loader, mesh, save_dir, save_file_name):
    """Append action logits batch-by-batch to gzip h5 (reference :33-61)."""
    modk = None
    for logits, _, _, modk in _forward_all(model, params, loader, mesh):
        store_append_h5({f"logits/action_{modk}": logits}, save_dir,
                        save_file_name)
    log.info("Saved logits logits/action_%s as %s to %s", modk,
             save_file_name, save_dir)


def evaluate(model, params, dataset, loader, mesh):
    """Marginalized verb/noun/action accuracies incl. unseen/tail
    (reference :64-98)."""
    logits_array, _, _ = collect_logits(model, params, loader, mesh)
    assert len(logits_array) == len(dataset), \
        f"{len(logits_array)} logits vs {len(dataset)} clips"
    accs, _ = marginalize_verb_noun(logits_array, dataset, to_prob=True,
                                    compute_manyshot_unseen_tail=True)
    if jax.process_index() == 0:  # master-only console output
        print_accuracies_epic(accs)
    return accs


def main(cfg: Config):
    # persistent XLA compile cache (see train/loop.py main);
    # AFFT_NO_COMPILE_CACHE honored inside
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    dist_info = init_distributed(log)
    transform_val = get_transforms(cfg, train=False)
    dataset_test = get_dataset(cfg[DATASET_EVAL_CFG_KEY], cfg.data_eval,
                               transform_val, log)
    # config validation: an EK100 val eval without the RULSTM annotation
    # dir silently degrades the unseen/tail breakdowns to NaN
    # (challenge.epic100_unseen_tail_eval); name the kwarg up front
    from ..data.epic import EPIC100_VERSION
    df = getattr(dataset_test, "df", None)
    if (getattr(dataset_test, "version", None) == EPIC100_VERSION
            and getattr(dataset_test, "rulstm_annotation_dir", None) is None
            and df is not None and "action_class" in df.columns):
        log.warning(
            "EK100 val eval without rulstm_annotation_dir (config key "
            "dataset.epic_kitchens100.common.rulstm_annot_dir): "
            "unseen/tail MT5R breakdowns will be NaN")
    eval_batch = (cfg.eval.batch_size or cfg.train.batch_size * 4) * \
        jax.local_device_count()
    # multi-process eval shards the val set per process (strided, wrap-padded
    # like DistributedSampler); collect_logits allgathers the shards back
    # into dataset order. Only the master prints/saves.
    shard_id, num_shards = dist_info["rank"], dist_info["world_size"]
    if num_shards > 1:
        log.info("multi-process eval: shard %d/%d", shard_id, num_shards)
    if cfg.get("data_on_device") and \
            getattr(dataset_test, "supports_batch_load", lambda: False)():
        from ..data.device_cache import DeviceFeatureCache
        cache = DeviceFeatureCache(
            dataset_test,
            dtype="int8" if cfg.get("data_on_device_dtype") == "int8"
            else None)
        loader = cache.iter_batches(eval_batch, shuffle=False,
                                    shard_id=shard_id, num_shards=num_shards)
    else:
        loader = BatchLoader(dataset_test, batch_size=eval_batch,
                             shuffle=False, num_workers=cfg.workers,
                             shard_id=shard_id, num_shards=num_shards)

    num_classes = {k: len(v) for k, v in dataset_test.classes.items()}
    model = BaseModel(cfg.model, num_classes=num_classes,
                      class_mappings=dataset_test.class_mappings)
    params = model.init(jax.random.key(cfg.seed))

    assert cfg.get("init_from_model") is not None, \
        "Checkpoint is required for test."
    ckpt_paths = cfg.init_from_model
    if not isinstance(ckpt_paths, list):
        ckpt_paths = [ckpt_paths]
    ckpt_paths = [os.path.join(cfg.cwd, "checkpoints", p)
                  for p in ckpt_paths]
    params, _ = init_from_model(model, params, ckpt_paths, None, log)

    mesh = make_mesh(jax.local_devices())
    params = replicate_tree(mesh, params)

    if cfg.get("save_name"):
        # first checkpoint's model dir names the logits dir (matches the
        # reference's create_ckpt_path-derived layout; a LIST of init
        # checkpoints would otherwise stringify into a garbage dir name)
        first_ckpt = cfg.init_from_model
        if isinstance(first_ckpt, list):
            first_ckpt = first_ckpt[0]
        save_dir = os.path.join(cfg.cwd, LOGITS_DIR,
                                str(first_ckpt).split("/")[0])
        if num_shards == 1:
            # reference-style streaming append (test.py:33-61)
            save_logits(model, params, loader, mesh, save_dir, cfg.save_name)
            return None
        logits, _, modk = collect_logits(model, params, loader, mesh)
        if dist_info["rank"] == 0:  # single writer
            store_append_h5({f"logits/action_{modk}": logits}, save_dir,
                            cfg.save_name)
            log.info("Saved logits logits/action_%s as %s to %s", modk,
                     cfg.save_name, save_dir)
        return None
    accs = evaluate(model, params, dataset_test, loader, mesh)
    return accs if dist_info["rank"] == 0 else None

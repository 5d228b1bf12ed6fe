"""Attention visualization entry point.

The reference launcher advertises a ``visualize_attention`` mode
(reference run.py:10) but ships no implementation; this provides one. Loads
a checkpoint, runs eval batches with fuser attention weights and GPT-2
attention maps enabled, and writes per-clip npz dumps plus (when matplotlib
is available) mean modality-attention heatmaps.

Usage: python run.py -c expts/<val expt>.txt -m visualize_attention
Extra keys: +attn_out_dir=..., +attn_max_batches=N
"""

import logging
import os
import sys

import numpy as np

from afft_tpu.config import compose
from afft_tpu.data.loader import BatchLoader, get_dataset
from afft_tpu.models.base_model import BaseModel
from afft_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from afft_tpu.train.checkpoint import init_from_model
from afft_tpu.train.loop import DATASET_EVAL_CFG_KEY, get_transforms

CONFIG_DIR = "afft_tpu/conf"
log = logging.getLogger(__name__)


def main():
    logging.basicConfig(level=logging.INFO)
    cfg = compose(CONFIG_DIR, sys.argv[1:])

    import jax
    transform_val = get_transforms(cfg, train=False)
    dataset = get_dataset(cfg[DATASET_EVAL_CFG_KEY], cfg.data_eval,
                          transform_val, log)
    loader = BatchLoader(dataset, batch_size=cfg.eval.batch_size or 8,
                         shuffle=False, num_workers=cfg.workers)

    num_classes = {k: len(v) for k, v in dataset.classes.items()}
    cfg.model.common.set("fp_output_attentions", True)
    model = BaseModel(cfg.model, num_classes=num_classes,
                      class_mappings=dataset.class_mappings,
                      fuser_need_weights=True)
    params = model.init(jax.random.key(cfg.seed))
    assert cfg.get("init_from_model"), "Checkpoint required."
    paths = cfg.init_from_model
    paths = paths if isinstance(paths, list) else [paths]
    paths = [os.path.join(cfg.cwd, "checkpoints", p) for p in paths]
    params, _ = init_from_model(model, params, paths, None, log)

    mesh = make_mesh()
    params = replicate_tree(mesh, params)

    @jax.jit
    def fwd(p, data):
        outputs, _ = model.apply(p, data, train=False)
        return outputs["attentions"]

    out_dir = cfg.get("attn_out_dir", "attention_maps")
    os.makedirs(out_dir, exist_ok=True)
    max_batches = int(cfg.get("attn_max_batches", 4))

    modality_sums, n_clips = None, 0
    feats_order = [m for m in cfg.model.modal_feature_order
                   if m in cfg.model.modal_dims]
    for bi, batch in enumerate(loader):
        if bi >= max_batches:
            break
        attns = fwd(params, shard_batch(mesh, batch["data_dict"]))
        payload = {}
        for headk, d in attns.items():
            for name, val in d.items():
                if isinstance(val, dict):
                    for k2, v2 in val.items():
                        if v2 is not None:
                            payload[f"{headk}/{name}/{k2}"] = np.asarray(v2)
                elif val is not None:
                    payload[f"{headk}/{name}"] = np.asarray(val)
        # unicode (not object) dtype: dumps stay loadable with
        # allow_pickle=False
        np.savez_compressed(os.path.join(out_dir, f"batch_{bi:04d}.npz"),
                            uids=np.asarray(batch["uid"], dtype=str),
                            **payload)
        ma = payload.get("all-fused/modality_attns")
        if ma is not None and ma.ndim == 6:  # (B, depth, T, H, n+1, n+1)
            token_row = ma[:, -1].mean(axis=(1, 2))[:, 0, 1:]  # (B, n)
            valid = batch["valid"]
            s = token_row[valid].sum(axis=0)
            modality_sums = s if modality_sums is None else modality_sums + s
            n_clips += int(valid.sum())
    log.info("Wrote %d attention dumps to %s", min(max_batches, bi + 1),
             out_dir)

    if modality_sums is not None and n_clips:
        weights = modality_sums / n_clips
        log.info("mean modality-token attention: %s",
                 dict(zip(feats_order, np.round(weights, 4))))
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(4, 3))
            ax.bar(feats_order, weights)
            ax.set_ylabel("mean attention from modality token")
            ax.set_title("SA-Fuser modality attention (last block)")
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, "modality_attention.png"),
                        dpi=150)
            log.info("Saved %s/modality_attention.png", out_dir)
        except ImportError:
            pass


if __name__ == "__main__":
    main()

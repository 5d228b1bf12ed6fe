"""Benchmark: EK100 val throughput, clips/sec on one chip.

Runs the flagship SA-Fuser EK100 eval forward (4 modalities, T=16, 3806
actions, ~390M params) on the default jax backend in bfloat16, with batches
staged from the host each step (loader-equivalent traffic). The baseline is
the PyTorch reference model executing the same forward on CPU fp32
(torch is CPU-only in this image, matching BASELINE.md's "PyTorch CPU
baseline"); its number is cached in .bench_torch_cpu.json after first
measurement.

Prints ONE JSON line:
  {"metric": "EK100 val clips/sec/chip", "value": N, "unit": "clips/s",
   "vs_baseline": ratio}
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 64
T = 16
MODAL_DIMS = {"rgb": 1024, "objects": 352, "audio": 1024, "flow": 1024}
N_CLASSES = 3806
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_torch_cpu.json")


def bench_afft(n_warmup=3, n_iters=20):
    import jax
    import jax.numpy as jnp
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024",
        "model.fuser.depth=6",
        "model.common.fp_layers=6",
    ])
    model = BaseModel(cfg.model, num_classes={"action": N_CLASSES})
    params = model.init(jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(p, feats):
        outputs, _ = model.apply(p, feats, train=False)
        return outputs["logits/action"]["all-fused"][:, 0, :]

    import ml_dtypes
    rng = np.random.default_rng(0)
    # bf16 host batches: what the loader yields when serving from a
    # bf16 packed store (tools/pack_features.py --dtype bfloat16). The
    # host->device link is the serving bottleneck on this setup, so staged
    # bytes are halved at the source rather than converted on device.
    host_batches = [
        {m: rng.standard_normal((BATCH, T, d)).astype(ml_dtypes.bfloat16)
         for m, d in MODAL_DIMS.items()}
        for _ in range(4)
    ]

    def step(i):
        # host->device staging is part of the measured path (loader traffic)
        feats = {m: jnp.asarray(v)
                 for m, v in host_batches[i % len(host_batches)].items()}
        return fwd(params, feats)

    for i in range(n_warmup):
        step(i).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for i in range(n_iters):
        out = step(i)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return BATCH * n_iters / dt


def bench_torch_baseline(n_warmup=1, n_iters=3):
    """Reference PyTorch model, CPU fp32, same shapes."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from export_fixtures import install_stubs, REFERENCE
    install_stubs()
    sys.path.insert(0, REFERENCE)
    import torch
    torch.set_grad_enabled(False)
    from omegaconf import DictConfig
    import models.future_prediction as fp

    model_cfg = DictConfig({
        "modal_dims": DictConfig(MODAL_DIMS),
        "modal_feature_order": ["rgb", "objects", "audio", "poses", "flow"],
        "dropout": 0.2,
        "common": DictConfig({
            "in_features": 1024, "fp_inter_dim": 2048, "fp_output_len": 1,
            "share_classifiers": True, "share_predictors": True,
            "modality_cls": False, "fusion_cls": True,
        }),
        "mapping": {"_target_": "models.feature_mapping.Linear",
                    "use_layernorm": False, "sparse_mapping": True},
        "fuser": {"_target_": "models.fusion.ModalTokenCMFuser",
                  "dim": 1024, "depth": 6, "num_heads": 4,
                  "modalities": MODAL_DIMS},
        "future_predictor": {
            "_target_": "models.future_prediction.BaseFuturePredictor",
            "in_features": 1024, "inter_dim": 2048, "n_layer": 6,
            "n_head": 4, "embd_pdrop": 0.1, "resid_pdrop": 0.1,
            "attn_pdrop": 0.1, "output_attentions": False},
    })
    model = fp.CMFPEarly(model_cfg, {"action": N_CLASSES}).eval()
    g = torch.Generator().manual_seed(0)
    feats = {m: torch.randn(BATCH, T, d, generator=g)
             for m, d in MODAL_DIMS.items()}
    for _ in range(n_warmup):
        model(dict(feats))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        model(dict(feats))
    dt = time.perf_counter() - t0
    return BATCH * n_iters / dt


def get_torch_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["clips_per_sec"]
    clips_per_sec = bench_torch_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"clips_per_sec": clips_per_sec, "batch": BATCH, "T": T,
                   "device": "cpu", "dtype": "float32"}, f)
    return clips_per_sec


def main():
    value = bench_afft()
    baseline = get_torch_baseline()
    print(json.dumps({
        "metric": "EK100 val clips/sec/chip",
        "value": round(value, 2),
        "unit": "clips/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()

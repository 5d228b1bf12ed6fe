"""Flagship-scale on-TPU training validation.

Runs a few hundred REAL train steps (flagship 390M-param 4-modal SA-Fuser,
bf16 compute over fp32 master params, mixup + future CE + past CE + past-
feature MSE + in-step metric accumulation — the full Runner program,
reference train.py:228-290 equivalent) on synthetic EK100-shaped batches,
with honest forced-readback timing, and writes a JSON artifact proving
loss decreases at flagship scale on hardware.

Usage: python tools/tpu_train_check.py [--steps 200] [--batch 64]
Writes TRAIN_TPU_r<N>.json next to the repo root (overridable with --out).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODAL_DIMS = {"rgb": 1024, "objects": 352, "audio": 1024, "flow": 1024}
N_CLASSES = 3806
T = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--distinct-batches", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TRAIN_TPU_r02.json"))
    ap.add_argument("--grad-accum", type=int, default=1,
                    help=">1: lax.scan microbatch accumulation "
                         "(train.grad_accum) — measures the overhead of "
                         "the M x lower-activation-memory step")
    ap.add_argument("--master-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 = bf16 master weights + bf16 optimizer "
                         "state with stochastic-rounded updates "
                         "(train.master_dtype equivalent)")
    args = ap.parse_args()

    import jax
    from afft_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()  # flagship compiles cost 120-380 s on the
    #                         tunneled TPU; pay once per image
    import jax.numpy as jnp
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel
    from afft_tpu.train import optim as O
    from afft_tpu.train.mixup import MixUp
    from afft_tpu.train.runner import Runner

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024",
        "model.fuser.depth=6",
        "model.common.fp_layers=6",
        "opt.optimizer.nesterov=true",
    ])
    num_classes = {"action": N_CLASSES}
    model = BaseModel(cfg.model, num_classes=num_classes)
    params = model.init(jax.random.key(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    low = args.master_dtype == "bfloat16"
    if low:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    groups = O.build_group_tree(params, None, cfg.opt.lr, cfg.opt.wd)
    optimizer = O.sgd(momentum=0.9, nesterov=True,
                      state_dtype="bfloat16" if low else None)
    opt_state = optimizer.init(params, groups)
    mixup = MixUp(alpha=0.1, label_smoothing={"action": 0.4},
                  num_classes=num_classes)
    runner = Runner(model, optimizer, groups,
                    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                              "past_reg": 1.0},
                    mixup=mixup, mixup_backbone=True,
                    compute_dtype="bfloat16",
                    master_dtype=args.master_dtype,
                    grad_accum=args.grad_accum)

    # a small pool of fixed synthetic batches: the model must be able to fit
    # them for the loss to fall — that is the training-correctness signal
    rng = np.random.default_rng(0)
    B = args.batch
    batches = []
    for i in range(args.distinct_batches):
        batches.append({
            "data_dict": {
                m: jnp.asarray(rng.standard_normal((B, T, d))
                               .astype(np.float32))
                for m, d in MODAL_DIMS.items()},
            "target": {"action": jnp.asarray(
                rng.integers(0, N_CLASSES, (B,)))},
            "target_subclips": {"action": jnp.asarray(
                rng.integers(0, N_CLASSES, (B, T, 1)))},
            "valid": jnp.ones((B,), bool),
        })

    def read_loss(losses):
        return float(np.asarray(losses["total_loss"].astype(jnp.float32)))

    # compile + first step (loss BEFORE any update applies to batch 0)
    # production mask stream: rbg keys (train.rng_impl default) — threefry
    # mask generation costs ~11 ms/step at this scale (regenerated in bwd)
    step_key = lambda i: jax.random.key(i, impl="rbg")
    p, s = params, opt_state
    t0 = time.perf_counter()
    p, s, losses, _, _ = runner.train_step(
        p, s, batches[0], lr=1e-3, base_lr=1e-3, rng_key=step_key(1))
    loss_first = read_loss(losses)  # forced readback = compile barrier
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    losses_trace = []
    for i in range(1, args.steps):
        p, s, losses, _, _ = runner.train_step(
            p, s, batches[i % len(batches)], lr=1e-3, base_lr=1e-3,
            rng_key=step_key(i + 1))
        if (i + 1) % 50 == 0:
            losses_trace.append(round(read_loss(losses), 4))
    loss_last = read_loss(losses)  # readback drains the queue
    dt = time.perf_counter() - t0
    ms_per_step = dt / (args.steps - 1) * 1000

    result = {
        "what": "flagship on-TPU training validation (synthetic EK100-shaped"
                " batches, full mixed-precision train step)",
        "model_params": n_params,
        "batch": B,
        "steps": args.steps,
        "ms_per_step": round(ms_per_step, 2),
        "clips_per_sec": round(B / ms_per_step * 1000, 1),
        "compile_s": round(compile_s, 1),
        "loss_first": round(loss_first, 4),
        "loss_last": round(loss_last, 4),
        "loss_every_50": losses_trace,
        "loss_decreased": loss_last < loss_first,
        "master_dtype": args.master_dtype,
        "grad_accum": args.grad_accum,
        "device": str(jax.devices()[0]),
    }
    assert result["loss_decreased"], \
        f"loss did not decrease: {loss_first} -> {loss_last}"
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

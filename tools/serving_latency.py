"""Serving latency across batch sizes on the real chip.

Measures per-batch DEVICE latency of the flagship eval forward (the same
gather-fused HBM-cache pipeline bench.py serves) at several batch sizes.
On this setup the host<->device tunnel adds a ~60 ms (spiking) round-trip
to any readback, so per-call sync would swamp small-batch numbers; instead
each point times a window of K sequential dispatches ended by one forced
readback (device execution is in-order), giving the sustained per-batch
device latency a pipelined serving deployment would see.

Usage: python tools/serving_latency.py [--batches 1 8 32 256]
                                       [--output-len N]
``--output-len N`` (>1) serves the AVT-style multi-step rollout
(fp_output_len=N): the predictor prefILLS T tokens then KV-cache-decodes
N-1 future steps (reference models/future_prediction.py:396-412; ours
predictor._apply_kv_cache).
Prints one JSON line: {"latency_ms": {"1": ..., "8": ...}, ...}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afft_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()  # repo-local persistent XLA cache (.jax_cache)

MODAL_DIMS = {"rgb": 1024, "objects": 352, "audio": 1024, "flow": 1024}
N_CLASSES = 3806
T = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 8, 32, 256])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--output-len", type=int, default=1,
                    help="fp_output_len: >1 engages the KV-cache rollout")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from afft_tpu.config import compose
    from afft_tpu.data.device_cache import DeviceFeatureCache
    from afft_tpu.models import BaseModel
    from afft_tpu.utils.sync import force_device_sync

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024",
        "model.fuser.depth=6",
        "model.common.fp_layers=6",
        f"model.common.fp_output_len={args.output_len}",
    ])
    model = BaseModel(cfg.model, num_classes={"action": N_CLASSES})
    params = model.init(jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # features resident in HBM (the serving cache), batch = device gather
    rng = np.random.default_rng(0)
    n_rows = 4096
    table = {m: jnp.asarray(rng.standard_normal((n_rows, T, d))
                            .astype(np.float32)).astype(jnp.bfloat16)
             for m, d in MODAL_DIMS.items()}

    @jax.jit
    def fwd(p, table, idx):
        feats = {m: DeviceFeatureCache.take(f, idx)
                 for m, f in table.items()}
        outputs, _ = model.apply(p, feats, train=False)
        return outputs["logits/action"]["all-fused"][:, 0, :]

    result = {}
    for B in args.batches:
        idxs = [jnp.asarray(rng.integers(0, n_rows, (B,)), jnp.int32)
                for _ in range(8)]
        out = fwd(params, table, idxs[0])
        force_device_sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fwd(params, table, idxs[i % len(idxs)])
            force_device_sync(out)
            best = min(best,
                       (time.perf_counter() - t0) / args.iters * 1000)
        result[str(B)] = round(best, 3)
        print(f"B={B}: {best:.3f} ms/batch "
              f"({B / best * 1000:.0f} clips/s)", file=sys.stderr)

    print(json.dumps({
        "what": "flagship eval forward device latency (HBM-cache serving "
                "pipeline, amortized-window timing)",
        "output_len": args.output_len,
        "latency_ms": result,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

"""Load and run a serving bundle produced by tools/export_serving.py.

Needs only jax + orbax — no framework model code, no config system: the
bundle IS the computation. Feed batches as an .npz of per-modality
(B, T, F) arrays, or measure sustained throughput on random data.

Usage:
  python tools/serve_bundle.py --bundle serving_bundle [--input batch.npz]
  python tools/serve_bundle.py --bundle serving_bundle --iters 50   # bench
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from export_serving import (BUNDLE_GRAPH, BUNDLE_META,  # noqa
                            BUNDLE_PARAMS, bucket_graph_name)


def load_bundle(bundle_dir):
    import jax
    from jax import export as jexport
    import orbax.checkpoint as ocp

    with open(os.path.join(bundle_dir, BUNDLE_META)) as f:
        meta = json.load(f)
    with open(os.path.join(bundle_dir, BUNDLE_GRAPH), "rb") as f:
        exp = jexport.deserialize(f.read())
    params = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(bundle_dir, BUNDLE_PARAMS)))
    # commit params to the device ONCE: orbax restores numpy arrays, and
    # numpy args to a jitted call are re-staged host->device on EVERY
    # invocation (~26 s/call for the 780 MB flagship over the tunneled
    # link; measured). device_put makes repeat calls reuse HBM buffers.
    params = jax.tree.map(jax.device_put, params)
    # jit the replayed computation so repeat calls hit the executable
    # cache rather than re-invoking the export call machinery
    fn = jax.jit(exp.call)
    return fn, params, meta


def load_bundle_buckets(bundle_dir):
    """Load every batch-size bucket the bundle ships: ({B: fn}, params,
    meta). Single-graph bundles (exported before bucket support) come
    back as one bucket at meta['batch']."""
    import jax
    from jax import export as jexport

    fn, params, meta = load_bundle(bundle_dir)
    buckets = meta.get("batch_buckets") or [meta["batch"]]
    fns = {}
    for b in buckets:
        path = os.path.join(bundle_dir, bucket_graph_name(b))
        if int(b) == int(meta["batch"]):
            # serving.jaxexport IS the largest bucket (export writes the
            # same serialization twice) — reuse the already-deserialized
            # graph instead of loading the byte-identical bucket file
            fns[int(b)] = fn
        elif os.path.exists(path):
            with open(path, "rb") as f:
                fns[int(b)] = jax.jit(jexport.deserialize(f.read()).call)
        else:
            raise FileNotFoundError(
                f"bundle meta lists bucket {b} but {path} is missing")
    return fns, params, meta


def _random_batch(meta, seed=0):
    """fn args for a random batch: (feats,) or (feats, scales) for
    int8-transport bundles."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    B, T = meta["batch"], meta["num_frames"]
    if meta.get("input_dtype") == "int8":
        feats = {m: jnp.asarray(rng.integers(
            -127, 128, (B, T, d)).astype(np.int8))
            for m, d in meta["modal_dims"].items()}
        scales = {m: jnp.ones((B, T), jnp.float32)
                  for m in meta["modal_dims"]}
        return feats, scales
    dt = jnp.bfloat16 if meta["feat_dtype"] == "bfloat16" else jnp.float32
    return ({m: jnp.asarray(rng.standard_normal(
        (B, T, d)).astype(np.float32)).astype(dt)
        for m, d in meta["modal_dims"].items()},)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--input", default=None, help=".npz of (B, T, F) arrays")
    ap.add_argument("--iters", type=int, default=0,
                    help=">0: time sustained throughput on random data")
    args = ap.parse_args()

    import jax.numpy as jnp
    from afft_tpu.utils.sync import force_device_sync

    fn, params, meta = load_bundle(args.bundle)
    if args.input:
        assert meta.get("input_dtype") != "int8", \
            "--input expects a native-dtype bundle (quantized transport " \
            "is driven by tools/serve_concurrent.py)"
        loaded = np.load(args.input)
        dt = jnp.bfloat16 if meta["feat_dtype"] == "bfloat16" \
            else jnp.float32
        fn_args = ({m: jnp.asarray(loaded[m]).astype(dt)
                    for m in meta["modal_dims"]},)
    else:
        fn_args = _random_batch(meta)

    out = fn(params, *fn_args)
    logits = out[0] if isinstance(out, (tuple, list)) else out  # topk: values
    force_device_sync(logits)
    print(json.dumps({
        "bundle": args.bundle,
        "logits_shape": list(logits.shape),
        "logits_mean": float(jnp.mean(logits.astype(jnp.float32))),
    }))

    if args.iters > 0:
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(params, *fn_args)
        force_device_sync(out[0] if isinstance(out, (tuple, list)) else out)
        dt_s = time.perf_counter() - t0
        clips = meta["batch"] * args.iters / dt_s
        print(json.dumps({"clips_per_sec": round(clips, 1),
                          "ms_per_batch": round(dt_s / args.iters * 1e3, 2)}))


if __name__ == "__main__":
    main()

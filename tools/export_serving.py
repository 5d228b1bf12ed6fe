"""Export a self-contained serving bundle: StableHLO graph + params.

``jax.export`` serializes the EXACT traced computation (including the
Pallas serving kernels on TPU) into a versioned, backward-compatible
artifact. A deployment host replays it with jax alone — no framework
model code, no config system, no retracing — so the serving graph that
was validated is byte-for-byte the one deployed. Combined with the
persistent XLA compile cache the serving process cold-starts without
re-tracing the model.

The bundle is platform-specific: export on the backend you will serve on
(the model's fast paths are chosen at trace time — TPU traces the fused
Pallas kernels, CPU the XLA path).

Usage:
  python tools/export_serving.py -c expts/01_SA-Fuser_ek100_val_TSN.txt \
      [--ckpt CMFPEarly_.../checkpoint_best] [--batch 256] \
      [--num-classes action:3806] [--dtype bfloat16] [--out serving_bundle]

Writes OUT/{serving.jaxexport, params/, meta.json}; run with
tools/serve_bundle.py.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUNDLE_GRAPH = "serving.jaxexport"
BUNDLE_PARAMS = "params"
BUNDLE_META = "meta.json"


def bucket_graph_name(batch):
    return f"serving_b{int(batch)}.jaxexport"


def read_expt_overrides(path):
    sys.path.insert(0, REPO)
    import run
    return run.read_file_into_cli(path)


def build_serving_fn(cfg, num_classes, dtype, input_dtype="native",
                     topk=0):
    """(model, params, fwd): fwd(params, feats[, scales]) -> fp32 logits,
    or (values, indices) when ``topk`` > 0.

    ``input_dtype='int8'`` makes the graph take per-frame-quantized int8
    features plus fp32 scales (B, T) per modality and dequantize
    ON-DEVICE — halving the client->accelerator feature bytes, the same
    symmetric per-frame scheme as the framework's int8 packed stores
    (afft_tpu/data/readers.py). ``topk`` returns only the top-k
    (score, class) pairs per clip, cutting the response payload ~C/k x.
    Both knobs exist because serving is often LINK-bound, not
    compute-bound (measured on this image: 47 MB/s host link vs 7,100
    clips/s device service rate)."""
    import jax
    import jax.numpy as jnp
    from afft_tpu.models import BaseModel

    model = BaseModel(cfg.model, num_classes=num_classes)
    params = model.init(jax.random.key(cfg.get("seed", 42)))
    if dtype == "bfloat16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    output_len = int(cfg.model.common.get("fp_output_len") or 1)
    feat_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    def head_logits(p, feats):
        outputs, _ = model.apply(p, feats, train=False)
        heads = outputs["logits/action"]
        modk = "all-fused" if "all-fused" in heads else next(iter(heads))
        logits = heads[modk]
        # single-step serving keeps the (B, C) contract; multi-step
        # rollouts (fp_output_len>1, KV-cache decode) export every
        # anticipated step (B, output_len, C)
        if output_len == 1:
            logits = logits[:, 0, :]
        logits = logits.astype(jnp.float32)
        if topk:
            return jax.lax.top_k(logits, topk)
        return logits

    if input_dtype == "int8":
        def fwd(p, feats_q, scales):
            feats = {m: feats_q[m].astype(feat_dtype)
                     * scales[m][..., None].astype(feat_dtype)
                     for m in feats_q}
            return head_logits(p, feats)
    else:
        def fwd(p, feats):
            return head_logits(p, feats)

    return model, params, fwd


def export_bundle(cfg, out_dir, num_classes, batch, n_frames, dtype,
                  ckpt_paths=None, log=print, input_dtype="native",
                  topk=0):
    """``batch`` is an int or a list of ints. A list exports one graph per
    batch-size bucket (``serving_b{B}.jaxexport``) sharing one params
    checkpoint — static shapes are a TPU-compilation fact of life, so a
    dynamic-batching server (tools/serve_concurrent.py) picks the smallest
    bucket that fits the queued requests instead of padding everything to
    one giant batch. ``serving.jaxexport`` stays the largest bucket for
    backward compatibility with single-graph consumers."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import orbax.checkpoint as ocp

    buckets = sorted({int(b) for b in
                      (batch if isinstance(batch, (list, tuple)) else
                       [batch])})
    batch = buckets[-1]
    model, params, fwd = build_serving_fn(cfg, num_classes, dtype,
                                          input_dtype=input_dtype,
                                          topk=topk)
    if ckpt_paths:
        from afft_tpu.train.checkpoint import init_from_model
        import logging
        params, _ = init_from_model(model, params, ckpt_paths,
                                    None, logging.getLogger("export"))
        if dtype == "bfloat16":
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    modal_dims = {m: int(d)
                  for m, d in cfg.model.modal_dims.to_container().items()}
    feat_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    os.makedirs(out_dir, exist_ok=True)
    exp = None
    for b in buckets:
        if input_dtype == "int8":
            feats_spec = {m: jax.ShapeDtypeStruct((b, n_frames, d),
                                                  jnp.int8)
                          for m, d in modal_dims.items()}
            scales_spec = {m: jax.ShapeDtypeStruct((b, n_frames),
                                                   jnp.float32)
                           for m in modal_dims}
            exp = jexport.export(jax.jit(fwd))(params, feats_spec,
                                               scales_spec)
        else:
            feats_spec = {m: jax.ShapeDtypeStruct((b, n_frames, d),
                                                  feat_dtype)
                          for m, d in modal_dims.items()}
            exp = jexport.export(jax.jit(fwd))(params, feats_spec)
        with open(os.path.join(out_dir, bucket_graph_name(b)), "wb") as f:
            f.write(exp.serialize())
    # largest bucket doubles as the legacy single-graph entry point
    with open(os.path.join(out_dir, BUNDLE_GRAPH), "wb") as f:
        f.write(exp.serialize())
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(out_dir, BUNDLE_PARAMS)),
        jax.tree.map(np.asarray, params), force=True)
    meta = {
        "batch": batch,
        "batch_buckets": buckets,
        "input_dtype": input_dtype,
        "topk": int(topk),
        "output_len": int(cfg.model.common.get("fp_output_len") or 1),
        "num_frames": n_frames,
        "modal_dims": modal_dims,
        "feat_dtype": dtype,
        "num_classes": {k: int(v) for k, v in num_classes.items()},
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        # provenance: which weights were baked in (a bundle exported without
        # --ckpt serves RANDOM-INIT params — make that auditable after the
        # fact instead of indistinguishable from a real deployment artifact)
        "ckpt_paths": [str(p) for p in ckpt_paths] if ckpt_paths
        else "RANDOM-INIT (no checkpoint; not a deployment artifact)",
    }
    with open(os.path.join(out_dir, BUNDLE_META), "w") as f:
        json.dump(meta, f, indent=1)
    if not ckpt_paths:
        log("WARNING: exported WITHOUT a checkpoint — the bundle serves "
            "randomly initialized params (meta.json marks it RANDOM-INIT)")
    log(f"serving bundle -> {out_dir} (platforms {meta['platforms']}, "
        f"B={buckets} T={n_frames} dims={modal_dims})")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--cfg", required=True,
                    help="expt override file (run.py format)")
    ap.add_argument("--ckpt", nargs="*", default=None,
                    help="checkpoint dir(s) under checkpoints/ to load")
    ap.add_argument("--batch", default="256",
                    help="batch size, or comma list of bucket sizes "
                         "(e.g. 8,64,256) for dynamic-batching serving")
    ap.add_argument("--num-classes", default="action:3806",
                    help="comma list target:count")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--out", default=os.path.join(REPO, "serving_bundle"))
    ap.add_argument("--output-len", type=int, default=None,
                    help="override model.common.fp_output_len (>1 exports "
                         "the KV-cache multi-step rollout graph)")
    ap.add_argument("--input-dtype", default="native",
                    choices=["native", "int8"],
                    help="int8: graph takes per-frame-quantized features "
                         "+ fp32 scales, dequantizes on-device (halves "
                         "client->device feature bytes)")
    ap.add_argument("--topk", type=int, default=0,
                    help=">0: graph returns (values, indices) of the "
                         "top-k classes instead of dense logits")
    args = ap.parse_args()

    from afft_tpu.config import compose
    extra = [f"model.common.fp_output_len={args.output_len}"] \
        if args.output_len else []
    cfg = compose(os.path.join(REPO, "afft_tpu/conf"),
                  read_expt_overrides(args.cfg) + extra)
    num_classes = {k: int(v) for k, v in
                   (kv.split(":") for kv in args.num_classes.split(","))}
    n_frames = int(cfg.data_eval.num_frames)
    ckpts = None
    if args.ckpt:
        ckpts = [os.path.join(REPO, "checkpoints", p) for p in args.ckpt]
    batch = [int(b) for b in str(args.batch).split(",")]
    export_bundle(cfg, args.out, num_classes, batch, n_frames,
                  args.dtype, ckpts, input_dtype=args.input_dtype,
                  topk=args.topk)


if __name__ == "__main__":
    main()

"""Serving-bundle export/reload roundtrip (tools/export_serving.py).

The bundle (StableHLO graph + orbax params + meta) must reproduce the
live model's logits exactly when replayed through jax.export alone.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_bundle_roundtrip_matches_model(tmp_path):
    from export_serving import build_serving_fn, export_bundle
    from serve_bundle import load_bundle
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb: 16, flow: 16}", "model.common_dim=16",
        "model.fuser.depth=1", "model.fuser.num_heads=2",
        "model.common.fp_inter_dim=16", "model.common.fp_layers=1",
        "model.common.fp_heads=2", "model.dropout=0.0",
        "data_eval.num_frames=6"])
    num_classes = {"action": 11}
    bundle = str(tmp_path / "bundle")
    export_bundle(cfg, bundle, num_classes, batch=4, n_frames=6,
                  dtype="float32", log=lambda *a: None)
    assert os.path.exists(os.path.join(bundle, "serving.jaxexport"))
    assert os.path.exists(os.path.join(bundle, "meta.json"))

    # live model reference
    _, params, fwd = build_serving_fn(cfg, num_classes, "float32")
    rng = np.random.default_rng(0)
    feats = {m: jnp.asarray(rng.standard_normal((4, 6, 16)), jnp.float32)
             for m in ("rgb", "flow")}
    ref = fwd(params, feats)

    fn, loaded_params, meta = load_bundle(bundle)
    assert meta["batch"] == 4 and meta["num_frames"] == 6
    out = fn(loaded_params, feats)
    assert out.shape == (4, 11)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bundle_rejects_wrong_shapes(tmp_path):
    from export_serving import export_bundle
    from serve_bundle import load_bundle
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb: 16}", "model.common_dim=16",
        "model.fuser.depth=1", "model.fuser.num_heads=2",
        "model.common.fp_inter_dim=16", "model.common.fp_layers=1",
        "model.common.fp_heads=2", "model.dropout=0.0"])
    bundle = str(tmp_path / "bundle")
    export_bundle(cfg, bundle, {"action": 5}, batch=2, n_frames=6,
                  dtype="float32", log=lambda *a: None)
    fn, params, _ = load_bundle(bundle)
    bad = {"rgb": jnp.zeros((3, 6, 16), jnp.float32)}  # wrong batch
    try:
        fn(params, bad)
        raised = False
    except Exception:
        raised = True
    assert raised, "bundle must reject mismatched input shapes"


def test_bundle_rollout_output_len(tmp_path):
    """fp_output_len>1 exports the KV-cache multi-step rollout graph:
    the replayed bundle returns (B, output_len, C) and matches the live
    model's rollout exactly."""
    from export_serving import build_serving_fn, export_bundle
    from serve_bundle import load_bundle
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb: 16, flow: 16}", "model.common_dim=16",
        "model.fuser.depth=1", "model.fuser.num_heads=2",
        "model.common.fp_inter_dim=16", "model.common.fp_layers=1",
        "model.common.fp_heads=2", "model.dropout=0.0",
        "model.common.fp_output_len=3",
        "data_eval.num_frames=6"])
    num_classes = {"action": 11}
    bundle = str(tmp_path / "bundle")
    export_bundle(cfg, bundle, num_classes, batch=4, n_frames=6,
                  dtype="float32", log=lambda *a: None)

    _, params, fwd = build_serving_fn(cfg, num_classes, "float32")
    rng = np.random.default_rng(0)
    feats = {m: jnp.asarray(rng.standard_normal((4, 6, 16)), jnp.float32)
             for m in ("rgb", "flow")}
    ref = fwd(params, feats)
    assert ref.shape == (4, 3, 11)

    fn, loaded_params, meta = load_bundle(bundle)
    assert meta["output_len"] == 3
    out = fn(loaded_params, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

"""Dynamic-batching serving driver (tools/serve_concurrent.py).

Per-request logits coming back from the coalescing/padding/bucket path
must equal a direct forward of the same clip — every op in the serving
graph is row-local, so batch composition and zero-padding must not leak
into a request's result. Also pins the bucket-selection policy (smallest
bucket that fits the coalesced queue).
"""

import os
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

CFG = [
    "model.modal_dims={rgb: 16, flow: 16}", "model.common_dim=16",
    "model.fuser.depth=1", "model.fuser.num_heads=2",
    "model.common.fp_inter_dim=16", "model.common.fp_layers=1",
    "model.common.fp_heads=2", "model.dropout=0.0",
    "data_eval.num_frames=6"]
NUM_CLASSES = {"action": 11}


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    from export_serving import export_bundle
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", CFG)
    out = str(tmp_path_factory.mktemp("serve") / "bundle")
    export_bundle(cfg, out, NUM_CLASSES, batch=[2, 4, 8], n_frames=6,
                  dtype="float32", log=lambda *a: None)
    return out


def _clips(n, seed=0):
    rng = np.random.default_rng(seed)
    return [{m: rng.standard_normal((6, 16)).astype(np.float32)
             for m in ("rgb", "flow")} for _ in range(n)]


def test_bucket_graphs_exported(bundle):
    from export_serving import bucket_graph_name
    from serve_bundle import load_bundle_buckets

    for b in (2, 4, 8):
        assert os.path.exists(os.path.join(bundle, bucket_graph_name(b)))
    fns, params, meta = load_bundle_buckets(bundle)
    assert sorted(fns) == [2, 4, 8]
    assert meta["batch_buckets"] == [2, 4, 8]
    assert meta["batch"] == 8  # legacy field = largest bucket
    # every bucket graph runs at its own shape and agrees with the others
    import jax.numpy as jnp
    clip = _clips(1)[0]
    outs = {}
    for b, fn in fns.items():
        feats = {m: jnp.asarray(np.broadcast_to(clip[m], (b, 6, 16)))
                 for m in clip}
        outs[b] = np.asarray(fn(params, feats))[0]
    np.testing.assert_allclose(outs[2], outs[8], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[4], outs[8], rtol=1e-5, atol=1e-5)


def test_concurrent_results_match_direct_forward(bundle):
    """9 clips submitted from 3 threads: every per-request result equals
    the clip's direct single-graph forward, regardless of how the
    scheduler coalesced/padded them."""
    import jax.numpy as jnp
    from serve_bundle import load_bundle
    from serve_concurrent import BundleServer

    fn, params, meta = load_bundle(bundle)
    clips = _clips(9, seed=1)
    # direct reference: each clip alone in the (padded) largest bucket
    refs = []
    for c in clips:
        feats = {m: jnp.asarray(np.concatenate(
            [c[m][None], np.zeros((7, 6, 16), np.float32)]))
            for m in c}
        refs.append(np.asarray(fn(params, feats))[0])

    server = BundleServer(bundle, max_wait_ms=20.0)
    try:
        futs = [None] * len(clips)

        def submit(lo, hi):
            for i in range(lo, hi):
                futs[i] = server.submit(clips[i])

        threads = [threading.Thread(target=submit, args=(i * 3, i * 3 + 3))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, fut in enumerate(futs):
            logits, lat = fut.result(timeout=60)
            assert lat > 0
            np.testing.assert_allclose(logits, refs[i], rtol=1e-5,
                                       atol=1e-5)
    finally:
        server.close()
    assert sum(server.batch_hist.values()) >= 1


def test_bucket_selection_smallest_fit(bundle):
    """A lone request must dispatch through the SMALLEST bucket (2), not
    pad out to 8; a burst of 5+ goes through 8."""
    from serve_concurrent import BundleServer

    server = BundleServer(bundle, max_wait_ms=1.0)
    try:
        server.submit(_clips(1)[0]).result(timeout=60)
        assert server.batch_hist[2] == 1 and server.batch_hist[8] == 0
    finally:
        server.close()

    server = BundleServer(bundle, max_wait_ms=200.0)
    try:
        clips = _clips(6, seed=2)
        futs = [server.submit(c) for c in clips]
        for f in futs:
            f.result(timeout=60)
        # 200 ms coalescing window -> one batch of 6 -> bucket 8
        assert server.batch_hist[8] == 1, server.batch_hist
    finally:
        server.close()


def test_malformed_request_fails_future_not_server(bundle):
    """A request with a wrong feature shape (or missing modality) must
    fail ITS OWN future; the scheduler thread survives and keeps serving
    subsequent well-formed requests."""
    from serve_concurrent import BundleServer

    server = BundleServer(bundle, max_wait_ms=1.0)
    try:
        bad_shape = {m: np.zeros((6, 99), np.float32)
                     for m in ("rgb", "flow")}
        with pytest.raises(Exception):
            server.submit(bad_shape).result(timeout=60)
        missing_mod = {"rgb": np.zeros((6, 16), np.float32)}
        with pytest.raises(KeyError):
            server.submit(missing_mod).result(timeout=60)
        # server still alive: a good request round-trips
        logits, _ = server.submit(_clips(1)[0]).result(timeout=60)
        assert logits.shape == (11,)
    finally:
        server.close()


def test_percentiles_empty_is_none():
    from serve_concurrent import _percentiles

    res = _percentiles([])
    assert res == {"p50_ms": None, "p95_ms": None, "p99_ms": None,
                   "mean_ms": None}


def test_open_and_closed_loop_smoke(bundle):
    from serve_concurrent import (BundleServer, run_closed_loop,
                                  run_open_loop)

    server = BundleServer(bundle, max_wait_ms=2.0)
    try:
        res = run_open_loop(server, rate_hz=200.0, duration_s=1.0)
        assert res["requests"] > 0 and res["p99_ms"] > 0
        res2 = run_closed_loop(server, n_clients=4, duration_s=1.0)
        assert res2["throughput_clips_per_sec"] > 0
        assert res2["p50_ms"] <= res2["p99_ms"]
    finally:
        server.close()


def test_int8_transport_topk_bundle(tmp_path):
    """Quantized-transport serving: the int8+topk bundle takes per-frame
    int8 features + fp32 scales (half the link bytes), dequantizes
    on-device, and returns (values, indices) of the top-k classes. Each
    request's top-1 must match the dense fp32 forward and the returned
    scores must sit near the dense logits (int8 feature rounding is the
    only error source; bounded like the packed-store int8 path)."""
    import jax.numpy as jnp
    from export_serving import build_serving_fn, export_bundle
    from serve_bundle import load_bundle
    from serve_concurrent import BundleServer
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", CFG)
    bundle = str(tmp_path / "bundle_i8")
    export_bundle(cfg, bundle, NUM_CLASSES, batch=[2, 4], n_frames=6,
                  dtype="float32", log=lambda *a: None,
                  input_dtype="int8", topk=3)
    import json as _json
    meta = _json.load(open(os.path.join(bundle, "meta.json")))
    assert meta["input_dtype"] == "int8" and meta["topk"] == 3

    # dense fp32 reference on the SAME params (seed-matched init)
    _, params, fwd = build_serving_fn(cfg, NUM_CLASSES, "float32")
    clips = _clips(4, seed=3)
    refs = []
    for c in clips:
        feats = {m: jnp.asarray(np.broadcast_to(c[m], (4, 6, 16)))
                 for m in c}
        refs.append(np.asarray(fwd(params, feats))[0])

    server = BundleServer(bundle, max_wait_ms=20.0)
    try:
        futs = [server.submit(c) for c in clips]
        for i, fut in enumerate(futs):
            (vals, idx), _lat = fut.result(timeout=60)
            assert vals.shape == (3,) and idx.shape == (3,)
            assert idx[0] == int(refs[i].argmax()), (idx, refs[i].argmax())
            rel = np.abs(vals - refs[i][idx]).max() / \
                (np.abs(refs[i]).max() + 1e-9)
            assert rel < 0.05, rel
    finally:
        server.close()


def test_serve_bundle_replay_int8_topk(tmp_path):
    """serve_bundle.load_bundle replays int8/topk graphs (random batch
    path used by the --iters bench)."""
    from export_serving import export_bundle
    from serve_bundle import _random_batch, load_bundle
    from afft_tpu.config import compose

    cfg = compose("afft_tpu/conf", CFG)
    bundle = str(tmp_path / "bundle_i8b")
    export_bundle(cfg, bundle, NUM_CLASSES, batch=2, n_frames=6,
                  dtype="float32", log=lambda *a: None,
                  input_dtype="int8", topk=2)
    fn, params, meta = load_bundle(bundle)
    args = _random_batch(meta)
    vals, idx = fn(params, *args)
    assert vals.shape == (2, 2) and idx.shape == (2, 2)
    assert np.isfinite(np.asarray(vals)).all()

"""Concurrent serving driver: dynamic batching over an exported bundle.

Production TPU serving is static-shape serving: every compiled graph has
a fixed batch size, so "dynamic batching" on TPU means (1) coalescing
concurrently-arriving single-clip requests into a batch, (2) picking the
smallest exported batch-size BUCKET that fits the queue, and (3) padding
the remainder. This driver implements that pattern over the bundles
written by tools/export_serving.py (``--batch 8,64,256`` exports the
bucket graphs), with:

- a scheduler thread that coalesces requests (waits up to ``max_wait_ms``
  for the batch to fill — classic latency/throughput knob);
- async dispatch: the scheduler enqueues device work and moves on; a
  completion thread blocks on device->host readback and fulfils request
  futures, so host batch assembly overlaps device compute (double
  buffering, bounded by ``max_inflight``);
- an open-loop Poisson load generator measuring the latency distribution
  (p50/p95/p99) at a given offered rate, and a closed-loop mode
  measuring saturated throughput.

The reference has no serving story at all (its eval path is
test.py -> h5 dumps; reference test.py:1-60); this subsystem is
beyond-reference capability, benchmarked on hardware in
SERVECONC_r03.json.

Usage:
  python tools/export_serving.py -c expts/01_SA-Fuser_ek100_val_TSN.txt \
      --batch 8,64,256 --out serving_bundle
  python tools/serve_concurrent.py --bundle serving_bundle \
      --rate 2000 --duration 20            # open-loop, latency percentiles
  python tools/serve_concurrent.py --bundle serving_bundle \
      --closed 64 --duration 20            # closed-loop, max throughput
"""

import argparse
import json
import os
import queue
import sys
import threading
import time
from concurrent.futures import Future

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afft_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()  # repo-local persistent XLA cache (.jax_cache)

from serve_bundle import load_bundle_buckets  # noqa: E402


class BundleServer:
    """Dynamic-batching server over a multi-bucket serving bundle.

    ``submit(feats)`` takes ONE clip — a dict of per-modality (T, F)
    float arrays — and returns a Future resolving to the clip's logits
    (np.ndarray). Thread-safe; call ``close()`` to drain and stop.
    """

    def __init__(self, bundle_dir, max_wait_ms=2.0, max_inflight=2):
        import jax.numpy as jnp

        self.fns, self.params, self.meta = load_bundle_buckets(bundle_dir)
        self.buckets = sorted(self.fns)
        self.max_wait_s = max_wait_ms / 1e3
        self._jnp = jnp
        self._int8 = self.meta.get("input_dtype") == "int8"
        self._topk = int(self.meta.get("topk") or 0)
        if self._int8:
            self._np_dtype = np.int8
        elif self.meta["feat_dtype"] == "bfloat16":
            import ml_dtypes
            # assemble host batches directly in bf16: halves the bytes
            # over the host->device link (the link is the scarce
            # resource in bandwidth-bound serving, not host memcpy)
            self._np_dtype = ml_dtypes.bfloat16
        else:
            self._np_dtype = np.float32
        self._queue = queue.SimpleQueue()   # (feats, Future, t_submit)
        self._done_q = queue.Queue()        # (logits_dev, reqs) awaiting D2H
        self._inflight = threading.Semaphore(max_inflight)
        self._stop = threading.Event()
        self.batch_hist = {b: 0 for b in self.buckets}  # dispatch counts
        # warm every bucket's executable so first real requests don't pay
        # a compile/initial-dispatch stall
        for b in self.buckets:
            out = self.fns[b](self.params, *self._zero_args(b))
            # jax.export's call returns a LIST for multi-output graphs
            np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
        self._sched = threading.Thread(target=self._scheduler, daemon=True)
        self._compl = threading.Thread(target=self._completer, daemon=True)
        self._sched.start()
        self._compl.start()

    # ---- client API ----

    def submit(self, feats):
        fut = Future()
        self._queue.put((feats, fut, time.perf_counter()))
        return fut

    def close(self):
        self._stop.set()
        self._sched.join(timeout=30)
        self._done_q.put(None)
        self._compl.join(timeout=30)

    # ---- internals ----

    def _zero_args(self, bucket):
        T = self.meta["num_frames"]
        feats = {m: self._jnp.asarray(
            np.zeros((bucket, T, d), self._np_dtype))
            for m, d in self.meta["modal_dims"].items()}
        if self._int8:
            scales = {m: self._jnp.ones((bucket, T), self._jnp.float32)
                      for m in self.meta["modal_dims"]}
            return feats, scales
        return (feats,)

    def _collect(self):
        """Coalesce queued requests into one batch: block for the first
        request, then keep draining until the largest bucket fills or
        ``max_wait_ms`` passes with an empty queue."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return None
        reqs = [first]
        cap = self.buckets[-1]
        deadline = time.perf_counter() + self.max_wait_s
        while len(reqs) < cap:
            try:
                reqs.append(self._queue.get_nowait())
                continue
            except queue.Empty:
                pass
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                reqs.append(self._queue.get(
                    timeout=min(remaining, self.max_wait_s)))
            except queue.Empty:
                break
        return reqs

    def _scheduler(self):
        while not (self._stop.is_set() and self._queue.empty()):
            reqs = self._collect()
            if not reqs:
                continue
            try:
                self._dispatch(reqs)
            except Exception as e:
                # a malformed request (wrong dim, missing modality) or a
                # dispatch failure must not kill the scheduler thread:
                # fail THIS batch's futures and keep serving
                for _, fut, _ in reqs:
                    if not fut.done():
                        fut.set_exception(e)

    def _dispatch(self, reqs):
        # _collect caps the batch at buckets[-1], so a fitting bucket
        # always exists
        bucket = next(b for b in self.buckets if b >= len(reqs))
        T = self.meta["num_frames"]
        batch, batch_scales = {}, {}
        for m, d in self.meta["modal_dims"].items():
            if self._int8:
                # per-frame symmetric quantization — the SAME helper the
                # int8 packed stores use, so the serving transport stays
                # locked to the accuracy envelope the store tests pin;
                # the graph dequantizes on-device, so the link carries
                # 1 byte/feature + one fp32 scale per frame
                from afft_tpu.data.readers import PackedFeatureStore
                x = np.zeros((bucket, T, d), np.float32)
                for i, (feats, _, _) in enumerate(reqs):
                    x[i] = feats[m]
                q, scales = PackedFeatureStore._quantize_rows(
                    x.reshape(bucket * T, d))
                batch[m] = self._jnp.asarray(q.reshape(bucket, T, d))
                batch_scales[m] = self._jnp.asarray(
                    scales.reshape(bucket, T))
            else:
                arr = np.zeros((bucket, T, d), self._np_dtype)
                for i, (feats, _, _) in enumerate(reqs):
                    arr[i] = feats[m]  # numpy casts on assignment
                batch[m] = self._jnp.asarray(arr)
        args = (batch, batch_scales) if self._int8 else (batch,)
        # bound device-queue depth, then dispatch WITHOUT waiting for
        # the result: jax execution is async, the completer owns the
        # blocking device->host readback
        self._inflight.acquire()
        try:
            out = self.fns[bucket](self.params, *args)
        except Exception:
            self._inflight.release()
            raise
        self.batch_hist[bucket] += 1
        self._done_q.put((out, reqs))

    def _completer(self):
        while True:
            item = self._done_q.get()
            if item is None:
                return
            out_dev, reqs = item
            try:
                if isinstance(out_dev, (tuple, list)):  # topk: values, idx
                    vals, idx = (np.asarray(a) for a in out_dev)
                    result_rows = list(zip(vals, idx))
                else:
                    result_rows = np.asarray(out_dev)  # blocks until ready
                t_done = time.perf_counter()
                for i, (_, fut, t_sub) in enumerate(reqs):
                    fut.set_result((result_rows[i], t_done - t_sub))
            except Exception as e:  # propagate device failures to callers
                for _, fut, _ in reqs:
                    if not fut.done():
                        fut.set_exception(e)
            finally:
                self._inflight.release()


def _percentiles(lat_s):
    if not len(lat_s):  # e.g. duration shorter than one batch latency
        return {"p50_ms": None, "p95_ms": None, "p99_ms": None,
                "mean_ms": None}
    lat = np.sort(np.asarray(lat_s)) * 1e3
    pick = lambda p: float(lat[min(len(lat) - 1,
                                   int(round(p / 100 * (len(lat) - 1))))])
    return {"p50_ms": round(pick(50), 2), "p95_ms": round(pick(95), 2),
            "p99_ms": round(pick(99), 2), "mean_ms":
            round(float(lat.mean()), 2)}


def _random_clip(meta, rng):
    return {m: rng.standard_normal(
        (meta["num_frames"], d)).astype(np.float32)
        for m, d in meta["modal_dims"].items()}


def run_open_loop(server, rate_hz, duration_s, seed=0):
    """Poisson arrivals at ``rate_hz`` for ``duration_s``; returns achieved
    throughput + latency percentiles. Arrival timing uses one generator
    thread (inter-arrival sleeps), which caps offered rates around
    ~50k req/s — far above this model's per-chip service rate."""
    rng = np.random.default_rng(seed)
    clip = _random_clip(server.meta, rng)  # same payload; timing is the test
    futures = []
    t_end = time.perf_counter() + duration_s
    while time.perf_counter() < t_end:
        futures.append(server.submit(clip))
        time.sleep(rng.exponential(1.0 / rate_hz))
    t0_done = time.perf_counter()
    lats = [f.result(timeout=120)[1] for f in futures]
    drain_s = time.perf_counter() - t0_done
    return {
        "mode": "open-loop", "offered_rate": rate_hz,
        "requests": len(futures),
        "achieved_rate": round(len(futures) / duration_s, 1),
        "drain_s_after_stop": round(drain_s, 2),
        **_percentiles(lats),
    }


def run_closed_loop(server, n_clients, duration_s, seed=0):
    """n_clients threads, each submit->wait->repeat: saturated throughput."""
    rng = np.random.default_rng(seed)
    clip = _random_clip(server.meta, rng)
    lats, lock = [], threading.Lock()
    stop = time.perf_counter() + duration_s
    counts = [0] * n_clients

    def client(ci):
        local = []
        while time.perf_counter() < stop:
            _, lat = server.submit(clip).result(timeout=120)
            local.append(lat)
            counts[ci] += 1
        with lock:
            lats.extend(local)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return {
        "mode": "closed-loop", "clients": n_clients,
        "requests": int(sum(counts)),
        "throughput_clips_per_sec": round(sum(counts) / wall, 1),
        **_percentiles(lats),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--rate", type=float, default=None,
                    help="open-loop offered rate (req/s)")
    ap.add_argument("--closed", type=int, default=None,
                    help="closed-loop client count")
    ap.add_argument("--sweep", action="store_true",
                    help="one process, full curve: closed-loop saturation "
                         "then open-loop at fractions of it (TPU-friendly: "
                         "one process = one worker wedge window)")
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--max-inflight", type=int, default=2)
    ap.add_argument("--out", default=None, help="append JSON result here")
    args = ap.parse_args()

    server = BundleServer(args.bundle, max_wait_ms=args.max_wait_ms,
                          max_inflight=args.max_inflight)
    def finish(res):
        res["buckets"] = server.buckets
        res["batch_hist"] = {str(k): v for k, v in server.batch_hist.items()
                             if v}
        res["max_wait_ms"] = args.max_wait_ms
        print(json.dumps(res), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(res) + "\n")
        for b in server.batch_hist:
            server.batch_hist[b] = 0

    try:
        if args.sweep:
            # 2x the largest bucket keeps a second batch queued while one
            # computes (double buffering); fewer clients would serialize
            # assemble -> compute -> readback
            sat = run_closed_loop(server, n_clients=2 * server.buckets[-1],
                                  duration_s=args.duration)
            finish(sat)
            peak = sat["throughput_clips_per_sec"]
            for frac in (0.25, 0.5, 0.75):
                finish(run_open_loop(server, rate_hz=frac * peak,
                                     duration_s=args.duration))
        elif args.closed:
            finish(run_closed_loop(server, args.closed, args.duration))
        else:
            finish(run_open_loop(server, args.rate or 100.0, args.duration))
    finally:
        server.close()


if __name__ == "__main__":
    main()

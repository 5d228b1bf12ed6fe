"""On-device feature cache: eliminate per-batch host->device traffic.

Pre-extracted feature datasets are small by TPU-HBM standards (EK100 val:
~1 GB of bf16 clips; train: ~7 GB), while the host->device link — a tunnel
in this environment, PCIe elsewhere — is the serving bottleneck. So: gather
every planned clip once through the packed store (host side, vectorized),
upload the (N, T, F) tensor per modality once, and serve batches as an
on-device ``jnp.take`` driven by ~KB-sized index arrays.

Effectively the dataset becomes a resident "feature table" in HBM, the
logical endpoint of the reference's LMDB-random-read design for serving
(reference datasets/reader_fns.py) once the store no longer needs a host
round-trip. Gated on the clip plan (deterministic strategies) and on no
host-side augmentations; falls back to the streaming loader otherwise.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

log = logging.getLogger(__name__)

_CHUNK_WRITE = None


def _chunk_write(dst, part, lo):
    """dst[lo:lo+len(part)] = part with the destination DONATED — one
    shared jitted program (cached per shape) so cache construction's
    peak HBM is full-size + one chunk, not 2x full-size."""
    global _CHUNK_WRITE
    if _CHUNK_WRITE is None:
        import jax
        _CHUNK_WRITE = jax.jit(
            lambda a, c, i: jax.lax.dynamic_update_slice_in_dim(a, c, i, 0),
            donate_argnums=0)
    return _CHUNK_WRITE(dst, part, lo)


def estimated_bytes(dataset, itemsize=2) -> int:
    plan = getattr(dataset, "_plan", None)
    if plan is None:
        return 1 << 62
    n, t = plan["frame_ids"].shape
    dims = sum(sum(s.feature_dim for s in r.stores)
               for r in dataset.reader_fn.values())
    return n * t * dims * itemsize


class DeviceFeatureCache:
    """Materialized clips resident in HBM, indexed per batch on device."""

    def __init__(self, dataset, dtype=None, chunk: int = 512,
                 max_bytes: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        assert getattr(dataset, "supports_batch_load", lambda: False)(), \
            "device cache needs the precomputed clip plan"
        assert all(t is None for t in dataset.transforms.values()), \
            "host-side transforms (e.g. ZeroMask) require the host loader"
        self.quantized = dtype in ("int8", np.int8, jnp.int8)
        dtype = jnp.bfloat16 if (dtype is None or self.quantized) else dtype
        if max_bytes is not None:
            need = estimated_bytes(dataset, 1 if self.quantized else 2)
            assert need <= max_bytes, \
                f"dataset too large for device cache: {need / 1e9:.1f} GB"

        self.dataset = dataset
        plan = dataset._plan
        n = len(dataset)
        # features[mod] is either a (N, T, F) array, or — with int8
        # quantization (halved HBM footprint; symmetric per-frame scales,
        # same scheme as the packed store's int8 mode, readers.py) — a
        # (int8 (N, T, F), scales (N, T)) tuple that ``take`` dequantizes
        # on device at gather time.
        self.features: Dict[str, "jax.Array"] = {}
        for mod in dataset.reader_fn:
            # chunks are written into a PREALLOCATED device array through a
            # donated dynamic_update_slice — collecting every chunk and
            # jnp.concatenate-ing would transiently hold ~2x the cache in
            # HBM (all chunks + the full copy) during construction
            feats = scales = None
            for lo in range(0, n, chunk):
                idx = np.arange(lo, min(lo + chunk, n))
                host = np.asarray(dataset.load_batch(idx)["data_dict"][mod],
                                  np.float32)
                if self.quantized:
                    scale = np.abs(host).max(axis=-1) / 127.0  # (chunk, T)
                    q = np.where(scale[..., None] > 0,
                                 np.rint(host / np.maximum(
                                     scale, 1e-30)[..., None]), 0.0)
                    # scales stay fp32: they are only (N, T) next to the
                    # (N, T, F) int8 payload, and bf16's 8-bit mantissa
                    # would add ~0.4% multiplicative error on every feature
                    if feats is None:
                        feats = jnp.zeros((n,) + host.shape[1:], jnp.int8)
                        scales = jnp.zeros((n,) + scale.shape[1:],
                                           jnp.float32)
                    feats = _chunk_write(feats,
                                         jnp.asarray(q.astype(np.int8)), lo)
                    scales = _chunk_write(scales,
                                          jnp.asarray(scale, jnp.float32),
                                          lo)
                else:
                    if feats is None:
                        feats = jnp.zeros((n,) + host.shape[1:], dtype)
                    feats = _chunk_write(feats, jnp.asarray(host, dtype), lo)
            self.features[mod] = (feats, scales) if self.quantized else feats
        total = sum(sum(x.nbytes for x in (f if isinstance(f, tuple)
                                           else (f,)))
                    for f in self.features.values())
        log.info("device feature cache: %d clips, %.2f GB in HBM%s",
                 n, total / 1e9, " (int8)" if self.quantized else "")

        self.targets = {t: plan["target"][t] for t in dataset.label_type}
        self.labels = plan.get("labels")
        self.uid = np.asarray(plan["uid"])

    @staticmethod
    def take(entry, idx):
        """Device-side gather of one modality's cache entry; dequantizes
        int8 entries to bf16. Safe to call inside jit (entries are
        pytrees), which fuses gather + dequant into the consuming program.
        """
        import jax.numpy as jnp
        if isinstance(entry, tuple):
            q, scale = entry
            # dequant in fp32 (exact for int8 payload x fp32 scale), then
            # one rounding to the bf16 activation dtype
            deq = (jnp.take(q, idx, axis=0).astype(jnp.float32)
                   * jnp.take(scale, idx, axis=0)[..., None])
            return deq.astype(jnp.bfloat16)
        return jnp.take(entry, idx, axis=0)

    def batch(self, indices: np.ndarray) -> Dict:
        """Batch dict with on-device feature gathers (tiny index upload)."""
        import jax.numpy as jnp
        indices = np.asarray(indices)
        idx_dev = jnp.asarray(indices.astype(np.int32))
        batch = {
            "data_dict": {m: self.take(f, idx_dev)
                          for m, f in self.features.items()},
            "target": {t: v[indices] for t, v in self.targets.items()},
            "uid": self.uid[indices],
            "idx": indices.astype(np.int64),
            "valid": np.ones(len(indices), bool),
        }
        if self.labels is not None:
            batch["target_subclips"] = {
                t: v[indices][:, :, None] for t, v in self.labels.items()}
        return batch

    def iter_batches(self, batch_size: int, shuffle=False, seed=0, epoch=0,
                     shard_id=0, num_shards=1, pad_final=True,
                     sample_weights=None):
        from .loader import shard_indices
        indices = shard_indices(len(self.dataset), shuffle, seed, epoch,
                                shard_id, num_shards,
                                weights=sample_weights)
        n_batches = int(np.ceil(len(indices) / batch_size))
        for b in range(n_batches):
            chunk = indices[b * batch_size:(b + 1) * batch_size]
            if pad_final and len(chunk) < batch_size:
                full = np.concatenate(
                    [chunk, np.repeat(chunk[-1:],
                                      batch_size - len(chunk))])
                batch = self.batch(full)
                batch["valid"] = np.arange(batch_size) < len(chunk)
            else:
                batch = self.batch(chunk)
            yield batch

    def iter_index_batches(self, batch_size: int, shuffle=False, seed=0,
                           epoch=0, shard_id=0, num_shards=1,
                           n_passes: int = 1):
        """Yield (int32 index array, n_valid) pairs for single-dispatch
        serving: jit a forward that takes (params, cache.features, idx) and
        does the ``jnp.take`` inside — the gathers fuse into the program and
        each batch costs ONE dispatch instead of one per modality (each
        dispatch is ~0.5 ms on the tunneled link; see bench.py).

        ``n_passes > 1`` streams batches ACROSS epoch boundaries (each clip
        served exactly n_passes times, one padded batch total) — per-epoch
        final-batch padding otherwise burns ceil(n/B)-n/B of a batch per
        pass."""
        from .loader import shard_indices
        # each pass draws its own permutation (epoch+p) so multi-pass
        # streaming with shuffle=True does not replay one clip order
        indices = np.concatenate([
            shard_indices(len(self.dataset), shuffle, seed, epoch + p,
                          shard_id, num_shards)
            for p in range(max(1, n_passes))])
        n_batches = int(np.ceil(len(indices) / batch_size))
        for b in range(n_batches):
            chunk = indices[b * batch_size:(b + 1) * batch_size]
            n_valid = len(chunk)
            if n_valid < batch_size:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch_size - n_valid)])
            yield np.asarray(chunk, np.int32), n_valid

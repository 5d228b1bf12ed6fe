"""Mixup with ignore-class handling, in pure jax.

Behavioural reference: common/mixup.py in the upstream repo. The reference
gathers the rows whose past labels contain no ignore class and mixes them
with their flipped order (:75-87); here the dynamic gather becomes a
jit-friendly partner-permutation over the same selected rows, producing
identical values. When <=1 rows are mixable the batch passes through
unmixed (reference :155-157), expressed as lambda := 1.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def convert_to_one_hot(targets, num_class: int, label_smooth: float = 0.0):
    """(..., ) int -> (..., C) with smoothing (reference :17-47)."""
    non_target = label_smooth / num_class
    target_value = 1.0 - label_smooth + non_target
    oh = jax.nn.one_hot(targets, num_class, dtype=jnp.float32)
    return non_target + (target_value - non_target) * oh


def batch_wo_ignore_cls(target_subclips, ignore_cls=-1):
    """(B, T, 1) or (B, T) -> (B,) rows with no ignore label
    (reference :10-14)."""
    t = target_subclips.reshape(target_subclips.shape[0], -1)
    return (t != ignore_cls).all(axis=-1)


def _partner_perm(sel: jnp.ndarray):
    """Row index of each selected row's mixing partner: the selected rows in
    flipped order; unselected rows point at themselves."""
    B = sel.shape[0]
    pos = jnp.cumsum(sel) - 1                     # position among selected
    total = sel.sum()
    rows = jnp.arange(B)
    pos_to_row = jnp.zeros((B + 1,), jnp.int32).at[
        jnp.where(sel, pos, B)].set(rows.astype(jnp.int32))
    partner = pos_to_row[jnp.where(sel, total - 1 - pos, B)]
    return jnp.where(sel, partner, rows)


def _mix(x, sel, partner, lam):
    mixed = lam * x + (1.0 - lam) * x[partner]
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return jnp.where(sel.reshape(shape), mixed, x)


class MixUp:
    """Feature-space mixup (reference common/mixup.py:90-182).

    Call with an rng key; applied to {mod: (B,T,F)} features and label dicts.
    Returns (features, one-hot labels, one-hot subclip labels or None,
    subclip ignore masks or None).
    """

    def __init__(self, alpha: float = 1.0, label_smoothing: Dict = None,
                 num_classes: Dict = None, one_hot: bool = False,
                 ignore_cls: int = -1):
        self.alpha = alpha
        self.label_smoothing = label_smoothing or {}
        self.num_classes = num_classes
        self.one_hot = one_hot
        self.ignore_cls = ignore_cls

    def __call__(self, rng, x_video: Dict, labels: Dict,
                 labels_subclips: Optional[Dict], valid=None):
        lam = jax.random.beta(rng, self.alpha, self.alpha)
        return self.mix(lam, x_video, labels, labels_subclips, valid)

    def mix(self, lam, x_video: Dict, labels: Dict,
            labels_subclips: Optional[Dict], valid=None):
        labels_out = {
            key: convert_to_one_hot(val, self.num_classes[key],
                                    self.label_smoothing.get(key, 0.0))
            for key, val in labels.items()}

        B = next(iter(x_video.values())).shape[0]
        if labels_subclips is not None:
            first = next(iter(labels_subclips.values()))
            sel = batch_wo_ignore_cls(first, self.ignore_cls)
            labels_subclips_out, ignore_masks = {}, {}
            for key, val in labels_subclips.items():
                val = val.reshape(val.shape[0], -1)       # (B, T)
                ignore = val == self.ignore_cls
                safe = jnp.where(ignore, 0, val)
                ignore_masks[key] = ignore
                labels_subclips_out[key] = convert_to_one_hot(
                    safe, self.num_classes[key],
                    self.label_smoothing.get(key, 0.0))
        else:
            sel = jnp.ones((B,), bool)
            labels_subclips_out, ignore_masks = None, None

        if valid is not None:
            # padded rows (fixed-shape final batch) never participate in the
            # mix — the reference operates on unpadded batches
            sel = sel & valid

        # <=1 mixable rows: pass through unmixed (lam := 1)
        lam = jnp.where(sel.sum() <= 1, 1.0, lam)
        partner = _partner_perm(sel)

        x_out = {m: _mix(x, sel, partner, lam) for m, x in x_video.items()}
        labels_out = {k: _mix(v, sel, partner, lam)
                      for k, v in labels_out.items()}
        if labels_subclips_out is not None:
            labels_subclips_out = {k: _mix(v, sel, partner, lam)
                                   for k, v in labels_subclips_out.items()}
        return x_out, labels_out, labels_subclips_out, ignore_masks

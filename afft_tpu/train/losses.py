"""Loss and per-batch metric computation.

Behavioural reference: common/runner.py:13-168 in the upstream repo
(MultiDimCrossEntropy, BasicLossAccuracy). Pure-jax and jit-safe: dynamic row
filtering becomes mask-weighted means with identical values, and the padded
rows of fixed-shape batches are excluded through a ``valid`` mask (the
reference never pads, so valid=ones reproduces it exactly).

Losses returned per key (cls_*/past_cls_*/past_reg_*), reduced and weighted
by :func:`reduce_losses` with the reference's prefix-matched loss weights
(common/runner.py:171-213).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

PAST_LOGITS_PREFIX = "past_"


def _log_softmax(x):
    return jax.nn.log_softmax(x, axis=-1)


def cross_entropy_index(logits, tgt, ignore_index=-1):
    """Per-element CE with zeros at ignored targets (torch
    reduction='none' + ignore_index semantics). logits (..., C), tgt (...)."""
    logp = _log_softmax(logits)
    safe_tgt = jnp.where(tgt == ignore_index, 0, tgt)
    ce = -jnp.take_along_axis(logp, safe_tgt[..., None], axis=-1)[..., 0]
    return jnp.where(tgt == ignore_index, 0.0, ce)


def cross_entropy_one_hot(logits, tgt):
    """Per-element CE against one-hot/soft targets. logits (..., C)."""
    return -(tgt * _log_softmax(logits)).sum(axis=-1)


def _masked_mean(x, mask):
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / denom


def topk_correct(logits, labels, k):
    """Count of rows whose label is in the top-k logits. logits (B, C)."""
    topk = jax.lax.top_k(logits, k)[1]
    return (topk == labels[:, None]).any(axis=-1)


def future_action_terms(logits, tgt_val, mixup_enable, valid,
                        class_weights=None):
    """Future-action loss + acc payload (reference runner.py:54-92).

    logits: (B, T', C) with T'>=1; tgt_val: (B,) int or (B, C) one-hot.
    ``class_weights`` is an optional (C,) per-class loss weight vector
    (torch ``CrossEntropyLoss(weight=...)`` semantics: index targets use a
    weighted mean with the per-sample weight in the denominator; soft/one-hot
    targets scale each class term and keep the plain-count denominator).
    The reference trains unweighted; this is the loss-side counterpart of
    the class-balanced sampler (afft_tpu.data.stats).
    Returns (loss, acc1, acc5, mt5r_logits, mt5r_labels).
    """
    B, Tp, C = logits.shape
    seq = 0
    if mixup_enable:
        soft_tgt = tgt_val if class_weights is None else \
            tgt_val * class_weights[None, :]
        loss = cross_entropy_one_hot(
            logits.reshape(-1, C), jnp.repeat(soft_tgt, Tp, axis=0))
        loss = loss.reshape(B, Tp)
        # top-2 merge trick: credit the dominant mixup component with both
        # component scores (reference :62-74)
        _, top2 = jax.lax.top_k(tgt_val, 2)
        preds = logits
        rows = jnp.arange(B)
        p1 = preds[rows, seq, top2[:, 0]]
        p2 = preds[rows, seq, top2[:, 1]]
        preds = preds.at[rows, seq, top2[:, 0]].set(p1 + p2)
        preds = preds.at[rows, seq, top2[:, 1]].set(0.0)
        labels = top2[:, 0]
    else:
        loss = cross_entropy_index(logits.reshape(-1, C),
                                   jnp.repeat(tgt_val, Tp, axis=0))
        loss = loss.reshape(B, Tp)
        preds = logits
        labels = tgt_val

    # reference accuracy() flattens (B, T', C); with T'=1 this is per-sample
    flat_valid = jnp.repeat(valid, Tp)
    flat_labels = jnp.repeat(labels, Tp)
    flat_preds = preds.reshape(-1, C)
    acc1 = _masked_mean(
        topk_correct(flat_preds, flat_labels, 1).astype(jnp.float32),
        flat_valid) * 100.0
    acc5 = _masked_mean(
        topk_correct(flat_preds, flat_labels,
                     min(5, C)).astype(jnp.float32), flat_valid) * 100.0
    if class_weights is not None and not mixup_enable:
        # torch weighted mean: sum_i w[y_i] ce_i / sum_i w[y_i]. The flat
        # (B*T') weighted mean equals this per-sample form because every
        # T' element of a sample shares its class weight. ignore_index
        # (-1) rows get weight 0, excluding them from BOTH numerator and
        # denominator exactly like torch CrossEntropyLoss(weight=...,
        # ignore_index=-1) (cross_entropy_index already zeros their loss).
        w = jnp.where(tgt_val >= 0,
                      class_weights[jnp.clip(tgt_val, 0, None)], 0.0)
        w = w * valid.astype(jnp.float32)
        loss = (loss.mean(axis=1) * w).sum() / jnp.maximum(w.sum(), 1e-12)
    else:
        loss = _masked_mean(loss.mean(axis=1), valid)
    # top-5 ids of the (mixup-merged) metric logits: all the MT5R meter
    # needs, accumulated on device so no per-step host readback happens
    top5 = jax.lax.top_k(preds[:, seq, :], min(5, C))[1]
    return loss, acc1, acc5, top5, labels


def past_action_loss(past_logits, past_target, mixup_enable, valid,
                     past_target_ignore_index=None):
    """Past-frame classification loss (reference runner.py:94-110)."""
    B = past_logits.shape[0]
    C = past_logits.shape[-1]
    if mixup_enable:
        # one-hot targets with explicit ignore mask; mean over kept rows
        ce = cross_entropy_one_hot(past_logits.reshape(-1, C),
                                   past_target.reshape(-1, C))
        keep = ~past_target_ignore_index.reshape(-1)
        keep = keep & jnp.repeat(valid, past_logits.shape[1])
        return _masked_mean(ce, keep)
    # index targets: zeros at ignored, mean over ALL elements
    # (torch reduction='none' then mean; reference _reduce_loss)
    tgt = past_target.reshape(B, -1)
    ce = cross_entropy_index(past_logits.reshape(-1, C), tgt.reshape(-1))
    ce = ce.reshape(B, -1)
    return _masked_mean(ce.mean(axis=1), valid)


def compute_losses_metrics(outputs: Dict, target: Dict,
                           target_subclips: Optional[Dict], *,
                           mixup_enable: bool = False,
                           target_subclips_ignore_index: Optional[Dict] = None,
                           valid: Optional[jnp.ndarray] = None,
                           class_weights: Optional[Dict] = None):
    """BasicLossAccuracy.forward equivalent (reference runner.py:112-168).

    ``class_weights`` optionally maps a target name to a (C,) per-class
    weight vector applied to that target's future-action CE (``cls_*``
    terms only — the past-frame loss keeps the reference's unweighted
    all-elements mean, whose ignore-in-denominator quirk does not compose
    with torch weighted-mean semantics).
    Returns (losses dict, metrics dict); mt5r payloads are dicts of device
    arrays to be consumed by the host-side MeanTopKRecallMeter.
    """
    losses, metrics = {}, {}
    some_logits = next(iter(outputs[f"logits/{next(iter(target))}"].values()))
    B = some_logits.shape[0]
    if valid is None:
        valid = jnp.ones((B,), bool)

    for tgt_type, tgt_val in target.items():
        cw = None if class_weights is None else class_weights.get(tgt_type)
        for modk, logits in outputs[f"logits/{tgt_type}"].items():
            loss, acc1, acc5, top5, m_labels = future_action_terms(
                logits, tgt_val, mixup_enable, valid, class_weights=cw)
            losses[f"cls_{tgt_type}_{modk}"] = loss
            metrics[f"acc1_{tgt_type}_{modk}"] = acc1
            metrics[f"acc5_{tgt_type}_{modk}"] = acc5
            metrics[f"mt5r_{tgt_type}_{modk}"] = {
                "top5": top5, "labels": m_labels, "valid": valid}

        past_key = f"{PAST_LOGITS_PREFIX}logits/{tgt_type}"
        if past_key in outputs and target_subclips is not None:
            for modk, past_logits in outputs[past_key].items():
                ignore = None if target_subclips_ignore_index is None else \
                    target_subclips_ignore_index[tgt_type]
                losses[f"past_cls_{tgt_type}_{modk}"] = past_action_loss(
                    past_logits, target_subclips[tgt_type], mixup_enable,
                    valid, ignore)

    # target-independent feature regression (reference computes it inside
    # the target loop, overwriting identical values; hoisted here)
    if "orig_past" in outputs and "past_futures" in outputs:
        for modk, updated in outputs["past_futures"].items():
            if modk not in outputs["orig_past"]:
                continue
            diff = (updated[:, 1:] - outputs["orig_past"][modk][:, 1:])
            per_sample = (diff ** 2).mean(axis=tuple(range(1, diff.ndim)))
            losses[f"past_reg_{modk}"] = _masked_mean(per_sample, valid)

    return losses, metrics


def get_loss_wts(loss_wts: Dict, key: str) -> float:
    """Prefix-matched loss weights (reference runner.py:171-175)."""
    for k, v in loss_wts.items():
        if key.startswith(k):
            return v
    raise ValueError(f"{key} not contained in predefined loss_wts: {loss_wts}")


def reduce_losses(losses: Dict, loss_wts: Dict):
    """Weighted sum of the (already scalar) losses
    (reference runner.py:198-213; the NaN guard runs host-side)."""
    total = 0.0
    for key, val in losses.items():
        wt = get_loss_wts(loss_wts, key)
        if wt > 0:
            total = total + wt * val
    return total

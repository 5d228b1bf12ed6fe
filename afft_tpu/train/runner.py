"""Jitted train/eval steps.

Behavioural reference: common/runner.py:178-270 plus the optimizer/scheduler
stepping in train.py:228-290 of the upstream repo. The whole iteration —
mixup, forward, losses, backward, optimizer update — traces into ONE XLA
program; the host only computes the schedule lr and feeds batches. Metric
payloads (including MT5R logits) come back as device arrays consumed by the
host-side MetricTracker.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import layers as L
from . import losses as LO
from .optim import Optimizer, apply_updates


def clip_by_global_norm(grads, max_norm):
    """torch.nn.utils.clip_grad_norm_ semantics."""
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


class Runner:
    """Owns the compiled steps for one model + optimizer configuration."""

    def __init__(self, model, optimizer: Optimizer, groups, loss_wts: Dict,
                 mixup=None, mixup_backbone: bool = True,
                 grad_clip: Optional[float] = None,
                 compute_dtype=jnp.float32, donate: bool = True):
        self.model = model
        self.optimizer = optimizer
        self.groups = groups
        self.loss_wts = dict(loss_wts)
        self.mixup = mixup
        self.mixup_backbone = mixup_backbone
        self.grad_clip = grad_clip
        self.compute_dtype = compute_dtype
        donate_argnums = (0, 1) if donate else ()
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=donate_argnums)
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _forward(self, params, batch, *, train, rng_key, use_mixup):
        data = {m: v.astype(self.compute_dtype)
                for m, v in batch["data_dict"].items()}
        target = batch["target"]
        target_subclips = batch.get("target_subclips")

        mixup_fn, ignore = None, None
        if use_mixup and self.mixup is not None and self.mixup_backbone:
            mix_key, rng_key = jax.random.split(rng_key)
            mixup_fn = functools.partial(self.mixup, mix_key)
        elif use_mixup and self.mixup is not None:
            # input-level mixup (reference runner.py:246-253)
            mix_key, rng_key = jax.random.split(rng_key)
            data, target, target_subclips, ignore = self.mixup(
                mix_key, data, target, target_subclips)

        rng = L.RngStream(rng_key) if train else None
        outputs, outputs_target = self.model.apply(
            params, data, target=target, target_subclips=target_subclips,
            target_subclips_ignore_index=ignore, mixup_fn=mixup_fn,
            train=train, rng=rng)
        return outputs, outputs_target

    def _losses(self, outputs, outputs_target, valid, mixup_enable):
        losses, metrics = LO.compute_losses_metrics(
            outputs, outputs_target["target"],
            outputs_target["target_subclips"],
            mixup_enable=mixup_enable,
            target_subclips_ignore_index=outputs_target[
                "target_subclips_ignore_index"],
            valid=valid)
        total = LO.reduce_losses(losses, self.loss_wts)
        return total, losses, metrics

    # ------------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, batch, lr_factor, rng_key):
        use_mixup = self.mixup is not None

        def loss_fn(p):
            outputs, outputs_target = self._forward(
                p, batch, train=True, rng_key=rng_key, use_mixup=use_mixup)
            total, losses, metrics = self._losses(
                outputs, outputs_target, batch.get("valid"), use_mixup)
            return total, (losses, metrics)

        (total, (losses, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if self.grad_clip is not None:
            grads = clip_by_global_norm(grads, self.grad_clip)
        opt_state, updates = self.optimizer.update(
            opt_state, grads, params, self.groups, lr_factor)
        params = apply_updates(params, updates)
        losses = dict(losses)
        losses["total_loss"] = total
        return params, opt_state, losses, metrics

    def _eval_step_impl(self, params, batch):
        outputs, outputs_target = self._forward(
            params, batch, train=False, rng_key=jax.random.key(0),
            use_mixup=False)
        total, losses, metrics = self._losses(
            outputs, outputs_target, batch.get("valid"), False)
        losses = dict(losses)
        losses["total_loss"] = total
        # fused/primary action logits for MT5R / h5 export
        logits_key = "logits/action"
        action_logits = None
        if logits_key in outputs:
            heads = outputs[logits_key]
            modk = "all-fused" if "all-fused" in heads else \
                next(iter(heads))
            action_logits = heads[modk][:, 0, :]
        return losses, metrics, action_logits

    # ------------------------------------------------------------------
    @staticmethod
    def _device_batch(batch):
        keep = {"data_dict", "target", "target_subclips", "valid"}
        return {k: v for k, v in batch.items() if k in keep}

    def train_step(self, params, opt_state, batch, lr: float, base_lr: float,
                   rng_key):
        lr_factor = jnp.asarray(lr / base_lr, jnp.float32)
        params, opt_state, losses, metrics = self._train_step(
            params, opt_state, self._device_batch(batch), lr_factor, rng_key)
        loss = float(losses["total_loss"])
        if np.isnan(loss):
            raise ValueError("The loss is NaN!")  # reference runner.py:209
        return params, opt_state, losses, metrics

    def eval_step(self, params, batch):
        return self._eval_step(params, self._device_batch(batch))


def metrics_to_host(losses, metrics):
    """Convert device metric payloads to the host types MetricTracker eats."""
    out = {}
    for k, v in losses.items():
        out[k] = float(v)
    for k, v in metrics.items():
        if isinstance(v, dict):
            out[k] = {kk: np.asarray(vv) for kk, vv in v.items()}
        else:
            out[k] = float(v)
    return out

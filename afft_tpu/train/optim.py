"""Optimizers and LR schedules with torch-equivalent semantics.

Behavioural reference: torch.optim.{SGD,Adam,AdamW} as configured by the
reference conf/opt/** plus common/scheduler.py (CosineLR with
world-size-scaled eta_min, per-iteration Warmup wrapper, WarmupMultiStepLR).

Design: per-leaf parameter groups replicate reference train.py:189-225
(``prepare_params``): a list of (module-path-prefix, lr, wd) rules maps onto
the params pytree; lr == 0 freezes the leaf (excluded from updates entirely).
Learning rates are computed on the host per iteration (pure function of the
step) and passed into the jitted update, so schedule changes never recompile.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# parameter groups
# ---------------------------------------------------------------------------

@dataclass
class GroupSpec:
    lr: float
    wd: float
    frozen: bool


def build_group_tree(params, lr_wd: Optional[List], overall_lr: float,
                     overall_wd: float):
    """Per-leaf GroupSpec tree from (prefix, lr, wd) rules
    (reference train.py:189-225). Prefixes use '.'-joined pytree paths;
    '__all__' matches everything."""
    rules = []
    for entry in (lr_wd or []):
        names, lr, wd = entry
        if not isinstance(names, (list, tuple)):
            names = [names]
        for n in names:
            rules.append((str(n), float(lr), float(wd)))

    from ..parallel.sharding import _path_str as path_str

    def spec_for(path, leaf):
        name = path_str(path)
        for prefix, lr, wd in rules:
            if prefix == "__all__" or name.startswith(prefix) \
                    or name.startswith(prefix.replace("model.", "")):
                return GroupSpec(lr, wd, frozen=(lr == 0.0))
        return GroupSpec(overall_lr, overall_wd, frozen=(overall_lr == 0.0))

    return jax.tree_util.tree_map_with_path(spec_for, params)


# ---------------------------------------------------------------------------
# optimizers (torch semantics)
# ---------------------------------------------------------------------------

class Optimizer:
    """(init, update) over a params pytree with per-leaf GroupSpecs.

    update(opt_state, grads, params, lr_factor) -> (new_state, updates);
    ``lr_factor`` scales every group's base lr (the schedule value divided by
    the base lr, mirroring torch schedulers rewriting param_group['lr'])."""

    def init(self, params, groups):
        raise NotImplementedError

    def update(self, state, grads, params, groups, lr_factor):
        raise NotImplementedError


class SGD(Optimizer):
    """torch.optim.SGD: grad += wd*p; buf = mu*buf + grad;
    d = grad + mu*buf (nesterov) else buf; p -= lr*d."""

    def __init__(self, momentum=0.0, nesterov=False, **_ignored):
        self.momentum = momentum
        self.nesterov = nesterov

    def init(self, params, groups):
        return {"momentum": jax.tree.map(jnp.zeros_like, params),
                "step": jnp.zeros((), jnp.int32)}

    def update(self, state, grads, params, groups, lr_factor):
        mu, nesterov = self.momentum, self.nesterov
        step = state["step"]

        def upd(g, p, buf, spec):
            if spec.frozen:
                return jnp.zeros_like(p), buf
            # mixed precision hands grads over in the compute dtype; the
            # momentum/update math stays in the master-param dtype
            g = g.astype(p.dtype) + spec.wd * p
            # torch initializes the buffer with the first grad, not zero
            buf = jnp.where(step == 0, g, mu * buf + g)
            d = g + mu * buf if nesterov else buf
            return -(spec.lr * lr_factor) * d, buf

        flat_specs = jax.tree.leaves(groups,
                                     is_leaf=lambda x: isinstance(x, GroupSpec))
        flat_g = jax.tree.leaves(grads)
        flat_p = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(state["momentum"])
        outs = [upd(g, p, b, s) for g, p, b, s in
                zip(flat_g, flat_p, flat_b, flat_specs)]
        treedef = jax.tree.structure(params)
        updates = jax.tree.unflatten(treedef, [o[0] for o in outs])
        new_buf = jax.tree.unflatten(treedef, [o[1] for o in outs])
        return {"momentum": new_buf, "step": step + 1}, updates


class Adam(Optimizer):
    """torch.optim.Adam (L2-coupled wd) / AdamW (decoupled)."""

    def __init__(self, betas=(0.9, 0.999), eps=1e-8, decoupled=False,
                 **_ignored):
        self.b1, self.b2 = betas
        self.eps = eps
        self.decoupled = decoupled

    def init(self, params, groups):
        return {"m": jax.tree.map(jnp.zeros_like, params),
                "v": jax.tree.map(jnp.zeros_like, params),
                "step": jnp.zeros((), jnp.int32)}

    def update(self, state, grads, params, groups, lr_factor):
        b1, b2, eps = self.b1, self.b2, self.eps
        t = state["step"] + 1
        bc1 = 1 - b1 ** t.astype(jnp.float32)
        bc2 = 1 - b2 ** t.astype(jnp.float32)

        def upd(g, p, m, v, spec):
            if spec.frozen:
                return jnp.zeros_like(p), m, v
            g = g.astype(p.dtype)
            lr = spec.lr * lr_factor
            if self.decoupled:
                decay = -lr * spec.wd * p
            else:
                g = g + spec.wd * p
                decay = 0.0
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * (g * g)
            upd_ = -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return upd_ + decay, m, v

        flat_specs = jax.tree.leaves(groups,
                                     is_leaf=lambda x: isinstance(x, GroupSpec))
        treedef = jax.tree.structure(params)
        outs = [upd(g, p, m, v, s) for g, p, m, v, s in zip(
            jax.tree.leaves(grads), jax.tree.leaves(params),
            jax.tree.leaves(state["m"]), jax.tree.leaves(state["v"]),
            flat_specs)]
        return ({"m": jax.tree.unflatten(treedef, [o[1] for o in outs]),
                 "v": jax.tree.unflatten(treedef, [o[2] for o in outs]),
                 "step": t},
                jax.tree.unflatten(treedef, [o[0] for o in outs]))


def sgd(momentum=0.9, nesterov=False, **kw):
    return SGD(momentum=momentum, nesterov=nesterov, **kw)


def adam(**kw):
    return Adam(decoupled=False, **kw)


def adamw(**kw):
    return Adam(decoupled=True, **kw)


def apply_updates(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


# ---------------------------------------------------------------------------
# schedules (host-side pure functions of the iteration)
# ---------------------------------------------------------------------------

def cosine_schedule(num_epochs, iters_per_epoch, world_size=1, eta_min=1e-6,
                    **_ignored) -> Callable[[int, float], float]:
    """CosineAnnealingLR with eta_min scaled by world size and zero lr past
    T_max (reference common/scheduler.py:57-75)."""
    T_max = num_epochs * iters_per_epoch
    eta = float(eta_min) * world_size

    def lr_at(k: int, base_lr: float) -> float:
        if k >= T_max:
            return 0.0
        return eta + (base_lr - eta) * (1 + math.cos(math.pi * k / T_max)) / 2

    # torch CosineAnnealingLR steps with a *chained* recursive formula, so
    # when the Warmup wrapper hands over, the cosine continues from the last
    # warmup lr rather than snapping back to base (telescoping the recursion
    # gives the closed form above anchored at the hand-over lr). Replicated
    # bug-for-bug from the reference's scheduler stack.
    lr_at.anchor_at_warmup_end = True
    return lr_at


def multistep_schedule(milestone_epochs=None, gamma=0.1, warmup_factor=1.0 / 3,
                       warmup_epochs=5, warmup_method="linear",
                       iters_per_epoch=None, world_size=None,
                       milestones=None, **_ignored):
    """WarmupMultiStepLR (reference common/scheduler.py:9-54).

    ``milestone_epochs`` is the reference's kwarg (passed per run, e.g.
    ``opt.scheduler.milestone_epochs=[30,40]``); ``milestones`` is accepted
    as a torch-style alias."""
    if milestone_epochs is None:
        milestone_epochs = milestones
    if milestone_epochs is None:
        raise ValueError(
            "opt/scheduler=multi_step needs milestone epochs, e.g. "
            "opt.scheduler.milestone_epochs=[30,40]")
    milestones = [iters_per_epoch * m for m in milestone_epochs]
    warmup_iters = max(warmup_epochs * iters_per_epoch, 1)

    def lr_at(k: int, base_lr: float) -> float:
        factor = 1.0
        if k < warmup_iters:
            if warmup_method == "constant":
                factor = warmup_factor
            else:
                alpha = k / warmup_iters
                factor = warmup_factor * (1 - alpha) + alpha
        return base_lr * factor * gamma ** bisect_right(milestones, k)

    return lr_at


class PlateauSchedule:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (the reference
    exposes it as a passthrough wrapper, common/scheduler.py:78-85, but its
    per-iteration ``scheduler.step()`` call in train.py:265 cannot feed it a
    metric — the reference path is dead code). Here the schedule is a
    callable like every other (iteration, base_lr) -> lr, plus an
    ``observe(metric)`` hook the train loop calls once per epoch with the
    primary validation metric.
    """

    def __init__(self, mode="min", factor=0.1, patience=10, threshold=1e-4,
                 threshold_mode="rel", cooldown=0, min_lr=0.0, eps=1e-8,
                 **_ignored):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        assert factor < 1.0, "factor should be < 1.0"
        self.mode, self.factor, self.patience = mode, factor, patience
        self.threshold, self.threshold_mode = threshold, threshold_mode
        self.cooldown, self.min_lr, self.eps = cooldown, min_lr, eps
        self.scale = 1.0
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, a):
        t = self.threshold
        if self.mode == "min":
            return a < self.best * (1.0 - t) if self.threshold_mode == "rel" \
                else a < self.best - t
        return a > self.best * (1.0 + t) if self.threshold_mode == "rel" \
            else a > self.best + t

    def observe(self, metric: float):
        """Epoch-end metric update — torch ReduceLROnPlateau.step(metric)."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.scale *= self.factor
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0

    def __call__(self, k: int, base_lr: float) -> float:
        # torch additionally skips reductions smaller than eps (1e-8 by
        # default) — only reachable after ~8 consecutive reductions at
        # factor 0.1; not modeled for the single multiplicative scale here
        return max(base_lr * self.scale, self.min_lr)

    def state_dict(self):
        return {k: getattr(self, k) for k in
                ("scale", "best", "num_bad_epochs", "cooldown_counter")}

    def load_state_dict(self, d):
        for k, v in d.items():
            setattr(self, k, v)


def plateau_schedule(mode="min", factor=0.1, patience=10, threshold=1e-4,
                     threshold_mode="rel", cooldown=0, min_lr=0.0, eps=1e-8,
                     iters_per_epoch=None, world_size=None, **_ignored):
    """ReduceLROnPlateau factory (reference common/scheduler.py:78-85)."""
    return PlateauSchedule(mode=mode, factor=factor, patience=patience,
                           threshold=threshold, threshold_mode=threshold_mode,
                           cooldown=cooldown, min_lr=min_lr, eps=eps)


def warmup_wrap(base_schedule, init_lr_ratio=0.0, num_epochs=5,
                iters_per_epoch=None, world_size=None, **_ignored):
    """Per-iteration linear warmup, then delegate
    (reference common/scheduler.py:88-136). The base schedule's counter
    starts at 1 on the first post-warmup iteration, matching the torch
    wrapper's step bookkeeping."""
    warmup_iters = max(num_epochs * iters_per_epoch, 1)
    ratio = init_lr_ratio if warmup_iters > 1 else 1.0
    anchor = getattr(base_schedule, "anchor_at_warmup_end", False)

    def lr_at(t: int, base_lr: float) -> float:
        if t < warmup_iters:
            return base_lr * (ratio + (1 - ratio) * (t / warmup_iters))
        if anchor:
            base_lr = base_lr * (ratio + (1 - ratio) *
                                 ((warmup_iters - 1) / warmup_iters))
        return base_schedule(t - warmup_iters + 1, base_lr)

    # metric-driven base schedules (ReduceLROnPlateau) surface their
    # epoch-end hook and resume state through the wrapper
    if hasattr(base_schedule, "observe"):
        lr_at.observe = base_schedule.observe
        lr_at.state_dict = base_schedule.state_dict
        lr_at.load_state_dict = base_schedule.load_state_dict
    return lr_at

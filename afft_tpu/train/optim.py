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


def _state_zeros(params, state_dtype):
    """Optimizer-state pytree of zeros. ``state_dtype`` (e.g. "bfloat16")
    stores the state buffers in a reduced dtype — an HBM-traffic knob for
    the bandwidth-bound update pass (DESIGN.md "Training-step bandwidth
    floor"); update math still runs in fp32."""
    if state_dtype is None:
        return jax.tree.map(jnp.zeros_like, params)
    dt = jnp.dtype(state_dtype)
    return jax.tree.map(
        lambda p: jnp.zeros(
            p.shape, dt if jnp.issubdtype(p.dtype, jnp.floating) else p.dtype),
        params)


class SGD(Optimizer):
    """torch.optim.SGD: grad += wd*p; buf = mu*buf + grad;
    d = grad + mu*buf (nesterov) else buf; p -= lr*d.

    Update math runs in fp32 regardless of grad/param/state dtypes
    (bit-identical to the previous master-dtype math for the default fp32
    master weights); ``state_dtype`` optionally stores the momentum buffer
    reduced (opt-in deviation from torch's fp32 state)."""

    def __init__(self, momentum=0.0, nesterov=False, state_dtype=None,
                 **_ignored):
        self.momentum = momentum
        self.nesterov = nesterov
        self.state_dtype = state_dtype

    def init(self, params, groups):
        return {"momentum": _state_zeros(params, self.state_dtype),
                "step": jnp.zeros((), jnp.int32)}

    def update(self, state, grads, params, groups, lr_factor):
        mu, nesterov = self.momentum, self.nesterov
        step = state["step"]

        def upd(g, p, buf, spec):
            if spec.frozen:
                return jnp.zeros_like(p, jnp.float32), buf
            g = g.astype(jnp.float32) + spec.wd * p.astype(jnp.float32)
            b = buf.astype(jnp.float32)
            # torch initializes the buffer with the first grad, not zero
            b = jnp.where(step == 0, g, mu * b + g)
            d = g + mu * b if nesterov else b
            return -(spec.lr * lr_factor) * d, b.astype(buf.dtype)

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
                 state_dtype=None, **_ignored):
        self.b1, self.b2 = betas
        self.eps = eps
        self.decoupled = decoupled
        self.state_dtype = state_dtype

    def init(self, params, groups):
        return {"m": _state_zeros(params, self.state_dtype),
                "v": _state_zeros(params, self.state_dtype),
                "step": jnp.zeros((), jnp.int32)}

    def update(self, state, grads, params, groups, lr_factor):
        b1, b2, eps = self.b1, self.b2, self.eps
        t = state["step"] + 1
        bc1 = 1 - b1 ** t.astype(jnp.float32)
        bc2 = 1 - b2 ** t.astype(jnp.float32)

        def upd(g, p, m, v, spec):
            if spec.frozen:
                return jnp.zeros_like(p, jnp.float32), m, v
            p32 = p.astype(jnp.float32)
            g = g.astype(jnp.float32)
            lr = spec.lr * lr_factor
            if self.decoupled:
                decay = -lr * spec.wd * p32
            else:
                g = g + spec.wd * p32
                decay = 0.0
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * (g * g)
            upd_ = -lr * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return upd_ + decay, m32.astype(m.dtype), v32.astype(v.dtype)

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


def stochastic_round_bf16(x, key):
    """Unbiased fp32 -> bf16 conversion.

    bf16 is the top 16 bits of fp32, so adding uniform random bits in
    [0, 2^16) to the low half and truncating rounds up with probability
    proportional to the discarded fraction (exactly-representable values
    pass through unchanged). This is the standard trick that makes bf16
    master weights trainable: round-to-nearest systematically loses
    updates smaller than half an ulp, stochastic rounding keeps them in
    expectation."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    return jax.lax.bitcast_convert_type(
        (bits + rnd) & jnp.uint32(0xFFFF0000), jnp.float32
    ).astype(jnp.bfloat16)


def apply_updates(params, updates, sr_key=None):
    """params + updates, preserving each param leaf's dtype.

    Updates arrive in fp32; the add runs in fp32. For reduced-dtype master
    params the writeback rounds stochastically when ``sr_key`` is given
    (unbiased — required for bf16 masters, where an lr*grad much smaller
    than the parameter would otherwise round to zero every step),
    deterministically otherwise."""
    leaves, treedef = jax.tree.flatten(params)
    upd_leaves = jax.tree.leaves(updates)
    out = []
    for i, (p, u) in enumerate(zip(leaves, upd_leaves)):
        new = p.astype(u.dtype) + u if p.dtype != u.dtype else p + u
        if new.dtype != p.dtype:
            if sr_key is not None and p.dtype == jnp.dtype(jnp.bfloat16):
                new = stochastic_round_bf16(new, jax.random.fold_in(sr_key, i))
            else:
                new = new.astype(p.dtype)
        out.append(new)
    return jax.tree.unflatten(treedef, out)


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

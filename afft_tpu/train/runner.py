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


def _global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def clip_by_global_norm(grads, max_norm):
    """torch.nn.utils.clip_grad_norm_ semantics."""
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


class Runner:
    """Owns the compiled steps for one model + optimizer configuration.

    Metric accumulation happens *inside* the jitted step: the step takes and
    returns an accumulator pytree (scalar sums, MT5R per-class tp/num), so
    an epoch issues exactly one fused program per batch and one readback at
    the end — no per-step host traffic and no trailing tiny dispatches.
    """

    def __init__(self, model, optimizer: Optimizer, groups, loss_wts: Dict,
                 mixup=None, mixup_backbone: bool = True,
                 grad_clip: Optional[float] = None,
                 compute_dtype=jnp.float32, donate: bool = True,
                 watch_gradients: bool = False,
                 class_weights: Optional[Dict] = None,
                 master_dtype=jnp.float32, param_shardings=None,
                 grad_accum: int = 1):
        self.model = model
        self.optimizer = optimizer
        self.groups = groups
        self.loss_wts = dict(loss_wts)
        # per-target (C,) loss weights for the future-action CE (effective-
        # number class balancing, afft_tpu.data.stats); training only — the
        # eval loss keeps the reference's unweighted value for comparability
        self.class_weights = None if not class_weights else {
            t: jnp.asarray(w, jnp.float32) for t, w in class_weights.items()}
        self.mixup = mixup
        self.mixup_backbone = mixup_backbone
        self.grad_clip = grad_clip
        self.compute_dtype = jnp.dtype(compute_dtype)
        self._mixed = self.compute_dtype != jnp.dtype(jnp.float32)
        # train.master_dtype=bfloat16: the master weights ARE the compute
        # copy — no params_c, half the param/grad HBM traffic in the
        # bandwidth-bound update pass, stochastically-rounded writebacks
        # (apply_updates) so sub-ulp updates survive in expectation.
        # Opt-in deviation from the reference's torch fp32 optimizer state.
        self.master_dtype = jnp.dtype(master_dtype)
        self._master_low = self._mixed and \
            self.master_dtype == self.compute_dtype
        self.watch_gradients = watch_gradients
        # pytree of NamedShardings to pin the UPDATED params to (ZeRO-1:
        # optimizer state is data-sharded, so without this constraint
        # GSPMD propagates the shard through apply_updates onto the
        # returned params — every later forward would all-gather weights
        # on demand, ZeRO-3-style, instead of one gather at the update)
        self.param_shardings = param_shardings
        # train.grad_accum=M: the global batch splits into M sequential
        # microbatches inside the SAME jitted step (lax.scan), grads
        # average in fp32, ONE optimizer update applies. Peak activation
        # memory drops ~M x; batch_size keeps its reference (global)
        # meaning. Semantics caveats (documented, tested): dropout/mixup
        # draw per-microbatch (mixup pairs form within a microbatch), and
        # loss terms with their own denominators (past-CE ignore masks,
        # ragged valid) combine as microbatch means weighted by valid
        # count — exact for the standard all-valid case.
        self.grad_accum = int(grad_accum or 1)
        assert self.grad_accum >= 1
        donate_argnums = (0, 1, 5) if donate else ()
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=donate_argnums)
        self._eval_step = jax.jit(self._eval_step_impl,
                                  donate_argnums=(2,) if donate else ())

    # -- in-step metric accumulator -------------------------------------
    def _num_classes_for(self, metric_name: str) -> int:
        num_classes = self.model.future_predictor.num_classes
        found = None
        for t, c in num_classes.items():
            if t in metric_name:
                found = c
        assert found is not None, metric_name
        return found

    def _accumulate(self, accum, losses, metrics, valid):
        """In-trace accumulation; structure is derived from the first step's
        losses/metrics (accum=None), then threaded through the epoch."""
        n = valid.sum().astype(jnp.float32)
        scalar_vals = {k: v for k, v in {**losses, **metrics}.items()
                       if not isinstance(v, dict)}
        payloads = {k: v for k, v in metrics.items() if isinstance(v, dict)}
        if accum is None:
            accum = {
                "scalars": {k: jnp.zeros((), jnp.float32)
                            for k in scalar_vals},
                "count": jnp.zeros((), jnp.float32),
                "mt5r": {k: {
                    "tps": jnp.zeros((self._num_classes_for(k),),
                                     jnp.float32),
                    "nums": jnp.zeros((self._num_classes_for(k),),
                                      jnp.float32)} for k in payloads},
            }
        scalars = {k: accum["scalars"][k] + v.astype(jnp.float32) * n
                   for k, v in scalar_vals.items()}
        mt5r = {}
        for key, payload in payloads.items():
            top5 = payload["top5"]
            labels = payload["labels"].reshape(-1)
            v = payload["valid"].reshape(-1)
            tp = (top5 == labels[:, None]).any(axis=-1) & v
            mt5r[key] = {
                "tps": accum["mt5r"][key]["tps"].at[labels].add(
                    tp.astype(jnp.float32)),
                "nums": accum["mt5r"][key]["nums"].at[labels].add(
                    v.astype(jnp.float32)),
            }
        return {"scalars": scalars, "count": accum["count"] + n,
                "mt5r": mt5r}

    @staticmethod
    def absorb_accum(metric_tracker, accum, is_training: bool):
        """One epoch-end readback into the host MetricTracker meters."""
        if accum is None:
            return
        host = jax.device_get(accum)
        count = float(host["count"])
        if count == 0:
            return
        metrics = metric_tracker._metrics(is_training)
        prefix = "train_" if is_training else "val_"
        for key, total in host["scalars"].items():
            name = prefix + key
            if name not in metrics:
                metric_tracker.add_metric(name, is_training)
            meter = metrics[name]
            meter.sum = float(meter.sum) + float(total)
            meter.count += count
        for key, state in host["mt5r"].items():
            name = prefix + key
            if name not in metrics:
                metric_tracker.add_metric(name, is_training)
            meter = metrics[name]
            meter.tps = np.asarray(meter.tps) + np.asarray(state["tps"])
            meter.nums = np.asarray(meter.nums) + np.asarray(state["nums"])

    # ------------------------------------------------------------------
    def _cast_params(self, params):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    def _forward(self, params, batch, *, train, rng_key, use_mixup,
                 already_cast=False):
        if self._mixed and not already_cast:
            # mixed precision: fp32 master params, reduced-precision compute.
            # The TRAIN step passes pre-cast params (kept in opt_state and
            # refreshed inside the fused optimizer pass — saves a full
            # 388M-param cast round trip per step); eval casts here.
            params = self._cast_params(params)
        data = {m: v.astype(self.compute_dtype)
                for m, v in batch["data_dict"].items()}
        target = batch["target"]
        target_subclips = batch.get("target_subclips")

        mixup_fn, ignore = None, None
        valid = batch.get("valid")
        # parity-injection hook: batch["mixup_lam"] pins the Beta draw so a
        # torch-reference trajectory can be replayed exactly
        # (tools/export_train_trajectory.py / tests/test_trajectory.py)
        lam = batch.get("mixup_lam")
        if use_mixup and self.mixup is not None and self.mixup_backbone:
            mix_key, rng_key = jax.random.split(rng_key)
            mixup_fn = functools.partial(self.mixup.mix, lam, valid=valid) \
                if lam is not None \
                else functools.partial(self.mixup, mix_key, valid=valid)
        elif use_mixup and self.mixup is not None:
            # input-level mixup (reference runner.py:246-253)
            mix_key, rng_key = jax.random.split(rng_key)
            if lam is not None:
                data, target, target_subclips, ignore = self.mixup.mix(
                    lam, data, target, target_subclips, valid=valid)
            else:
                data, target, target_subclips, ignore = self.mixup(
                    mix_key, data, target, target_subclips, valid=valid)

        rng = L.RngStream(rng_key) if train else None
        outputs, outputs_target = self.model.apply(
            params, data, target=target, target_subclips=target_subclips,
            target_subclips_ignore_index=ignore, mixup_fn=mixup_fn,
            train=train, rng=rng)
        return outputs, outputs_target

    def _losses(self, outputs, outputs_target, valid, mixup_enable,
                train=True):
        losses, metrics = LO.compute_losses_metrics(
            outputs, outputs_target["target"],
            outputs_target["target_subclips"],
            mixup_enable=mixup_enable,
            target_subclips_ignore_index=outputs_target[
                "target_subclips_ignore_index"],
            valid=valid,
            class_weights=self.class_weights if train else None)
        total = LO.reduce_losses(losses, self.loss_wts)
        return total, losses, metrics

    # ------------------------------------------------------------------
    def _loss_grads(self, wrt, batch, rng_key, use_mixup):
        def loss_fn(p):
            outputs, outputs_target = self._forward(
                p, batch, train=True, rng_key=rng_key, use_mixup=use_mixup,
                already_cast=self._mixed)
            total, losses, metrics = self._losses(
                outputs, outputs_target, batch.get("valid"), use_mixup)
            return total, (losses, metrics)

        return jax.value_and_grad(loss_fn, has_aux=True)(wrt)

    def _accum_loss_grads(self, wrt, batch, rng_key, use_mixup):
        """grad_accum>1: scan M microbatches, combine grads AND scalar
        losses/metrics in fp32 weighted by per-micro valid counts (each
        microbatch loss is a mean over its own valid rows, so the full-
        batch gradient is sum(n_i * g_i) / sum(n_i) — uniform 1/M would
        overweight the sparsely-valid padded tail microbatch of an
        epoch's final batch by ~M x), restitch metric payloads to
        full-batch shape.

        Exactness caveat: the n_i weighting reproduces the full-batch
        update exactly only for loss terms whose denominator IS the valid
        count. The class-weighted future-CE (losses.py class_weights path)
        normalizes by the per-microbatch class-weight sum W_i instead, so
        with ``class_weights`` set, grad_accum approximates the full-batch
        update (error ~ the spread of mean class weight across
        microbatches — small under shuffled sampling). Exact combination
        would need a per-TERM denominator decomposition of the gradient;
        not worth it for a class-balancing heuristic that is itself
        beyond-reference. Regression-tested in
        test_integration.test_grad_accum_with_class_weights_close."""
        M = self.grad_accum
        B = batch["valid"].shape[0]
        assert B % M == 0, \
            f"train.grad_accum={M} must divide the global batch {B}"
        micro = jax.tree.map(
            lambda x: x.reshape(M, B // M, *x.shape[1:]), batch)
        # one independent base key per microbatch; the outer fold keeps the
        # per-micro streams disjoint from the step's own rng_key uses
        # (mixup split, RngStream site folds, the sr_key sentinel)
        base = jax.random.fold_in(rng_key, 0x6ACC)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(M))

        def body(gsum, xs):
            mb, key = xs
            (t, (ls, ms)), g = self._loss_grads(wrt, mb, key, use_mixup)
            n = mb["valid"].sum().astype(jnp.float32)
            # n-weighted accumulation; an all-padding microbatch (n=0)
            # contributes nothing (its grads are finite: every loss
            # denominator is clamped, losses.py)
            gsum = jax.tree.map(lambda a, b: a + n * b.astype(jnp.float32),
                                gsum, g)
            return gsum, (t, ls, ms, n)

        g0 = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), wrt)
        gsum, (totals, losses_s, metrics_s, ns) = jax.lax.scan(
            body, g0, (micro, keys))
        w = ns / jnp.maximum(ns.sum(), 1.0)
        wmean = lambda v: (v.astype(jnp.float32) * w).sum()
        total = wmean(totals)
        losses = {k: wmean(v) for k, v in losses_s.items()}
        metrics = {}
        for k, v in metrics_s.items():
            if isinstance(v, dict):  # mt5r payload: back to full-batch rows
                metrics[k] = {kk: vv.reshape(B, *vv.shape[2:])
                              for kk, vv in v.items()}
            else:
                metrics[k] = wmean(v)
        denom = jnp.maximum(ns.sum(), 1.0)
        grads = jax.tree.map(lambda g, p: (g / denom).astype(p.dtype),
                             gsum, wrt)
        return (total, (losses, metrics)), grads

    def _train_step_impl(self, params, opt_state, batch, lr_factor, rng_key,
                         accum):
        use_mixup = self.mixup is not None
        if batch.get("valid") is None:
            batch = dict(batch)
            batch["valid"] = jnp.ones(
                (next(iter(batch["target"].values())).shape[0],), bool)
        # mixed precision: differentiate wrt the persistent compute-dtype
        # copy (opt_state["params_c"]) instead of casting the fp32 master
        # inside the loss — grads flow back in the compute dtype (half the
        # grad HBM traffic) and the per-step 388M-param cast pass vanishes
        # (the copy is refreshed inside the fused optimizer update below)
        wrt = params if self._master_low else (
            opt_state["params_c"] if self._mixed else params)

        if self.grad_accum > 1:
            (total, (losses, metrics)), grads = self._accum_loss_grads(
                wrt, batch, rng_key, use_mixup)
        else:
            (total, (losses, metrics)), grads = self._loss_grads(
                wrt, batch, rng_key, use_mixup)
        if self.watch_gradients:
            # reference wandb.watch(model) equivalent (train.py:416): the
            # TPU-idiomatic form is in-step norm scalars fused into the
            # train program (per-parameter histograms would force per-leaf
            # host readbacks every step), reported through the same metric
            # stream as everything else
            metrics = dict(metrics)
            metrics["grad_norm"] = _global_norm(grads)
            metrics["param_norm"] = _global_norm(params)
            if isinstance(grads, dict):
                for key, sub in grads.items():
                    metrics[f"grad_norm_{key}"] = _global_norm(sub)
        if self.grad_clip is not None:
            grads = clip_by_global_norm(grads, self.grad_clip)
        opt_in = {k: v for k, v in opt_state.items() if k != "params_c"}
        opt_out, updates = self.optimizer.update(
            opt_in, grads, params, self.groups, lr_factor)
        # large sentinel fold: RngStream draws fold_in(rng_key, 0..N) for
        # the dropout sites, so a small constant here would collide with a
        # mask key and correlate rounding noise with a dropout mask
        sr_key = jax.random.fold_in(rng_key, 0x5A7E57A6) \
            if self._master_low else None
        params = apply_updates(params, updates, sr_key=sr_key)
        if self.param_shardings is not None:
            params = jax.lax.with_sharding_constraint(params,
                                                      self.param_shardings)
        if self._mixed and not self._master_low:
            # XLA fuses this cast into the update's elementwise pass (same
            # per-leaf fusion group), so the copy costs only its write
            opt_out = dict(opt_out)
            opt_out["params_c"] = self._cast_params(params)
        opt_state = opt_out
        losses = dict(losses)
        losses["total_loss"] = total
        # batch["valid"] is synthesized unconditionally at the top of this
        # function, so no None fallback is needed here
        accum = self._accumulate(accum, losses, metrics, batch["valid"])
        return params, opt_state, losses, metrics, accum

    def _eval_step_impl(self, params, batch, accum):
        outputs, outputs_target = self._forward(
            params, batch, train=False, rng_key=jax.random.key(0),
            use_mixup=False)
        total, losses, metrics = self._losses(
            outputs, outputs_target, batch.get("valid"), False, train=False)
        losses = dict(losses)
        losses["total_loss"] = total
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones((next(iter(batch["target"].values())).shape[0],),
                             bool)
        accum = self._accumulate(accum, losses, metrics, valid)
        # fused/primary action logits for MT5R / h5 export
        logits_key = "logits/action"
        action_logits = None
        if logits_key in outputs:
            heads = outputs[logits_key]
            modk = "all-fused" if "all-fused" in heads else \
                next(iter(heads))
            action_logits = heads[modk][:, 0, :]
        return losses, metrics, action_logits, accum

    # ------------------------------------------------------------------
    @staticmethod
    def _device_batch(batch):
        keep = {"data_dict", "target", "target_subclips", "valid",
                "mixup_lam"}
        return {k: v for k, v in batch.items() if k in keep}

    def train_step(self, params, opt_state, batch, lr: float, base_lr: float,
                   rng_key, check_nan: bool = False, accum=None):
        """One jitted iteration. Losses/metrics come back as device values:
        nothing is read to the host unless ``check_nan`` (callers sample it
        periodically — a per-step readback would serialize the pipeline on
        the host link; the reference's guard is per-step, runner.py:209)."""
        lr_factor = jnp.asarray(lr / base_lr, jnp.float32)
        if self._mixed and not self._master_low \
                and "params_c" not in opt_state:
            # first step (or resume from a checkpoint, which strips the
            # derived copy): seed the persistent compute-dtype params
            opt_state = {**opt_state, "params_c": self._cast_params(params)}
        params, opt_state, losses, metrics, accum = self._train_step(
            params, opt_state, self._device_batch(batch), lr_factor, rng_key,
            accum)
        if check_nan and np.isnan(float(losses["total_loss"])):
            raise ValueError("The loss is NaN!")
        return params, opt_state, losses, metrics, accum

    def eval_step(self, params, batch, accum=None):
        return self._eval_step(params, self._device_batch(batch), accum)


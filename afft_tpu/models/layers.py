"""Functional parameter-pytree primitives.

Every module here is a pair of pure functions: ``*_init(rng, ...) -> params``
and ``*_apply(params, x, ...) -> y`` over nested dicts of jnp arrays. This is
the TPU-native replacement for the reference's ``nn.Module`` stack: the whole
train/eval step traces into a single XLA program, parameters shard as one
pytree under pjit, and there is no framework graph state.

Numerics deliberately match the PyTorch reference so fp32 logits agree:
biased-variance LayerNorm, exact-erf GELU for fuser MLPs
(reference models/transformerblock.py:80 ``nn.GELU``), tanh "gelu_new" for the
GPT-2 future predictor, torch-style dropout scaling.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# rng streams
# ---------------------------------------------------------------------------

class RngStream:
    """Deterministic stream of rng keys derived from one base key."""

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._count = 0

    def next(self) -> jax.Array:
        assert self._key is not None, "rng required (train=True path)"
        k = jax.random.fold_in(self._key, self._count)
        self._count += 1
        return k


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal_init(rng, shape, std=0.02, dtype=jnp.float32):
    """timm trunc_normal_(std=.02): N(0, std) truncated at absolute +-2.

    At std=0.02 the bounds are +-100 sigma, so a plain normal is exact in
    practice (reference models/fusion.py:21-27).
    """
    return (jax.random.normal(rng, shape, dtype) * std).astype(dtype)


def torch_linear_init(rng, in_dim, out_dim, bias=True, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weight,
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on bias. Weight stored (in, out)."""
    k_w, k_b = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k_b, (out_dim,), dtype, -bound, bound)
    return p


def normal_linear_init(rng, in_dim, out_dim, std=0.02, bias=True,
                       dtype=jnp.float32):
    """GPT-2 style init: N(0, std) weight, zero bias."""
    p = {"w": trunc_normal_init(rng, (in_dim, out_dim), std, dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def fuser_linear_init(rng, in_dim, out_dim, bias=True, dtype=jnp.float32):
    """Fuser init: trunc_normal(0.02) weight, zero bias
    (reference models/fusion.py:21-27 applied via ``self.apply``)."""
    p = {"w": trunc_normal_init(rng, (in_dim, out_dim), 0.02, dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


# ---------------------------------------------------------------------------
# linear / layernorm / embedding
# ---------------------------------------------------------------------------

def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def layernorm_init(dim, affine=True, dtype=jnp.float32):
    if not affine:
        return {}
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def layernorm_apply(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if "g" in p:
        y = y * p["g"] + p["b"]
    return y


def embedding_init(rng, num, dim, std=1.0, dtype=jnp.float32):
    """torch.nn.Embedding default init is N(0, 1)."""
    return {"w": jax.random.normal(rng, (num, dim), dtype) * std}


def embedding_apply(p, ids):
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def gelu_exact(x):
    """torch nn.GELU default (erf formulation)."""
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x):
    """HF GPT-2 'gelu_new' (tanh approximation)."""
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
    "gelu_new": gelu_new,
    "none": lambda x: x,
}


# ---------------------------------------------------------------------------
# dropout / droppath
# ---------------------------------------------------------------------------

def dropout(x, rate, train, rng: Optional[RngStream]):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng.next(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x, rate, train, rng: Optional[RngStream]):
    """Stochastic depth, per sample (reference models/transformerblock.py:96)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng.next(), shape, x.dtype))
    return x / keep * mask


def neg_inf_causal_mask(sz: int, dtype=jnp.float32):
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference models/fusion.py:30-32)."""
    return jnp.triu(jnp.full((sz, sz), -jnp.inf, dtype), k=1)


def cross_attention_diag_mask(sz: int, dtype=jnp.float32):
    """-inf on the diagonal (mask own modality; reference models/fusion.py:81-84)."""
    return jnp.where(jnp.eye(sz, dtype=bool), -jnp.inf, 0.0).astype(dtype)

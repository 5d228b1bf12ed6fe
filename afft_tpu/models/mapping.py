"""Feature-mapping layers: project per-modality features to a common dim.

Behavioural reference: models/feature_mapping.py in the upstream repo
(Linear :54-78, GatedLinear :32-51, NonLinear :91-111, ContextGating :21-29,
GatedEmbeddingUnit :9-18). Each class carries static config and exposes
``init(rng) -> params`` / ``apply(params, x) -> y``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


class _Mapping:
    def init(self, rng):
        raise NotImplementedError

    def apply(self, params, x):
        raise NotImplementedError

    def __call__(self, params, x):
        return self.apply(params, x)


class LinearMapping(_Mapping):
    """Bias-free linear projection; identity when dims match and
    ``sparse_mapping`` is set (reference models/feature_mapping.py:54-78)."""

    def __init__(self, in_features, out_features, use_layernorm=False,
                 sparse_mapping=True):
        self.in_features = in_features
        self.out_features = out_features
        self.use_layernorm = use_layernorm
        self.identity = sparse_mapping and in_features == out_features

    def init(self, rng):
        p = {}
        if not self.identity:
            p["fc"] = L.torch_linear_init(rng, self.in_features,
                                          self.out_features, bias=False)
        if self.use_layernorm:
            p["ln"] = L.layernorm_init(self.out_features)
        return p

    def apply(self, params, x):
        if not self.identity:
            x = L.linear_apply(params["fc"], x)
        if self.use_layernorm:
            x = L.layernorm_apply(params["ln"], x, eps=1e-6)
        return x


def _context_gating_init(rng, dim):
    return {"fc": L.torch_linear_init(rng, dim, dim, bias=True)}


def _context_gating_apply(p, x):
    # glu(cat(x, fc(x))) == x * sigmoid(fc(x))
    return x * jax.nn.sigmoid(L.linear_apply(p["fc"], x))


class GatedLinearMapping(_Mapping):
    """Linear + context gating (+ optional LN), reference :32-51."""

    def __init__(self, in_features, out_features, use_layernorm=True):
        self.in_features = in_features
        self.out_features = out_features
        self.use_layernorm = use_layernorm

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        p = {
            "fc": L.torch_linear_init(k1, self.in_features, self.out_features),
            "cg": _context_gating_init(k2, self.out_features),
        }
        if self.use_layernorm:
            p["ln"] = L.layernorm_init(self.out_features)
        return p

    def apply(self, params, x):
        x = L.linear_apply(params["fc"], x)
        x = _context_gating_apply(params["cg"], x)
        if self.use_layernorm:
            x = L.layernorm_apply(params["ln"], x, eps=1e-6)
        return x


class NonLinearMapping(_Mapping):
    """Linear + activation (+ optional LN), reference :91-111."""

    def __init__(self, in_features, out_features, use_layernorm=True,
                 activation="relu"):
        assert activation in ("relu", "gelu", "none"), activation
        self.in_features = in_features
        self.out_features = out_features
        self.use_layernorm = use_layernorm
        self.activation = activation

    def init(self, rng):
        p = {"fc": L.torch_linear_init(rng, self.in_features,
                                       self.out_features)}
        if self.use_layernorm:
            p["ln"] = L.layernorm_init(self.out_features)
        return p

    def apply(self, params, x):
        x = L.ACTIVATIONS[self.activation](L.linear_apply(params["fc"], x))
        if self.use_layernorm:
            x = L.layernorm_apply(params["ln"], x, eps=1e-6)
        return x


class GatedEmbeddingUnit(_Mapping):
    """Linear + context gating, no LN (reference :9-18; unused by shipped
    configs but part of the public surface)."""

    def __init__(self, in_features=None, out_features=None,
                 input_dimension=None, output_dimension=None):
        self.in_features = in_features or input_dimension
        self.out_features = out_features or output_dimension

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "fc": L.torch_linear_init(k1, self.in_features, self.out_features),
            "cg": _context_gating_init(k2, self.out_features),
        }

    def apply(self, params, x):
        x = L.linear_apply(params["fc"], x)
        return _context_gating_apply(params["cg"], x)

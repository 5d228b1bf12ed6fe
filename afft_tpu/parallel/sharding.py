"""Parameter sharding rules for model parallelism.

The flagship model (~390M params) fits on one chip, so data-parallel is the
default (SURVEY §2.5: the reference's only strategy is DDP). For larger
variants or small-chip pools, these rules add Megatron-style tensor
parallelism over a ``model`` mesh axis without touching model code: params
are placed with NamedShardings by path pattern and GSPMD partitions the
matmuls (column-parallel first projection, row-parallel second, sharded
classifier vocab) and inserts the reduce-scatters/all-reduces.

Usage:
    mesh = make_mesh_2d(dp, tp)                       # axes ('data','model')
    params = shard_params(mesh, params, TP_RULES)
    batch  = shard_batch(mesh, batch)                 # 'data' axis
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins; default = replicated.
# Paths are '.'-joined pytree keys, e.g.
#   future_predictor.classifiers.action.shared.w
#   future_predictor.future_predictor.shared.blocks.0.c_fc.w
TP_RULES: List[Tuple[str, P]] = [
    # classifier heads: shard the class dim (3806 actions)
    (r".*classifiers\..*\.w$", P(None, "model")),
    (r".*classifiers\..*\.b$", P("model")),
    # GPT-2 MLP: column-parallel c_fc, row-parallel mlp_c_proj
    (r".*blocks\.\d+\.c_fc\.w$", P(None, "model")),
    (r".*blocks\.\d+\.c_fc\.b$", P("model")),
    (r".*blocks\.\d+\.mlp_c_proj\.w$", P("model", None)),
    # GPT-2 attention: qkv column-parallel (heads split), proj row-parallel
    (r".*blocks\.\d+\.c_attn\.w$", P(None, "model")),
    (r".*blocks\.\d+\.c_attn\.b$", P("model")),
    (r".*blocks\.\d+\.c_proj\.w$", P("model", None)),
    # fuser MLPs: column/row parallel
    (r".*\.mlp\.fc1\.w$", P(None, "model")),
    (r".*\.mlp\.fc1\.b$", P("model")),
    (r".*\.mlp\.fc2\.w$", P("model", None)),
]


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, \
        f"need {dp * tp} devices, have {len(devices)}"
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def make_mesh_3d(dp: int, tp: int, pp: int, devices=None) -> Mesh:
    """(data, pipe, model) mesh: DP replicas x GPipe stages x tensor
    parallelism. The model axis is innermost so the per-matmul TP
    collectives (the most bandwidth-hungry) ride neighbouring ICI links;
    pipe hops (one ppermute per microbatch tick) ride the next ring out;
    the DP gradient all-reduce (once per step) crosses the outer axis."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * pp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, pp, tp)
    return Mesh(arr, ("data", "pipe", "model"))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def spec_for_path(path: str, rules=TP_RULES) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def shard_opt_state(mesh: Mesh, opt_state, rules=TP_RULES,
                    data_axis: str = "data"):
    """ZeRO-1-style placement of optimizer state over the data axis.

    Optimizer state (SGD momentum / Adam m,v) is only touched by the
    per-parameter update, so unlike params it never needs to be whole on
    any chip: each leaf additionally shards its first evenly-divisible,
    not-already-sharded dimension over ``data_axis``. GSPMD then turns
    the DP gradient all-reduce + sharded update + replicated apply into
    reduce-scatter -> local update -> all-gather — the ZeRO-1 collective
    pattern (Rajbhandari et al. 2020) — cutting per-chip optimizer-state
    HBM by ~dp×. Leaves with no divisible dim (scalars, tiny test dims)
    stay replicated; TP rules still apply to the matching param paths so
    ZeRO composes with tensor parallelism on a 2-D mesh.

    Beyond-reference capability (the reference's DDP replicates optimizer
    state on every GPU); enable with ``train.zero_sharding=true``.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = axis_sizes.get(data_axis, 1)
    has_tp = "model" in axis_sizes and axis_sizes["model"] > 1

    def place(path, leaf):
        pstr = _path_str(path)
        # state trees namespace param paths under e.g. 'momentum.'/'m.'/'v.'
        base = spec_for_path(pstr.split(".", 1)[-1], rules) if has_tp else P()
        spec = list(base) + [None] * (np.ndim(leaf) - len(base))
        ok = all(
            axis is None or (dim < np.ndim(leaf)
                             and leaf.shape[dim] % axis_sizes[axis] == 0)
            for dim, axis in enumerate(spec))
        if not ok:
            spec = [None] * np.ndim(leaf)
        if dp > 1:
            for dim in range(np.ndim(leaf)):
                if spec[dim] is None and leaf.shape[dim] % dp == 0 \
                        and leaf.shape[dim] > 0:
                    spec[dim] = data_axis
                    break
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map_with_path(place, opt_state)


class SeqCtx:
    """Megatron-style sequence parallelism over the ``model`` mesh axis.

    Injected into a model's deep block stacks (``predictor.seq_ctx``) the
    same way as :class:`~afft_tpu.parallel.pipeline.PipelineCtx`. The
    residual stream (B, T, C) is pinned T-sharded over the model axis at
    block boundaries via ``with_sharding_constraint``; combined with the
    TP_RULES weight shardings GSPMD derives the Megatron-SP collective
    pattern (Korthikanti et al. 2022): all-gather over T entering each
    column-parallel matmul, reduce-scatter leaving each row-parallel one —
    so the LayerNorms, dropouts, and residual adds between them compute on
    1/tp of the tokens and their activations occupy 1/tp of the HBM.

    Beyond-reference capability (the reference's only strategy is DDP,
    train.py:364-368); pays off at raw-video/long-context T where the
    replicated residual stream dominates activation memory.
    """

    def __init__(self, mesh: Mesh, axis: str = "model",
                 data_axis: str = "data"):
        for a in (axis, data_axis):
            assert a in mesh.axis_names, \
                f"mesh {mesh.axis_names} has no '{a}' axis (SeqCtx needs " \
                f"both the sequence axis and the batch axis)"
        self.mesh = mesh
        self.axis = axis
        self.data_axis = data_axis
        self._warned = False

    def constrain(self, x):
        """Pin a (..., T, C) activation T-sharded over the model axis.

        Leading dims ride the data axis (batch). If T does not divide
        over the axis the constraint is skipped — SP silently off would
        defeat the activation-memory savings the user enabled it for, so
        the first skip warns (once; constrain runs at trace time)."""
        sp_size = self.mesh.shape[self.axis]
        if x.shape[-2] % sp_size != 0:
            if not self._warned:
                self._warned = True
                import warnings
                warnings.warn(
                    f"sequence parallelism disabled for this stack: "
                    f"T={x.shape[-2]} does not divide over "
                    f"{self.axis}={sp_size}; activations stay replicated "
                    f"over the model axis", stacklevel=2)
            return x
        spec = [self.data_axis] + [None] * (x.ndim - 3) + [self.axis, None]
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec)))


def shard_params(mesh: Mesh, params, rules=TP_RULES):
    """Place params on the mesh per the rules (replicated by default).

    A spec is applied only when the dimension divides evenly over the axis;
    otherwise the leaf stays replicated (e.g. tiny test dims)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def place(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= np.ndim(leaf) or \
                    leaf.shape[dim] % axis_sizes[axis] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)

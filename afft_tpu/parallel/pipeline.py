"""GPipe-style pipeline parallelism for homogeneous block stacks.

The two deep stacks in this framework — the fuser blocks
(models/fusion.py) and the GPT-2 predictor blocks (models/predictor.py)
— are homogeneous: L identical-shape per-layer param pytrees applied in
sequence. That is exactly the structure pipeline parallelism wants:
shard the LAYER dimension over a ``pipe`` mesh axis (S stages hold L/S
consecutive layers each), split the batch into M microbatches, and run
the classic GPipe schedule — M + S - 1 ticks where stage s processes
microbatch t - s at tick t, activations hopping stage-to-stage over ICI
via ``lax.ppermute``.

TPU-native design notes:
- the whole schedule is ONE ``lax.scan`` inside ``shard_map`` — no
  Python-level per-tick dispatch, one compiled program, collectives ride
  the ICI ring;
- every stage computes on every tick (the pipeline bubble does throwaway
  work instead of branching — XLA-friendly, no data-dependent control
  flow); validity is handled by where/OOB-drop indexing, so bubble
  garbage never contaminates outputs;
- reverse-mode differentiable end to end (scan/ppermute/where all have
  transposes), so the same primitive serves training;
- the flagship (~390M params, 6+6 layers) fits one chip and ships with
  DP/TP/ZeRO-1; this primitive is the scaling path for deeper variants
  where a single stage no longer fits (enable via ``pipeline_blocks`` on
  a mesh with a ``pipe`` axis).

The reference has no equivalent (its only strategy is DDP,
reference train.py:364-368); beyond-reference capability.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_layer_params(layer_params_list):
    """[{...} per layer] -> one pytree with leading layer dim L (the
    layout ``pipeline_blocks`` shards over the pipe axis). Host (numpy)
    trees stack on host: resume restacks GiB-scale checkpoint state and
    must not materialize it in device HBM before placement."""
    def _stack(*xs):
        xp = np if all(isinstance(x, np.ndarray) for x in xs) else jnp
        return xp.stack(xs, axis=0)
    return jax.tree.map(_stack, *layer_params_list)


def stack_predictor_blocks(tree):
    """Natively-stacked predictor storage (``train.pipeline_stages>1``).

    Every GPT-2 predictor subtree — identified by its ``blocks`` +
    ``wpe`` keys, so fuser block lists are untouched — gets its per-layer
    ``blocks`` list stacked into one leading-layer-dim pytree. The GPipe
    schedule (``pipeline_blocks``) then consumes the storage layout
    directly: without this, every pipelined step re-stacked the layer list
    inside the jitted program (and its VJP sliced the gradients back),
    paying one extra HBM read+write of the predictor weights per step.
    Applies to params and, because the momentum tree mirrors the param
    structure, to optimizer state. Checkpoints stay canonical (layer
    lists): the loop unstacks on save and restacks on resume."""
    def walk(t):
        if isinstance(t, dict):
            out = {k: walk(v) for k, v in t.items()}
            if "wpe" in out and isinstance(out.get("blocks"), (list, tuple)):
                out["blocks"] = stack_layer_params(list(out["blocks"]))
            return out
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v) for v in t)
        return t
    return walk(tree)


def check_uniform_layer_groups(group_tree):
    """Guard for stacked predictor storage: stacking folds every layer
    into one leaf, so a per-layer ``opt.lr_wd`` rule (e.g. freezing
    ``...blocks.0``) could no longer match its '.blocks.<i>.' path and
    would silently train that layer at the overall lr. Raise loudly
    instead. Call with the GroupSpec tree built on the CANONICAL
    (per-layer-list) params before stacking."""
    bad = []

    def walk(t, path):
        if isinstance(t, dict):
            if "wpe" in t and isinstance(t.get("blocks"), (list, tuple)):
                blocks = t["blocks"]
                first = jax.tree.leaves(blocks[0])
                for i, layer in enumerate(blocks[1:], 1):
                    if jax.tree.leaves(layer) != first:
                        bad.append(f"{path}.blocks[{i}]" if path
                                   else f"blocks[{i}]")
            for k, v in t.items():
                walk(v, f"{path}.{k}" if path else str(k))
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk(v, f"{path}[{i}]")

    walk(group_tree, "")
    if bad:
        raise ValueError(
            "opt.lr_wd assigns different lr/wd groups to individual "
            f"predictor layers ({', '.join(bad)}), which is inexpressible "
            "under the stacked predictor storage used when "
            "train.pipeline_stages>1 — drop the per-layer rule or train "
            "without pipeline parallelism.")


def unstack_predictor_blocks(tree):
    """Inverse of ``stack_predictor_blocks`` — back to the canonical
    per-layer-list layout (checkpoints, torch export, non-pipelined
    resume). Works on device or host (numpy) trees."""
    def walk(t):
        if isinstance(t, dict):
            out = {k: walk(v) for k, v in t.items()}
            if "wpe" in out and isinstance(out.get("blocks"), dict):
                stacked = out["blocks"]
                n = int(jax.tree.leaves(stacked)[0].shape[0])
                out["blocks"] = [
                    jax.tree.map(lambda a, i=i: a[i], stacked)
                    for i in range(n)]
            return out
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v) for v in t)
        return t
    return walk(tree)


def pipeline_blocks(block_fn, stacked_params, x, mesh: Mesh,
                    microbatches: int, axis: str = "pipe",
                    block_takes_micro_index: bool = False):
    """Apply L stacked layers to x (B, ...) over S pipeline stages.

    block_fn(layer_params, h) -> h   (one layer, shape-preserving)
    stacked_params: pytree with leading dim L (L % S == 0)
    x: (B, ...) with B % microbatches == 0

    Returns the same value as sequentially applying the L layers,
    replicated over the pipe axis. Stage-local layers run under
    ``lax.scan``; per-layer randomness should be pre-split and stacked
    into ``stacked_params`` by the caller. For train-mode dropout set
    ``block_takes_micro_index=True``: block_fn(p, h, m) receives the
    microbatch index m to fold into its keys — masks are drawn per
    microbatch shape, so decorrelating them across microbatches needs m
    (the sequential full-batch masks cannot be reproduced under ANY
    pipelining; what is reproducible — and tested — is the per-
    microbatch application).
    """
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    B = x.shape[0]
    M = microbatches
    assert L % S == 0, f"layers {L} must divide over {S} stages"
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"

    micro = x.reshape(M, B // M, *x.shape[1:])
    treedef = jax.tree.structure(stacked_params)
    run = _pipeline_schedule(block_fn, mesh, axis, S, M,
                             block_takes_micro_index, treedef)
    out = run(stacked_params, micro)
    return out.reshape(B, *x.shape[1:])


def _pipeline_schedule(block_fn, mesh, axis, S, M,
                       block_takes_micro_index, treedef):
    """Build the jitted GPipe schedule for one static config.

    A partially-manual shard_map (axis_names a strict subset of the mesh
    axes) only lowers under jit — called eagerly it rejects out_specs over
    the auto axes, and that includes 'eager' jax.grad / jax.vmap tracing
    (tracer-typed args do NOT imply a surrounding jit). So the schedule is
    ALWAYS wrapped in its own jit: under the trainer's jitted step the
    nested jit is traced inline at compile time (no runtime cost); eager
    callers (parity tests, notebooks) get a working compiled path.

    Deliberately NOT cached: callers (predictor._forward_pipelined) build
    ``block_fn`` as a fresh closure per forward — the closure captures the
    model and the attention mask, which can be a live tracer under an
    outer trace, so any identity-keyed cache both never hits and retains
    tracers (JAX_CHECK_TRACER_LEAKS errors). Eager callers therefore
    recompile per call; the only perf-relevant caller is the jitted train
    step, where jit's own trace cache already amortizes this."""
    pspec = jax.tree_util.tree_unflatten(
        treedef, [P(axis)] * treedef.num_leaves)

    # map over the pipe axis only: on a multi-axis mesh (e.g. data x pipe
    # inside the sharded train step) the other axes stay "auto", so the
    # batch keeps its outer data-sharding and GSPMD partitions the stage
    # compute over data as usual — pipeline composes with DP/ZeRO for free
    @partial(shard_map, mesh=mesh, axis_names=frozenset({axis}),
             in_specs=(pspec, P()), out_specs=P(),
             check_vma=False)
    def run(p_local, micro_all):
        s = lax.axis_index(axis)

        def stage_layers(h, m):
            def body(h, p_i):
                if block_takes_micro_index:
                    return block_fn(p_i, h, m), None
                return block_fn(p_i, h), None
            h, _ = lax.scan(body, h, p_local)
            return h

        perm = [(i, (i + 1) % S) for i in range(S)]
        outs0 = jnp.zeros_like(micro_all)

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t (clamped; bubble ticks feed
            # garbage that is never collected), others take the hop-in
            inject = micro_all[jnp.clip(t, 0, M - 1)]
            h_in = jnp.where(s == 0, inject, buf)
            # stage s processes microbatch t - s at tick t (bubble ticks
            # clamp to a valid id; their output is never collected)
            h_out = stage_layers(h_in, jnp.clip(t - s, 0, M - 1))
            # collect: stage S-1 finished microbatch t - (S - 1) this tick.
            # Bubble ticks write garbage at a wrapped/dropped index, but
            # every slot's CORRECT write comes later in the scan (slot k is
            # written at tick k + S - 1, after any tick-t<S-1 wrap into it),
            # so plain overwrite semantics make the final buffer right; the
            # psum below discards every stage's buffer except S-1's.
            outs = outs.at[t - (S - 1)].set(h_out, mode="drop")
            buf = lax.ppermute(h_out, axis, perm)
            return (buf, outs), None

        (_, outs), _ = lax.scan(tick, (jnp.zeros_like(micro_all[0]), outs0),
                                jnp.arange(M + S - 1))
        # replicate the last stage's collected outputs to every stage
        outs = lax.psum(jnp.where(s == S - 1, outs, jnp.zeros_like(outs)),
                        axis)
        return outs

    return jax.jit(run)


def make_mesh_pipe(stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= stages
    return Mesh(np.asarray(devices[:stages]), ("pipe",))


def make_mesh_data_pipe(stages: int, devices=None) -> Mesh:
    """(data, pipe) mesh using every device: DP over hosts/replicas x
    GPipe stages. Consecutive devices form a stage group so the
    per-microbatch ppermute hops ride neighbouring ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % stages == 0, \
        f"pipeline_stages={stages} must divide device count {n}"
    arr = np.asarray(devices).reshape(n // stages, stages)
    return Mesh(arr, ("data", "pipe"))


class PipelineCtx:
    """Trainer-side handle injected into a model's deep block stacks
    (``predictor.pipeline_ctx``) when ``train.pipeline_stages > 1``."""

    def __init__(self, mesh: Mesh, microbatches: int, axis: str = "pipe"):
        assert axis in mesh.axis_names, \
            f"mesh {mesh.axis_names} has no '{axis}' axis"
        self.mesh = mesh
        self.microbatches = int(microbatches)
        self.axis = axis

    @property
    def stages(self) -> int:
        return int(dict(zip(self.mesh.axis_names,
                            self.mesh.devices.shape))[self.axis])

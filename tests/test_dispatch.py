"""Kernel-DISPATCH guards: the serving/training fast paths must actually
engage at the flagship operating points.

The kernel-equality tests (tests/test_ops*.py, tools/tpu_smoke.py) prove
the Pallas kernels compute the right thing; nothing so far pinned that the
trace-time dispatch predicates (`use_fused_*` / `supported`) still SELECT
them at the shapes the benchmarks run. A regression there (a tile
constant, a VMEM bound, a dtype check) would silently fall back to the
XLA op-by-op path — ~35% slower serving (DESIGN.md) — with every
correctness test green. These tests fail loudly instead.

Two layers:
  1. predicate-level: `supported(...)` at the exact flagship shapes, plus
     the documented MUST-fall-back cases (ragged rows wedge Mosaic; fp32
     GPT-2 and long temporal contexts oversubscribe VMEM);
  2. program-level: trace the full flagship serving forward abstractly
     (jax.eval_shape params + ShapeDtypeStruct features, with the TPU
     backend gate monkeypatched on) and count the pallas_call equations
     XLA will receive — 6 fused fuser blocks + 6 GPT-2 layers x 2 halves.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from afft_tpu.ops import pallas_block as PB  # noqa: E402
from afft_tpu.ops import pallas_block_train as PBT  # noqa: E402
from afft_tpu.ops import pallas_gpt2 as PG  # noqa: E402
from afft_tpu.ops import pallas_gpt2_train as PGT  # noqa: E402
from afft_tpu.ops import pallas_seq_block as PS  # noqa: E402

# the flagship operating points the perf claims are measured at
# (bench.py: serving B=256, train B=64, T=16; SA-Fuser 4 modalities + token
# -> n=5 tokens at C=1024/4 heads/MLP 4096; GPT-2 n_embd=2048, inner 8192)
B_SERVE, B_TRAIN, T = 256, 64, 16
N_TOK, C, HEADS, MLP = 5, 1024, 4, 4096
G_C, G_HEADS, G_MLP = 2048, 4, 8192


def test_serving_predicates_at_flagship_shapes():
    bf16 = jnp.bfloat16
    # SA-Fuser fused block: rows = B*T, tokens-major serving layout
    assert PB.supported(N_TOK, C, HEADS, MLP, n_rows=B_SERVE * T, dtype=bf16)
    # GPT-2 two-kernel halves at the flagship batch
    assert PG.supported(B_SERVE, T, G_C, G_HEADS, G_MLP, dtype=bf16)
    # T-SA-Fuser (expt-03: seq = n*T = 64) and CA-Fuser (expt-04: per-stream
    # seq = T) whole-block kernels
    assert PS.supported(B_SERVE, 4 * T, C, HEADS, MLP, dtype=bf16)
    assert PS.supported(B_SERVE, T, C, HEADS, MLP, dtype=bf16)


def test_train_predicates_at_flagship_shapes():
    bf16 = jnp.bfloat16
    assert PBT.supported(N_TOK, C, HEADS, MLP, n_rows=B_TRAIN * T,
                         dtype=bf16)
    assert PGT.supported(B_TRAIN, T, G_C, G_HEADS, G_MLP, dtype=bf16)
    # ...and at the measured best operating point B=256
    assert PBT.supported(N_TOK, C, HEADS, MLP, n_rows=256 * T, dtype=bf16)
    assert PGT.supported(256, T, G_C, G_HEADS, G_MLP, dtype=bf16)


def test_documented_fallbacks_stay_fallbacks():
    """The cases DESIGN.md commits to XLA must NOT dispatch to Pallas:
    ragged row counts wedge the Mosaic pipeline (partial grid tiles), and
    the fp32 / long-context GPT-2 halves oversubscribe VMEM."""
    bf16 = jnp.bfloat16
    # B=1 clip (R = 16 rows): the observed-wedge case
    assert not PB.supported(N_TOK, C, HEADS, MLP, n_rows=1 * T, dtype=bf16)
    # fp32 GPT-2: MLP-half weights alone are 134 MB
    assert not PG.supported(B_SERVE, T, G_C, G_HEADS, G_MLP,
                            dtype=jnp.float32)
    # long temporal context grows the hidden tile past the VMEM budget
    assert not PG.supported(B_SERVE, 40, G_C, G_HEADS, G_MLP, dtype=bf16)
    # ragged batch -> whole-tile gate
    assert not PG.supported(B_SERVE - 1, T, G_C, G_HEADS, G_MLP, dtype=bf16)
    # SA-Fuser site is NOT the seq kernel's (seq <= 8 there)
    assert not PS.supported(B_SERVE, N_TOK, C, HEADS, MLP, dtype=bf16)


def _count_pallas_calls(jaxpr):
    """Count pallas_call equations through nested call primitives (the
    fused kernels are jax.jit-wrapped, so each call site is a pjit eqn
    referencing a shared sub-jaxpr — string-counting undercounts)."""
    import jax.extend as jex

    def walk(jx):
        n = 0
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                n += 1
            for v in eqn.params.values():
                if isinstance(v, jex.core.ClosedJaxpr):
                    n += walk(v.jaxpr)
                elif hasattr(v, "eqns"):  # raw Jaxpr
                    n += walk(v)
                elif isinstance(v, (list, tuple)):
                    n += sum(walk(w.jaxpr if isinstance(
                        w, jex.core.ClosedJaxpr) else w)
                        for w in v if isinstance(w, jex.core.ClosedJaxpr)
                        or hasattr(w, "eqns"))
        return n

    return walk(jaxpr.jaxpr)


def test_flagship_serving_program_contains_all_fused_kernels(monkeypatch):
    """Trace the EXACT bench_end_to_end forward (flagship 4-modal SA-Fuser,
    bf16 params, B=256/T=16 features) with the backend gate forced on and
    count the pallas_call equations: 6 fuser blocks (one whole-block kernel
    each) + 6 GPT-2 layers x 2 half kernels = 18. Fewer means a dispatch
    predicate regressed and serving silently fell back to the XLA path."""
    from afft_tpu.ops import attention as A
    monkeypatch.setattr(A, "pallas_enabled", lambda: True)

    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024",
        "model.fuser.depth=6",
        "model.common.fp_layers=6",
    ])
    model = BaseModel(cfg.model, num_classes={"action": 3806})
    params = jax.eval_shape(model.init, jax.random.key(0))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), params)
    feats = {m: jax.ShapeDtypeStruct((B_SERVE, T, d), jnp.bfloat16)
             for m, d in cfg.model.modal_dims.items()}

    def fwd(p, f):
        outputs, _ = model.apply(p, f, train=False)
        return outputs["logits/action"]["all-fused"][:, 0, :]

    n_kernels = _count_pallas_calls(jax.make_jaxpr(fwd)(params, feats))
    assert n_kernels == 18, (
        f"flagship serving program has {n_kernels} pallas_call eqns, "
        f"expected 18 (6 fuser blocks + 6 GPT-2 layers x 2 halves) — "
        f"a dispatch predicate regressed to the XLA fallback")


@pytest.mark.parametrize("fuser_ovr, expected", [
    # T-SA (expt-03): 6 whole-block seq kernels + 6 GPT-2 layers x 2
    (["model/fuser=T-SA-Fuser", "model.fuser.depth=6",
      "model.fuser.num_heads=4"], 18),
    # CA (expt-04): depth = num_modalities - 1 = 3 fused decoder blocks
    # + 6 GPT-2 layers x 2
    (["model/fuser=CA-Fuser", "model.fuser.num_heads=4"], 15),
])
def test_temporal_fuser_serving_programs_engage_seq_kernels(
        monkeypatch, fuser_ovr, expected):
    """The expt-03/04 serving compositions must dispatch to the fused
    seq/decoder kernels (pallas_seq_block: T-SA 1.43x / CA 1.36x isolated
    vs XLA, SEQFUSER_r04.json)."""
    from afft_tpu.ops import attention as A
    monkeypatch.setattr(A, "pallas_enabled", lambda: True)

    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024",
        "model.common.fp_layers=6",
    ] + fuser_ovr)
    model = BaseModel(cfg.model, num_classes={"action": 3806})
    params = jax.eval_shape(model.init, jax.random.key(0))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), params)
    feats = {m: jax.ShapeDtypeStruct((B_SERVE, T, d), jnp.bfloat16)
             for m, d in cfg.model.modal_dims.items()}

    def fwd(p, f):
        outputs, _ = model.apply(p, f, train=False)
        return outputs["logits/action"]["all-fused"][:, 0, :]

    n_kernels = _count_pallas_calls(jax.make_jaxpr(fwd)(params, feats))
    assert n_kernels == expected, (
        f"{fuser_ovr[0]} serving program has {n_kernels} pallas_call "
        f"eqns, expected {expected}")


def test_flagship_train_program_contains_all_fused_kernels(monkeypatch):
    """Same guard for the TRAINING fast path at the flagship B=64 point
    (a silent fallback costs ~25% step time: fuser stack 31.15 ms XLA vs
    19.07 ms fused, DESIGN.md). Differentiating the train-mode forward
    must produce 6 fuser blocks x (1 fwd + 2 custom-VJP bwd kernels)
    + 6 GPT-2 layers x (2 fwd halves + 3 bwd kernels) = 48 pallas_calls
    (the dW matmuls are deliberately XLA)."""
    from afft_tpu.models import layers as L
    from afft_tpu.ops import attention as A
    monkeypatch.setattr(A, "pallas_enabled", lambda: True)

    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, objects:352, audio:1024, flow:1024}",
        "model.common_dim=1024",
        "model.fuser.depth=6",
        "model.common.fp_layers=6",
    ])
    model = BaseModel(cfg.model, num_classes={"action": 3806})
    params = jax.eval_shape(model.init, jax.random.key(0))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), params)
    feats = {m: jax.ShapeDtypeStruct((B_TRAIN, T, d), jnp.bfloat16)
             for m, d in cfg.model.modal_dims.items()}

    def loss_fn(p, f, key):
        outputs, _ = model.apply(p, f, train=True, rng=L.RngStream(key))
        return jnp.mean(
            outputs["logits/action"]["all-fused"].astype(jnp.float32))

    n_kernels = _count_pallas_calls(
        jax.make_jaxpr(jax.grad(loss_fn))(params, feats, jax.random.key(0)))
    assert n_kernels == 48, (
        f"flagship train fwd+bwd program has {n_kernels} pallas_call eqns, "
        f"expected 48 (6 fuser x (1+2) + 6 GPT-2 x (2+3)) — a train "
        f"dispatch predicate or custom VJP regressed to the XLA fallback")


def test_serving_program_all_xla_when_disabled(monkeypatch):
    """AFFT_DISABLE_PALLAS / non-TPU backends must produce a pure-XLA
    program (no pallas_call smuggled past the shared gate)."""
    from afft_tpu.ops import attention as A
    monkeypatch.setattr(A, "pallas_enabled", lambda: False)

    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:1024, flow:1024}",
        "model.common_dim=1024",
        "model.fuser.depth=2",
        "model.common.fp_layers=2",
    ])
    model = BaseModel(cfg.model, num_classes={"action": 106})
    params = jax.eval_shape(model.init, jax.random.key(0))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), params)
    feats = {m: jax.ShapeDtypeStruct((B_SERVE, T, d), jnp.bfloat16)
             for m, d in cfg.model.modal_dims.items()}

    def fwd(p, f):
        outputs, _ = model.apply(p, f, train=False)
        return outputs["logits/action"]["all-fused"][:, 0, :]

    assert _count_pallas_calls(jax.make_jaxpr(fwd)(params, feats)) == 0

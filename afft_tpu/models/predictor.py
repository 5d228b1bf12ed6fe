"""Causal future predictor (AVT-style GPT-2 over feature embeddings).

Behavioural reference: models/future_prediction.py:354-415 in the upstream
repo, which wraps a HuggingFace ``GPT2Model`` (wte deleted, fed with
``inputs_embeds``). Re-implemented natively with exact GPT-2 numerics:
learned position embeddings, pre-LN (eps 1e-5), packed qkv with bias,
1/sqrt(head_dim) scaling, causal masking, "gelu_new" MLP, final ln_f, and
GPT-2's depth-scaled init for the residual projections.

``fp_output_len == 1`` (every shipped config) is a single full causal pass —
the reference's KV-cache loop degenerates to the same thing. For longer
rollouts each extra step feeds the last hidden state back as the next input
embedding, reproducing reference :396-412.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from ..ops import attention as _attention_ops


class BaseFuturePredictor:
    def __init__(self, in_features, inter_dim=2048, n_layer=6, n_head=4,
                 embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1,
                 output_attentions=False, dimension_mapping=False,
                 n_positions=1024, **_ignored):
        assert not dimension_mapping, \
            "dimension mapping inside the predictor is deprecated " \
            "(reference models/future_prediction.py:366)"
        self.in_features = in_features
        self.n_embd = inter_dim
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_inner = 4 * inter_dim
        self.embd_pdrop = embd_pdrop
        self.resid_pdrop = resid_pdrop
        self.attn_pdrop = attn_pdrop
        # MUST be a real bool: a truthy junk value (e.g. a yaml scalar that
        # swallowed an inline comment) silently forces the
        # collect-attention path — no fused kernels, no KV-cache rollout —
        # a ~2x serving regression that nothing else would catch
        if not isinstance(output_attentions, bool):
            raise TypeError(
                f"output_attentions must be a bool, got "
                f"{output_attentions!r} — check "
                f"model.common.fp_output_attentions in the config")
        self.output_attentions = output_attentions
        self.n_positions = n_positions
        # set by the trainer when train.pipeline_stages > 1: routes the
        # block stack through parallel/pipeline.py's GPipe schedule over
        # the mesh's "pipe" axis (see PipelineCtx)
        self.pipeline_ctx = None
        # set by the trainer for sequence parallelism on a 2-D mesh: the
        # residual stream is pinned T-sharded over the "model" axis at
        # block boundaries (see parallel.sharding.SeqCtx)
        self.seq_ctx = None

    def init(self, rng):
        std = 0.02
        proj_std = std / math.sqrt(2 * self.n_layer)
        keys = jax.random.split(rng, self.n_layer + 1)
        blocks = []
        for k in keys[:-1]:
            k1, k2, k3, k4 = jax.random.split(k, 4)
            blocks.append({
                "ln_1": L.layernorm_init(self.n_embd),
                "c_attn": L.normal_linear_init(k1, self.n_embd,
                                               3 * self.n_embd, std),
                "c_proj": L.normal_linear_init(k2, self.n_embd, self.n_embd,
                                               proj_std),
                "ln_2": L.layernorm_init(self.n_embd),
                "c_fc": L.normal_linear_init(k3, self.n_embd, self.n_inner,
                                             std),
                "mlp_c_proj": L.normal_linear_init(k4, self.n_inner,
                                                   self.n_embd, proj_std),
            })
        return {
            "wpe": L.trunc_normal_init(keys[-1], (self.n_positions,
                                                  self.n_embd), std),
            "blocks": blocks,
            "ln_f": L.layernorm_init(self.n_embd),
        }

    @staticmethod
    def block_list(params):
        """Per-layer views of the block params. Canonical storage is a
        list of per-layer dicts; under ``train.pipeline_stages>1`` the
        loop stores the blocks natively stacked (leading layer dim, see
        parallel.pipeline.stack_predictor_blocks) and the sequential
        paths slice per-layer views here (XLA fuses the slices — no
        copy materializes)."""
        blocks = params["blocks"]
        if isinstance(blocks, dict):
            n = int(jax.tree_util.tree_leaves(blocks)[0].shape[0])
            return [jax.tree.map(lambda a, i=i: a[i], blocks)
                    for i in range(n)]
        return blocks

    def _block(self, p, x, mask, *, train, rng, collect_attn):
        Bsz, T, C = x.shape
        h = L.layernorm_apply(p["ln_1"], x, 1e-5)
        qkv = L.linear_apply(p["c_attn"], h)
        # c_attn packs heads-major [h0:(q,k,v), h1:(q,k,v), ...] (NOT the HF
        # [q|k|v] order — the torch importer re-interleaves): slicing the
        # packed dim over a tensor-parallel mesh axis is then head-aligned,
        # so GSPMD partitions the attention by head instead of all-gathering
        # the qkv activations (see parallel/sharding.py TP_RULES)
        qkv = qkv.reshape(Bsz, T, self.n_head, 3, C // self.n_head)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        attn_out, attn_w = _attention_ops.multihead_attention(
            q, k, v, mask=mask, attn_drop=self.attn_pdrop, train=train,
            rng=rng, return_weights=collect_attn)
        attn_out = L.linear_apply(p["c_proj"], attn_out.reshape(Bsz, T, C))
        attn_out = L.dropout(attn_out, self.resid_pdrop, train, rng)
        x = x + attn_out
        h = L.layernorm_apply(p["ln_2"], x, 1e-5)
        h = L.gelu_new(L.linear_apply(p["c_fc"], h))
        h = L.linear_apply(p["mlp_c_proj"], h)
        h = L.dropout(h, self.resid_pdrop, train, rng)
        return x + h, attn_w

    def forward_hidden(self, params, embeds, position_ids, *, train=False,
                       rng: Optional[L.RngStream] = None, collect_attn=False):
        """One full causal pass: embeds (B, T, C) -> last hidden (B, T, C)."""
        T = embeds.shape[1]
        mask = L.neg_inf_causal_mask(T, embeds.dtype)
        x = embeds + jnp.take(params["wpe"], position_ids, axis=0)
        x = L.dropout(x, self.embd_pdrop, train, rng)
        if self.seq_ctx is not None and not collect_attn:
            # sequence parallelism: the fused single-device kernels and the
            # pipeline schedule don't apply; the plain XLA block stack with
            # T-sharded boundary constraints lets GSPMD insert the
            # Megatron-SP all-gather/reduce-scatter pattern
            assert self.pipeline_ctx is None, \
                "seq_ctx and pipeline_ctx are mutually exclusive"
            x = self.seq_ctx.constrain(x)
            for p in self.block_list(params):
                x, _ = self._block(p, x, mask, train=train, rng=rng,
                                   collect_attn=False)
                x = self.seq_ctx.constrain(x)
            return L.layernorm_apply(params["ln_f"], x, 1e-5), None
        if self.pipeline_ctx is not None and not collect_attn:
            # GPipe over the mesh "pipe" axis (train.pipeline_stages):
            # the block stack becomes one scanned shard_map schedule;
            # microbatch dropout keys ride the stacked params (a stateful
            # stream can't thread through lax.scan)
            x = self._forward_pipelined(params, x, mask, train=train,
                                        rng=rng)
            return L.layernorm_apply(params["ln_f"], x, 1e-5), None
        from ..ops import pallas_gpt2 as PG
        from ..ops import pallas_gpt2_train as PGT
        if (train and not collect_attn
                and PGT.use_fused_gpt2_train(x, self.n_head, self.n_inner,
                                             rng)):
            # training fast path: per layer, two fwd kernels with in-kernel
            # PRNG dropout and a custom VJP whose backward is three Pallas
            # kernels (dx chains + mask regeneration) plus XLA dW matmuls
            seeds = jax.random.randint(rng.next(), (2,), 0, 2 ** 31 - 1,
                                       dtype=jnp.int32)
            for li, p in enumerate(self.block_list(params)):
                x = PGT.fused_gpt2_block_train(
                    x, p, mask, seeds, num_heads=self.n_head, layer_idx=li,
                    attn_rate=self.attn_pdrop, resid_rate=self.resid_pdrop,
                    eps=1e-5)
            x = L.layernorm_apply(params["ln_f"], x, 1e-5)
            return x, None
        if (not train and not collect_attn
                and PG.use_fused_gpt2(x, self.n_head, self.n_inner)):
            # inference fast path: each layer = two Pallas kernels (attn
            # half + MLP half) with no XLA ops in between; weights per
            # half stay VMEM-resident across the batch grid
            for p in self.block_list(params):
                x = PG.fused_gpt2_block(x, p, mask, num_heads=self.n_head,
                                        eps=1e-5)
            x = L.layernorm_apply(params["ln_f"], x, 1e-5)
            return x, None
        attns = []
        for p in self.block_list(params):
            x, w = self._block(p, x, mask, train=train, rng=rng,
                               collect_attn=collect_attn)
            if collect_attn:
                attns.append(w)
        x = L.layernorm_apply(params["ln_f"], x, 1e-5)
        return x, (jnp.stack(attns, axis=1) if collect_attn else None)

    def _forward_pipelined(self, params, x, mask, *, train, rng):
        """Block stack via the GPipe schedule (parallel/pipeline.py).

        Train-mode dropout keys are pre-split per layer and STACKED into
        the scanned params, with the microbatch index folded in inside
        block_fn — the per-microbatch mask semantics pinned by
        tests/test_pipeline.py::test_pipeline_train_mode_dropout.

        The loop stores predictor blocks natively stacked when
        ``train.pipeline_stages>1`` (parallel.pipeline.
        stack_predictor_blocks), so the schedule consumes the storage
        layout directly — no per-step re-stack of the layer list (which
        cost one extra HBM read+write of the predictor weights, plus the
        VJP's gradient re-slice). A canonical layer-list still works
        (stacked on the fly) for ad-hoc callers."""
        from ..parallel.pipeline import pipeline_blocks, stack_layer_params

        ctx = self.pipeline_ctx
        blocks = params["blocks"]
        stacked = blocks if isinstance(blocks, dict) \
            else stack_layer_params(blocks)
        keyed = train and rng is not None and \
            (self.attn_pdrop > 0 or self.resid_pdrop > 0)
        if keyed:
            layer_keys = jax.random.split(rng.next(), self.n_layer)
            stacked = {"block": stacked, "rng": layer_keys}

            def block_fn(p, h, m):
                r = L.RngStream(jax.random.fold_in(p["rng"], m))
                return self._block(p["block"], h, mask, train=True, rng=r,
                                   collect_attn=False)[0]
        else:
            def block_fn(p, h):
                return self._block(p, h, mask, train=train, rng=None,
                                   collect_attn=False)[0]
        return pipeline_blocks(block_fn, stacked, x, ctx.mesh,
                               microbatches=ctx.microbatches, axis=ctx.axis,
                               block_takes_micro_index=keyed)

    # -- KV-cache decode (multi-step rollouts) ---------------------------
    def _block_cached(self, p, x, kc, vc, pos):
        """One block over new tokens x (B, S, C) with THIS layer's
        preallocated (B, Tmax, H, hd) k/v caches; writes this step's k/v
        at ``pos``.

        Per-layer cache arrays (not one (B, L, Tmax, 2, H, hd) monolith):
        measured in the full flagship serving graph the monolithic layout
        costs ~17 ms per cached decode step at B=256 — XLA stops
        in-place-updating the 226 MB buffer once the surrounding graph is
        big enough and every layer's dynamic_update_slice turns into a
        full-cache copy. The 19 MB per-layer buffers alias reliably:
        same rollout measures ~4 ms/step (KVROLLOUT_r03.json, both)."""
        Bsz, S, C = x.shape
        hd = C // self.n_head
        h = L.layernorm_apply(p["ln_1"], x, 1e-5)
        qkv = L.linear_apply(p["c_attn"], h).reshape(
            Bsz, S, self.n_head, 3, hd)  # heads-major packing, see _block
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        kc = jax.lax.dynamic_update_slice(kc, k, (0, pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, pos, 0, 0))
        # mask future/unwritten cache slots
        Tmax = kc.shape[1]
        key_pos = jnp.arange(Tmax)[None, :]
        query_pos = pos + jnp.arange(S)[:, None]
        mask = jnp.where(key_pos <= query_pos, 0.0, -jnp.inf)
        attn_out, _ = _attention_ops.multihead_attention(
            q, kc, vc, mask=mask, return_weights=False)
        attn_out = L.linear_apply(p["c_proj"], attn_out.reshape(Bsz, S, C))
        x = x + attn_out
        h = L.layernorm_apply(p["ln_2"], x, 1e-5)
        h = L.gelu_new(L.linear_apply(p["c_fc"], h))
        h = L.linear_apply(p["mlp_c_proj"], h)
        return x + h, kc, vc

    def _apply_kv_cache(self, params, feats, output_len: int):
        """Eval-mode rollout with a KV cache: prefill T tokens once, then
        decode output_len-1 single tokens (the reference's
        past_key_values loop, models/future_prediction.py:396-412)."""
        Bsz, T, C = feats.shape
        hd = C // self.n_head
        Tmax = T + output_len - 1
        kcs = [jnp.zeros((Bsz, Tmax, self.n_head, hd), feats.dtype)
               for _ in range(self.n_layer)]
        vcs = [jnp.zeros((Bsz, Tmax, self.n_head, hd), feats.dtype)
               for _ in range(self.n_layer)]

        def run(tokens, pos):
            x = tokens + jnp.take(params["wpe"],
                                  pos + jnp.arange(tokens.shape[1]), axis=0)
            for layer, p in enumerate(self.block_list(params)):
                x, kcs[layer], vcs[layer] = self._block_cached(
                    p, x, kcs[layer], vcs[layer], pos)
            return L.layernorm_apply(params["ln_f"], x, 1e-5)

        hidden = run(feats, 0)                       # prefill: (B, T, C)
        outputs = [hidden]
        last = hidden[:, -1:, :]
        for i in range(output_len - 1):
            last = run(last, T + i)                  # decode one token
            outputs.append(last)
        return jnp.concatenate(outputs, axis=1), {}

    def apply(self, params, feats, output_len: int = 1, *, train=False,
              rng: Optional[L.RngStream] = None) -> Tuple[jax.Array, dict]:
        """feats (B, T, C) -> (updated past + future, (B, T+output_len-1, C)).

        Step i > 0 feeds the previous step's last hidden state back with
        position T+i-1 (reference models/future_prediction.py:396-412).
        Eval-mode multi-step rollouts use the KV-cache decode; the full
        re-run below is the reference-faithful training path (dropout is
        drawn per pass) and the single-pass case.
        """
        if output_len > 1 and not train and not self.output_attentions:
            return self._apply_kv_cache(params, feats, output_len)
        addl_endpoints = {}
        Bsz, T, C = feats.shape
        embeds = feats
        outputs = None
        for output_id in range(output_len):
            total = embeds.shape[1]
            hidden, attn = self.forward_hidden(
                params, embeds, jnp.arange(total), train=train, rng=rng,
                collect_attn=self.output_attentions)
            if attn is not None:
                # (B, n_layer, H, T, T), matching reference :409
                new = attn[:, :, :, total - (T if output_id == 0 else 1):]
                addl_endpoints[f"gpt2_att_{output_id}"] = new
            outputs = hidden
            if output_id + 1 < output_len:
                embeds = jnp.concatenate([embeds, hidden[:, -1:, :]], axis=1)
        # full first pass (T hiddens) plus one extra hidden per later step
        if output_len == 1:
            return outputs, addl_endpoints
        result = jnp.concatenate(
            [outputs[:, :T, :],
             *[outputs[:, T + i: T + i + 1, :] for i in range(output_len - 1)]],
            axis=1)
        return result, addl_endpoints

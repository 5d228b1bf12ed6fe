"""Two-process sharded-eval check (simulated multi-host on CPU).

Each process evaluates HALF the synthetic val set (strided, wrap-padded —
DistributedSampler semantics); ``collect_logits`` allgathers the shards and
restores dataset order. Rank 0 independently forwards the FULL set locally
and asserts the merged shards match it exactly — proving sharded eval
computes the same metrics as single-process eval while doing half the work
per process. (Replaces the round-1 every-process-evaluates-everything
fallback; reference equivalent: test.py:130 DataParallel eval.)

Usage: python tools/multiproc_eval_check.py          # orchestrates both
       python tools/multiproc_eval_check.py RANK     # internal
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 12361


def worker(rank: int):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # share the repo-local persistent compilation cache (see tests/conftest)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=rank)
    import numpy as np
    from afft_tpu.config import compose
    from afft_tpu.data.epic import EPICKitchens
    from afft_tpu.data.loader import BatchLoader
    from afft_tpu.eval.evaluate import _forward_all, collect_logits
    from afft_tpu.models import BaseModel
    from afft_tpu.parallel.mesh import make_mesh, replicate_tree

    assert jax.process_count() == 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    annot = os.path.join(repo, "tests", "fixtures", "synth", "annotations")
    ds = EPICKitchens(
        annotation_path=[os.path.join(annot, "validation1.csv")],
        annotation_dir=annot, rulstm_annotation_dir=annot,
        action_labels_fpath=os.path.join(annot, "actions.csv"),
        version=-1, label_type="action", sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 0.5, "tau_o": 10, "drop_style": "correct"},
        reader_fn={m: {
            "_target_": "datasets.reader_fns.EpicRULSTMFeatsReader",
            "lmdb_path": os.path.join(repo, "tests", "fixtures", "synth",
                                      "features_packed", m)}
            for m in ("rgb", "flow")},
        frames_per_clip=10, frame_rate=1, load_seg_labels=False)

    cfg = compose(os.path.join(repo, "afft_tpu/conf"), [
        "model.modal_dims={rgb:24, flow:24}",
        "model.common_dim=32",
        "model.common.fp_inter_dim=64",
        "model.common.fp_layers=2",
        "model.common.fp_heads=2",
        "model.fuser.depth=2",
        "model.fuser.num_heads=2",
    ])
    model = BaseModel(cfg.model, num_classes={
        "action": len(ds.classes["action"])})
    params = model.init(jax.random.key(0))
    mesh = make_mesh(jax.local_devices())
    params = replicate_tree(mesh, params)

    shard_loader = BatchLoader(ds, batch_size=4, shuffle=False,
                               num_workers=2, shard_id=rank, num_shards=2)
    logits, idx, _ = collect_logits(model, params, shard_loader, mesh)

    assert len(logits) == len(ds), f"{len(logits)} vs {len(ds)}"
    assert (idx == np.arange(len(ds))).all(), "dataset order not restored"

    if rank == 0:
        full_loader = BatchLoader(ds, batch_size=4, shuffle=False,
                                  num_workers=2)
        ref = np.concatenate([lg for lg, _, _, _ in _forward_all(
            model, params, full_loader, mesh)], axis=0)
        np.testing.assert_allclose(logits, ref, rtol=1e-6, atol=1e-6)
        print("multiproc eval ok", flush=True)


def main():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(r)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for r in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and \
        "multiproc eval ok" in outs[0]
    for r, o in enumerate(outs):
        if not ok:
            print(f"--- rank {r} ---\n{o}")
    if not ok:
        sys.exit(1)
    print("multiproc eval ok")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        main()

"""Two-process distributed training check (simulated multi-host on CPU).

Each process owns 4 virtual CPU devices; jax.distributed glues them into one
8-device mesh. Both run the same jitted train step on their input shard; the
resulting (replicated) loss must match the single-process 8-device run.

Usage: python tools/multihost_check.py              # orchestrates both ranks
       python tools/multihost_check.py --flagship   # flagship-shape loader
                                                    # feed-rate load test
       python tools/multihost_check.py RANK [...]   # internal

``--flagship`` runs the per-host input pipeline at flagship dims (global
batch 64, 4 modalities, T=16, bf16 packed stores) through BatchLoader +
``make_array_from_process_local_data`` staging on the 2-process 8-device
mesh, and reports the feed rate against the measured flagship TPU train
step budget — proving the host pipeline keeps multi-chip devices fed
(VERDICT r2 next #8).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 12357
# measured flagship train step on the real chip (tools/tpu_train_check.py,
# fused train kernels) — the budget each staged batch must beat. Override
# with AFFT_MH_BUDGET_MS when the step time changes (round 5: the combined
# B=256 + bf16-master operating point), and AFFT_MH_LOCAL_BATCH to load the
# pipeline at the matching per-rank batch.
TRAIN_STEP_BUDGET_MS = float(os.environ.get("AFFT_MH_BUDGET_MS", 44.6))
LOCAL_BATCH = int(os.environ.get("AFFT_MH_LOCAL_BATCH", 32))


def worker(rank: int):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # share the repo-local persistent compilation cache (see tests/conftest)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=rank,
                               heartbeat_timeout_seconds=400)
    import numpy as np
    from afft_tpu.config import compose
    from afft_tpu.models import BaseModel
    from afft_tpu.parallel.mesh import make_mesh, replicate_tree
    from afft_tpu.train import optim as O
    from afft_tpu.train.runner import Runner
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2 and jax.device_count() == 8

    cfg = compose("afft_tpu/conf", [
        "model.modal_dims={rgb:32, flow:32}", "model.common_dim=32",
        "model.common.fp_inter_dim=64", "model.common.fp_layers=2",
        "model.common.fp_heads=2", "model.fuser.depth=2",
        "model.fuser.num_heads=2"])
    model = BaseModel(cfg.model, num_classes={"action": 11})
    params = model.init(jax.random.key(0))
    groups = O.build_group_tree(params, None, 0.01, 1e-6)
    opt = O.sgd(momentum=0.9, nesterov=True)
    opt_state = opt.init(params, groups)
    runner = Runner(model, opt, groups,
                    loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                              "past_reg": 1.0}, mixup=None, donate=False)

    mesh = make_mesh()  # all 8 global devices
    params = replicate_tree(mesh, params)
    opt_state = replicate_tree(mesh, opt_state)

    # global batch 16, each process materializes its local half
    rng = np.random.default_rng(0)
    full = {
        "data_dict": {m: rng.standard_normal((16, 6, 32)).astype(np.float32)
                      for m in ("rgb", "flow")},
        "target": {"action": rng.integers(0, 11, (16,))},
        "target_subclips": {"action": rng.integers(-1, 11, (16, 6, 1))},
        "valid": np.ones((16,), bool),
    }

    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, x[
            rank * 8:(rank + 1) * 8] if np.ndim(x) else x)

    device_batch = jax.tree.map(put, full)
    params, opt_state, losses, _, _ = runner.train_step(
        params, opt_state, device_batch, 0.01, 0.01, jax.random.key(1))
    loss = float(losses["total_loss"])
    print(f"RANK{rank} LOSS {loss:.6f}", flush=True)

    # ZeRO-1 across processes: optimizer state sharded over the GLOBAL
    # data axis (each process holds only its slice), params pinned
    # replicated inside the step; same batch/rng must give the same loss,
    # and the sharded state must read back through to_host_tree's
    # all-gather path (multi-host checkpointing)
    from afft_tpu.parallel.sharding import shard_opt_state
    from afft_tpu.train.checkpoint import to_host_tree
    params_z = replicate_tree(mesh, model.init(jax.random.key(0)))
    opt_z = shard_opt_state(mesh, opt.init(params_z, groups))
    repl = NamedSharding(mesh, P())
    runner_z = Runner(model, opt, groups,
                      loss_wts={"cls_action": 1.0, "past_cls_action": 1.0,
                                "past_reg": 1.0}, mixup=None, donate=False,
                      param_shardings=jax.tree.map(lambda _: repl, params_z))
    params_z, opt_z, losses_z, _, _ = runner_z.train_step(
        params_z, opt_z, device_batch, 0.01, 0.01, jax.random.key(1))
    loss_z = float(losses_z["total_loss"])
    assert abs(loss_z - loss) < 1e-5, (loss_z, loss)
    host_mom = to_host_tree(opt_z["momentum"])
    import jax.tree_util as jtu
    for dev, host in zip(jtu.tree_leaves(opt_z["momentum"]),
                         jtu.tree_leaves(host_mom)):
        assert host.shape == dev.shape, (host.shape, dev.shape)
    print(f"RANK{rank} ZERO1 {loss_z:.6f}", flush=True)


def flagship_worker(rank: int):
    """Per-host input pipeline at flagship dims on the 2-process mesh:
    packed-store reads -> BatchLoader (sharded) -> staging. Reports
    ms/batch for loader-only and loader+staging."""
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT + 1}",
                               num_processes=2, process_id=rank,
                               heartbeat_timeout_seconds=400)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from afft_tpu.data.epic import EPICKitchens
    from afft_tpu.data.loader import BatchLoader
    from afft_tpu.parallel.mesh import make_mesh

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench
    bench._build_bench_dataset()
    annot = os.path.join(bench.BENCH_DATA, "annotations")
    ds = EPICKitchens(
        annotation_path=[os.path.join(annot, "validation.csv")],
        annotation_dir=annot, rulstm_annotation_dir=annot,
        action_labels_fpath=os.path.join(annot, "actions.csv"),
        version=-1, label_type="action", sample_strategy="last_clip",
        conv_to_anticipate_fn={
            "_target_": "datasets.base_video_dataset.convert_to_anticipation",
            "tau_a": 1, "tau_o": 16, "drop_style": "correct"},
        reader_fn={m: {
            "_target_": "datasets.reader_fns.EpicRULSTMFeatsReader",
            "lmdb_path": os.path.join(bench.BENCH_DATA, "features", m)}
            for m in bench.MODAL_DIMS},
        frames_per_clip=16, frame_rate=1, load_seg_labels=True)

    local_b = LOCAL_BATCH  # default: global 64 over 2 hosts
    loader = BatchLoader(ds, batch_size=local_b, shuffle=True, seed=7,
                         num_workers=8, shard_id=rank, num_shards=2,
                         drop_last=True)
    mesh = make_mesh()

    def stage(batch):
        def put(x):
            x = np.asarray(x)
            spec = P("data", *([None] * (x.ndim - 1))) if x.ndim else P()
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), x)
        return jax.tree.map(put, {
            "data_dict": batch["data_dict"], "target": batch["target"],
            "target_subclips": batch.get("target_subclips"),
            "valid": batch["valid"]})

    # warm one epoch start, then measure
    n, t_loader, t_stage = 0, 0.0, 0.0
    it = iter(loader)
    staged = stage(next(it))
    t_all0 = time.perf_counter()
    while n < 40:
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            loader.set_epoch(loader._epoch + 1)
            it = iter(loader)
            batch = next(it)
        t_loader += time.perf_counter() - t0
        t0 = time.perf_counter()
        staged = stage(batch)
        jax.block_until_ready(staged["data_dict"]["rgb"])
        t_stage += time.perf_counter() - t0
        n += 1
    wall = time.perf_counter() - t_all0
    print("FLAGSHIP" + str(rank) + " " + json.dumps({
        "batches": n, "local_batch": local_b,
        "loader_ms_per_batch": round(t_loader / n * 1e3, 2),
        "staging_ms_per_batch": round(t_stage / n * 1e3, 2),
        "wall_ms_per_batch": round(wall / n * 1e3, 2),
    }), flush=True)


def main():
    argv = sys.argv[1:]
    flagship = "--flagship" in argv
    argv = [a for a in argv if a != "--flagship"]
    if argv:
        (flagship_worker if flagship else worker)(int(argv[0]))
        return
    cmd = [sys.executable, __file__] + (["--flagship"] if flagship else [])
    procs = [subprocess.Popen(cmd + [str(r)], stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for r in range(2)]
    outs = [p.communicate(timeout=1200 if flagship else 540)[0]
            for p in procs]
    if flagship:
        stats = []
        for r, out in enumerate(outs):
            for line in out.splitlines():
                if line.startswith(f"FLAGSHIP{r} "):
                    stats.append(json.loads(line.split(" ", 1)[1]))
        assert len(stats) == 2, f"missing rank outputs:\n{outs[0]}\n{outs[1]}"
        worst = max(s["wall_ms_per_batch"] for s in stats)
        verdict = {
            "what": "flagship-shape 2-process input pipeline load test "
                    "(packed stores -> sharded BatchLoader -> "
                    "make_array_from_process_local_data staging)",
            "per_rank": stats,
            "worst_wall_ms_per_batch": worst,
            "local_batch": LOCAL_BATCH,
            "train_step_budget_ms": TRAIN_STEP_BUDGET_MS,
            "keeps_devices_fed": worst < TRAIN_STEP_BUDGET_MS,
        }
        print(json.dumps(verdict))
        assert worst < TRAIN_STEP_BUDGET_MS, \
            f"input pipeline too slow: {worst} ms/batch vs " \
            f"{TRAIN_STEP_BUDGET_MS} ms step budget"
        return
    losses, zlosses = [], []
    for r, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"RANK{r} LOSS"):
                losses.append(float(line.split()[-1]))
            if line.startswith(f"RANK{r} ZERO1"):
                zlosses.append(float(line.split()[-1]))
    assert len(losses) == 2, f"missing rank outputs:\n{outs[0]}\n{outs[1]}"
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    assert len(zlosses) == 2 and abs(zlosses[0] - zlosses[1]) < 1e-6, \
        (zlosses, outs[0][-500:])
    print(f"multihost check ok: both ranks computed loss {losses[0]:.6f} "
          f"(ZeRO-1 cross-process leg: {zlosses[0]:.6f})")


if __name__ == "__main__":
    main()

"""Two-process distributed training check (simulated multi-host on CPU).

Each process owns 4 virtual CPU devices; jax.distributed glues them into one
8-device mesh. Both run the same jitted train step on their input shard; the
resulting (replicated) loss must match the single-process 8-device run.

Usage: python tools/multihost_check.py            # orchestrates both ranks
       python tools/multihost_check.py RANK       # internal
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 12357


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
                               num_processes=2, process_id=rank)
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


def main():
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    procs = [subprocess.Popen([sys.executable, __file__, str(r)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for r in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    losses = []
    for r, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"RANK{r} LOSS"):
                losses.append(float(line.split()[-1]))
    assert len(losses) == 2, f"missing rank outputs:\n{outs[0]}\n{outs[1]}"
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    print(f"multihost check ok: both ranks computed loss {losses[0]:.6f}")


if __name__ == "__main__":
    main()

"""One-command MT5R parity against the reference's published numbers.

Turns the README runbook (README.md "Reproducing the reference numbers")
into a single asserting command: import a released reference ``.pth``
checkpoint, run the val protocol of the given expt file, and compare the
headline metric against the published value
(/root/reference/README.md:82-85):

    python tools/reproduce_reference.py --expt 01_SA-Fuser_ek100_val_TSN \
        --ckpt fusion_ek100_tsn/checkpoint_best.pth \
        --lmdb rgb=/data/rgb,objects=/data/obj,audio=/data/audio,flow=/data/flow

Exit code 0 iff |measured - expected| <= tolerance. ``--expect`` overrides
the published expectation (used by the synthetic smoke test,
tests/test_reproduce.py, which keeps this command path from bit-rotting
while the real feature LMDBs / checkpoint zoo remain unavailable).

Published expectations (action MT5R unless noted):
  01_SA-Fuser_ek100_val_Swin          18.5
  01_SA-Fuser_ek100_val_TSN           17.0
  01_SA-Fuser_ek100_val_TSN_wo_audio  16.4
  06_SA-Fuser_egtea_val               42.5  (action top-1)
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# published numbers: /root/reference/README.md:84-85
EXPECTATIONS = {
    "01_SA-Fuser_ek100_val_Swin": ("amt5r", 18.5),
    "01_SA-Fuser_ek100_val_TSN": ("amt5r", 17.0),
    "01_SA-Fuser_ek100_val_TSN_wo_audio": ("amt5r", 16.4),
    "06_SA-Fuser_egtea_val": ("atop1", 42.5),
}


def build_overrides(args):
    import run as run_mod
    expt = args.expt if args.expt.endswith(".txt") else args.expt + ".txt"
    expt_path = expt if os.path.exists(expt) \
        else os.path.join(REPO, "expts", expt)
    overrides = run_mod.read_file_into_cli(expt_path)
    # force evaluation mode: a +save_name override in the expt file would
    # switch evaluate() into logits-export mode and return no accuracies
    overrides = [o for o in overrides
                 if not o.lstrip("+").startswith("save_name=")]
    if args.ckpt:
        overrides.append(f"init_from_model={args.ckpt}")
    for spec in (args.lmdb.split(",") if args.lmdb else []):
        mod, _, path = spec.partition("=")
        assert path, f"--lmdb entries are mod=path, got {spec!r}"
        group = args.dataset_group
        overrides.append(
            f"dataset.{group}.common.reader_fn.{mod}.lmdb_path={path}")
    overrides.extend(args.override or [])
    return overrides


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Assert published-metric parity for a reference ckpt.")
    ap.add_argument("--expt", required=True,
                    help="expt file name (expts/<name>.txt) or path")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint path relative to checkpoints/ "
                         "(.pth imports automatically) — overrides the "
                         "expt file's init_from_model")
    ap.add_argument("--lmdb", default=None,
                    help="comma-separated mod=dir feature-store overrides")
    ap.add_argument("--dataset-group", default="epic_kitchens100",
                    help="config group for --lmdb paths")
    ap.add_argument("--expect", type=float, default=None,
                    help="expected metric value (default: published)")
    ap.add_argument("--metric", default=None,
                    help="accs key to check (default: published metric)")
    ap.add_argument("--tolerance", type=float, default=0.3,
                    help="|measured - expected| bound (MT5R points)")
    ap.add_argument("--override", action="append", default=[],
                    help="extra config overrides (repeatable)")
    args = ap.parse_args(argv)

    name = os.path.splitext(os.path.basename(args.expt))[0]
    metric, expected = EXPECTATIONS.get(name, (None, None))
    metric = args.metric or metric
    expected = args.expect if args.expect is not None else expected
    assert metric is not None, \
        f"{name} has no published expectation; pass --metric/--expect"
    assert expected is not None, \
        f"{name} has no published expectation; pass --expect"

    from afft_tpu.config import compose
    from afft_tpu.eval.evaluate import main as eval_main

    cfg = compose(os.path.join(REPO, "afft_tpu", "conf"),
                  build_overrides(args))
    accs = eval_main(cfg)
    assert accs is not None, "evaluate returned no accuracies (save_name set?)"
    measured = float(accs[metric])
    diff = abs(measured - expected)
    status = "OK" if diff <= args.tolerance else "FAIL"
    print(f"[reproduce_reference] {name}: {metric} measured {measured:.2f} "
          f"expected {expected:.2f} |diff| {diff:.2f} "
          f"(tolerance {args.tolerance}) -> {status}")
    if diff > args.tolerance:
        sys.exit(1)
    return measured


if __name__ == "__main__":
    main()

"""Launcher, interface-compatible with the reference's run.py.

``python run.py -c expts/X.txt --mode {train,test} [-n N]`` reads the expt
override file and launches the corresponding entry point. Unlike the
reference (which shells out to torchrun, reference run.py:42-44), TPU
execution is single-process-per-host: devices come from the jax mesh, so
``--nproc_per_node`` is accepted for compatibility but ignored locally
(multi-host runs launch one process per host with coordinator env vars).
"""

import argparse
import subprocess
import sys


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, required=True,
                        help="Overrides config file")
    parser.add_argument("-m", "--mode", type=str, required=True,
                        choices=["train", "test", "visualize_attention"],
                        help="Choose which entry point to run")
    parser.add_argument("-n", "--nproc_per_node", type=int, default=1,
                        required=False,
                        help="accepted for reference compatibility; devices "
                             "come from the jax mesh")
    return parser.parse_args()


def read_file_into_cli(fpath):
    res = []
    with open(fpath, "r") as fin:
        for line in fin:
            args = line.split("#")[0].strip()
            if len(args) == 0:
                continue
            res.append(args)
    return res


def construct_cmd(args):
    assert args.cfg.startswith("expts"), "Must be wrt this directory"
    cli_stuff = read_file_into_cli(args.cfg)
    return [sys.executable, f"{args.mode}.py"] + cli_stuff


def main():
    args = parse_args()
    cmd = construct_cmd(args)
    print('>> Running "{}"'.format(" ".join(cmd)))
    sys.exit(subprocess.call(cmd))


if __name__ == "__main__":
    main()

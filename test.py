"""Evaluation / logits-export entry point (reference test.py equivalent).

Usage: python test.py <hydra-style overrides>   (normally via run.py)
With +save_name=foo.h5 exports action logits to logits/<model>/foo.h5;
otherwise prints marginalized verb/noun/action accuracies.
"""

import logging
import sys

from afft_tpu.config import compose
from afft_tpu.eval.evaluate import main as eval_main

CONFIG_DIR = "afft_tpu/conf"


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    cfg = compose(CONFIG_DIR, sys.argv[1:])
    print(cfg.to_yaml())
    eval_main(cfg)


if __name__ == "__main__":
    main()

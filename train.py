"""Training entry point (reference train.py equivalent).

Usage: python train.py <hydra-style overrides>   (normally via run.py)
"""

import logging
import sys

from afft_tpu.config import compose
from afft_tpu.train.loop import main as train_main

CONFIG_DIR = "afft_tpu/conf"


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    cfg = compose(CONFIG_DIR, sys.argv[1:])
    print(cfg.to_yaml())
    train_main(cfg)


if __name__ == "__main__":
    main()

"""Every shipped expt file must compose and build its model architecture.

Mirrors the reference's reproducible experiment matrix (reference expts/*,
SURVEY §2.6). Model construction + abstract init (jax.eval_shape) validates
the full config surface without touching feature data.
"""

import glob
import os

import jax
import pytest

from afft_tpu.config import compose
from afft_tpu.models import BaseModel
from run import read_file_into_cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF = os.path.join(REPO, "afft_tpu", "conf")
EXPTS = sorted(glob.glob(os.path.join(REPO, "expts", "*.txt")))

NUM_CLASSES = {"ek100": {"action": 3806}, "egtea": {"action": 106},
               "synth": {"action": 12}}


def _num_classes(fname):
    if "egtea" in fname:
        return NUM_CLASSES["egtea"]
    if "synth" in fname:
        return NUM_CLASSES["synth"]
    return NUM_CLASSES["ek100"]


@pytest.mark.parametrize("expt", EXPTS, ids=[os.path.basename(e)
                                             for e in EXPTS])
def test_expt_composes_and_builds(expt):
    overrides = read_file_into_cli(expt)
    cfg = compose(CONF, overrides)

    # data/reader config resolves
    assert cfg.dataset_train._target_ == "datasets.epic_kitchens.EPICKitchens"
    reader = (cfg.select("dataset.epic_kitchens100.common.reader_fn")
              if "ek100" in expt else
              cfg.select("dataset.egtea.common.reader_fn"))
    if reader is None:
        reader = cfg.dataset_train.reader_fn
    assert reader is not None and len(reader.keys()) >= 1

    model = BaseModel(cfg.model, num_classes=_num_classes(expt))
    shapes = jax.eval_shape(model.init, jax.random.key(0))
    n_params = sum(int(jax.numpy.prod(jax.numpy.array(x.shape)))
                   for x in jax.tree.leaves(shapes))
    assert n_params > 5e4
    # flagship 4-modal SA-Fuser configs land at ~390M params (SURVEY scale)
    if "01_SA-Fuser_ek100_train" in expt:
        assert 3.5e8 < n_params < 4.3e8, n_params


def _walk_scalars(node, path=""):
    if hasattr(node, "items"):
        for k, v in node.items():
            yield from _walk_scalars(v, f"{path}.{k}")
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            yield from _walk_scalars(v, f"{path}[{i}]")
    else:
        yield path, node


@pytest.mark.parametrize("expt", [None] + EXPTS,
                         ids=["defaults"] + [os.path.basename(e)
                                             for e in EXPTS])
def test_no_junk_scalars_in_composed_config(expt):
    """No composed value may contain an unresolved '${' or a swallowed
    inline comment ('#'): a yaml comment with no space before '#' is part
    of the scalar, so e.g. output_attentions once resolved to the truthy
    STRING 'False# return per-layer attention maps' — silently disabling
    the KV-cache rollout and the fused kernels (a ~2x serving regression
    that no shape or parity test could see). Guard every config."""
    overrides = read_file_into_cli(expt) if expt else []
    cfg = compose(CONF, overrides)
    tree = cfg.to_container() if hasattr(cfg, "to_container") else cfg
    for path, v in _walk_scalars(tree):
        if isinstance(v, str):
            assert "${" not in v, f"unresolved interpolation at {path}: {v!r}"
            assert "#" not in v, f"swallowed inline comment at {path}: {v!r}"
            assert v.strip().lower() not in ("true", "false"), \
                f"stringly-typed bool at {path}: {v!r}"

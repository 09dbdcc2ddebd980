"""Config-file ORACLE parity vs the reference.

For every shipped config under configs/, parse the same-named reference file
with the reference's own config_parser() (/root/reference/config.py:19-223 for
the ibrnet stack, /root/reference/eval/gnt/config.py:4-311 for the gnt stack)
and the repo file with nerfool_tpu.config.config_parser(), then assert every
flag the two parsers share resolves to the same value — so a shipped config
can never silently drift from the reference's render/attack semantics again.

Intentional deltas (paths, parallelism plumbing, TPU-only knobs) are
whitelisted explicitly below with justifications.
"""
import argparse
import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_stubs  # noqa: E402

ref_stubs.install()

from nerfool_tpu.config import _read_config_file, config_parser, str2bool  # noqa: E402

REFERENCE = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

# Flags whose values intentionally differ (or only exist on one side):
WHITELIST = {
    "config",       # the config path itself
    "rootdir",      # reference ships absolute /home/... paths
    "ckpt_path",    # same
    "distributed",  # torch DDP knob; this repo shards via the jax mesh
    "use_dp",       # torch DataParallel knob; subsumed by the mesh (pretrain_dp
                    # keeps it set for command-line compat)
    "ret_alpha",    # the reference enables it per-CLI for GNT attack runs
                    # (eval/gnt/eval_adv.py passes args.ret_alpha); shipped gnt
                    # configs default it on so depth outputs exist
    "local_rank",
    "workers",
    "distributed_init_method",
}

_CONFIG_FILES = []
for stack in ("ibrnet", "gnt"):
    d = os.path.join(REPO, "configs", stack)
    for name in sorted(os.listdir(d)):
        if name.endswith(".txt"):
            _CONFIG_FILES.append((stack, name))


def _load_ref_parser(stack):
    path = (
        os.path.join(REFERENCE, "config.py")
        if stack == "ibrnet"
        else os.path.join(REFERENCE, "eval", "gnt", "config.py")
    )
    spec = importlib.util.spec_from_file_location(f"_ref_config_{stack}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.config_parser()


def _parse_with_file(parser, cfg_path):
    """configargparse-style merge: file entries become defaults, CLI empty."""
    file_args = []
    for key, vals in _read_config_file(cfg_path):
        action = parser._option_string_actions.get(f"--{key}")
        assert action is not None, f"{cfg_path}: flag --{key} unknown to parser"
        if isinstance(action, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
            if str2bool(vals[0]):
                file_args.append(f"--{key}")
        else:
            file_args.append(f"--{key}")
            file_args.extend(vals)
    return parser.parse_args(file_args)


@pytest.mark.parametrize("stack,name", _CONFIG_FILES)
def test_config_matches_reference(stack, name):
    ref_path = os.path.join(REFERENCE, "configs", stack, name)
    assert os.path.exists(ref_path), f"no reference counterpart for {stack}/{name}"
    ref_ns = _parse_with_file(_load_ref_parser(stack), ref_path)
    repo_ns = config_parser().parse_args(
        ["--config", os.path.join(REPO, "configs", stack, name)]
    )
    ref_d, repo_d = vars(ref_ns), vars(repo_ns)
    shared = sorted((set(ref_d) & set(repo_d)) - WHITELIST)
    assert len(shared) > 50  # the comparison surface must stay broad
    mismatches = {
        k: (ref_d[k], repo_d[k]) for k in shared if ref_d[k] != repo_d[k]
    }
    assert not mismatches, (
        f"{stack}/{name} drifts from the reference resolved config: {mismatches}"
    )


def test_parse_compat_dead_reference_flags():
    """Reference command lines carrying the dead flags --attack_mode
    (commented out of the reference's own parser, /root/reference/config.py:154)
    and --purif_lr (read but never consumed,
    /root/reference/eval/gnt/eval_adv.py:1074) must parse here."""
    args = config_parser().parse_args(
        ["--attack_mode", "view_specific", "--purif_lr", "3.5",
         "--orig_dist_thres", "0.5", "--run_val"]
    )
    assert args.attack_mode == "view_specific"
    assert args.purif_lr == 3.5


def test_aggregator_lr_per_backbone():
    """GNT trains its aggregator at --lrate_gnt, IBRNet at --lrate_mlp
    (/root/reference/gnt/model.py:59-61)."""
    from nerfool_tpu.train.trainer import aggregator_lr

    args = config_parser().parse_args(
        ["--backbone", "gnt", "--lrate_gnt", "1e-4", "--lrate_mlp", "9e-4"])
    assert aggregator_lr(args) == 1e-4
    args = config_parser().parse_args(
        ["--backbone", "ibrnet", "--lrate_gnt", "1e-4", "--lrate_mlp", "9e-4"])
    assert aggregator_lr(args) == 9e-4


def test_reference_counterparts_all_covered():
    """Every reference config file must have a same-named shipped mirror."""
    for stack in ("ibrnet", "gnt"):
        ref_names = {
            n
            for n in os.listdir(os.path.join(REFERENCE, "configs", stack))
            if n.endswith(".txt")
        }
        repo_names = {n for s, n in _CONFIG_FILES if s == stack}
        assert ref_names == repo_names

"""The engine's measured scan-vs-dispatch rule (BENCH_NOTES round 3):
--scan_group unset -> per-iteration dispatch on a single chip, lax.scan
groups once rays shard over a multi-chip mesh; an explicit flag overrides
both, and the group always divides the iteration count exactly."""
from types import SimpleNamespace

from nerfool_tpu.attack.engine import AdvEvaluator
from nerfool_tpu.parallel.mesh import get_mesh, shard_rays


def _scan_group(scan_group, ray_sharding, n_iters):
    dummy = SimpleNamespace(args=SimpleNamespace(scan_group=scan_group),
                            ray_sharding=ray_sharding)
    return AdvEvaluator._scan_group(dummy, n_iters)


def test_single_chip_defaults_to_dispatch():
    assert _scan_group(None, None, 1000) == 1


def test_multichip_defaults_to_scan_groups():
    rs = shard_rays(get_mesh())
    assert _scan_group(None, rs, 1000) == 25


def test_explicit_flag_overrides_both_ways():
    rs = shard_rays(get_mesh())
    assert _scan_group(10, None, 1000) == 10
    assert _scan_group(1, rs, 1000) == 1


def test_group_divides_iteration_count():
    rs = shard_rays(get_mesh())
    # 1000 % 25 == 0 stays; an indivisible request shrinks to a divisor
    assert _scan_group(24, rs, 1000) == 20
    assert _scan_group(None, rs, 7) == 7
    assert _scan_group(None, rs, 23) == 23  # prime < 25: whole run, one exec

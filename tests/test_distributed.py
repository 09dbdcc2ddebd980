"""Multi-host scaffolding: everything testable single-process — rendezvous
no-op, host-shard index math, per-host seeds, global-array assembly on the
8-virtual-device mesh. (The actual multi-process rendezvous needs a real pod;
the launch path is documented in parallel/distributed.py.)"""
import numpy as np
import jax
import jax.numpy as jnp

from nerfool_tpu.parallel.distributed import (
    host_seed, host_shard, initialize, is_main_process, make_global,
)
from nerfool_tpu.parallel.mesh import get_mesh, shard_rays


def test_initialize_single_process_noop():
    class A:
        distributed = False

    pi, pc = initialize(A())
    assert (pi, pc) == (0, 1)
    assert is_main_process()


def test_host_shard_covers_axis_exactly():
    for n in (1, 7, 64, 1000, 1001):
        for pc in (1, 2, 4, 8):
            got = []
            for pi in range(pc):
                s = host_shard(n, pi, pc)
                got.extend(range(n)[s])
                # equal-length shards except a short tail on the last hosts
                if pi == 0:
                    per = s.stop - s.start
                else:
                    assert s.stop - s.start <= per
            assert got == list(range(n)), (n, pc)


def test_host_seed_decorrelated():
    seeds = {host_seed(777, pi) for pi in range(16)}
    assert len(seeds) == 16
    assert host_seed(777, 0) == 777  # single-host unchanged


def test_make_global_single_process_is_device_put():
    mesh = get_mesh()
    rs = shard_rays(mesh)
    x = np.arange(64, dtype=np.float32).reshape(64, 1)
    g = make_global(rs, x)
    assert g.sharding == rs
    np.testing.assert_array_equal(np.asarray(g), x)
    # and it is consumable by a sharded computation
    y = jax.jit(lambda v: jnp.sum(v))(g)
    assert float(y) == float(x.sum())

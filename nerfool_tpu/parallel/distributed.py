"""Multi-host (multi-process) scaffolding.

The reference's multi-node story is torch DDP: an env:// rendezvous via
``init_process_group(backend="nccl", init_method=args.distributed_init_method)``
(/root/reference/train.py:360-363, config.py:105-106), a per-rank
DistributedSampler so every rank trains on different target views
(/root/reference/ibrnet/data_loaders/create_training_dataset.py:55-97), and
gradient all-reduce inside DDP.

The TPU-native equivalent built here:

* ``initialize(args)`` — one call at process start. Maps the reference's
  env:// convention (MASTER_ADDR / MASTER_PORT / WORLD_SIZE / RANK — exactly
  what a torch DDP launcher exports) onto ``jax.distributed.initialize``; on
  Cloud TPU pods with no env spec it lets JAX auto-detect the slice topology.
  After it returns, ``jax.devices()`` is the GLOBAL device list and the
  existing 1-D ray mesh (parallel/mesh.get_mesh) spans every chip of every
  host — GSPMD then emits the same psum/all-gather program as single-host,
  riding ICI within the slice (DCN only across slices).
* ``host_shard(n)`` — index math for the per-host slice of a length-``n``
  global ray axis (whole-frame rendering feeds each host its own rays).
* ``make_global(sharded, local)`` — assembles a globally-sharded jax.Array
  from this host's shard (``jax.make_array_from_process_local_data``).
* ``host_seed(base)`` — decorrelated per-host loader seed: the reference's
  DistributedSampler semantics (each rank sees a different view stream)
  without a sampler object; our Loader is seed-driven.

Everything degrades to an exact no-op single-process, which is how the test
suite (and the v5e-8 single-host target) runs it.
"""
from __future__ import annotations

import os


def _env_spec():
    """torch-DDP-style env:// rendezvous variables, if present."""
    addr = os.environ.get("MASTER_ADDR")
    port = os.environ.get("MASTER_PORT")
    world = os.environ.get("WORLD_SIZE")
    rank = os.environ.get("RANK")
    if addr and world and int(world) > 1:
        return {
            "coordinator_address": f"{addr}:{port or 1234}",
            "num_processes": int(world),
            "process_id": int(rank or 0),
        }
    return None


_initialized = False


def initialize(args=None, **overrides):
    """Process-group init; safe to call unconditionally at entry.

    Resolution order: explicit ``overrides`` (coordinator_address /
    num_processes / process_id) > torch-style env:// variables > TPU-pod
    auto-detection (only attempted when ``args.distributed`` asks for it).
    Single-process runs return (0, 1) without touching jax.distributed.

    Returns (process_index, process_count).
    """
    global _initialized
    import jax

    spec = overrides if overrides.get("num_processes") else _env_spec()
    want = bool(getattr(args, "distributed", False)) or spec is not None
    if want and not _initialized:
        # CPU multi-process (the offline harness: tests/test_multihost.py,
        # driver dry-runs) needs an explicit cross-process collectives
        # implementation; TPU pods ride ICI natively and skip this.
        try:
            if "cpu" in (jax.config.jax_platforms or ""):
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        if spec:
            jax.distributed.initialize(**spec)
        else:
            # Cloud TPU pod: the runtime env carries the topology
            jax.distributed.initialize()
        _initialized = True
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for logging/checkpointing (reference train.py:202)."""
    import jax

    return jax.process_index() == 0


def host_shard(n: int, process_index: int | None = None,
               process_count: int | None = None) -> slice:
    """This host's contiguous slice of a length-``n`` global leading axis.

    The global axis is padded conceptually to a process_count multiple; the
    last host's slice is shorter when n is not divisible (callers pad with
    parallel.mesh.pad_to_multiple before sharding, so in practice shards are
    equal-length).
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n // pc)
    lo = min(pi * per, n)
    return slice(lo, min(lo + per, n))


def make_global(sharding, local):
    """Assemble a globally-sharded jax.Array from this process's local shard
    (identity single-process)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def host_seed(base: int, process_index: int | None = None) -> int:
    """Decorrelated per-host stream seed (DistributedSampler equivalent)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    return int(base) + 1_000_003 * pi

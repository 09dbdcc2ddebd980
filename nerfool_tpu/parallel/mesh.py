"""Device mesh + sharding helpers.

The workload's only long axis is rays (H*W ~ 1e5-1e6 per frame); attention axes
(samples, views) are tiny. So the parallel layout is one-dimensional: shard the
ray axis over every chip, replicate params and source images, and let GSPMD
insert the collectives (a psum of attack gradients is the only cross-chip
traffic). This replaces the reference's serial chunk loop
(/root/reference/ibrnet/render_image.py:52) and its DDP data parallelism
(/root/reference/ibrnet/model.py:78-96) with a single pjit-sharded axis.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the ray axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("rays",))


def shard_rays(mesh: Mesh):
    """Sharding that splits the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P("rays"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` to the next multiple; returns (padded, orig_len)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, mode="edge"), n

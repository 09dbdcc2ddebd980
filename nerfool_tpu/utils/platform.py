"""Platform selection honoring JAX_PLATFORMS under relay-registered backends.

Some environments register an out-of-tree TPU backend (e.g. an 'axon' relay)
with priority over the JAX_PLATFORMS environment variable, so
``JAX_PLATFORMS=cpu python scripts/...`` would still land on the TPU and pay
its remote-compile latency. Entry scripts call :func:`apply_platform_env`
before any device query to route the request through jax.config, which the
relay respects (tests/conftest.py does the same for the virtual CPU mesh).
"""
from __future__ import annotations

import os


def apply_platform_env():
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)


def host_key(seed: int = 0):
    """PRNGKey built on the host CPU backend. On the remote-relay TPU
    platform, ``jax.random.PRNGKey`` on the default device costs a remote
    compile + round trip per process; host keys are free and every consumer
    that needs the key on-device gets it in one transfer."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.random.PRNGKey(seed)
    with jax.default_device(cpu):
        return jax.random.PRNGKey(seed)


def apply_precision(args):
    """Honor --matmul_precision: raises the MXU input precision for f32
    operands of every dot/conv that does not set one explicitly (the
    exact-selection gather contractions already force HIGHEST). 'default'
    leaves JAX untouched."""
    prec = getattr(args, "matmul_precision", "default")
    if prec and prec != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", prec)

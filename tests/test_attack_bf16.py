"""bf16 feature-net attack EFFICACY guard.

Numerical trajectory parity between f32 and bf16 features is unattainable at
random init (the InstanceNorm ResUNet amplifies rounding noise chaotically —
BENCH_NOTES.md), so the opt-in --feature_dtype bfloat16 fast path is gated on
EFFICACY instead: the bf16 attack must climb the rgb loss to a final value in
family with the f32 attack's (measured 0.949x on this fixture; band 0.7-1.4
absorbs seed-level chaos). Guards the bf16 path against silent breakage
(e.g. a cast that zeroes gradients), not against precision drift.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.attack.attack import (
    AttackConfig,
    init_attack_state,
    make_attack_step,
)
from nerfool_tpu.models.bundle import create_model
from nerfool_tpu.render.render_rays import RenderConfig

from helpers import synthetic_scene

pytestmark = pytest.mark.slow  # two attack-step compiles + 2x20 iters


def _run_attack(feature_dtype, iters=20):
    rng = np.random.RandomState(7)
    h, w, nsrc, ns, nrand = 24, 32, 3, 12, 64
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=nsrc, h=h, w=w
    )
    target_rgb = rng.rand(h * w, 3).astype(np.float32)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(0),
                          feature_dtype=feature_dtype)
    rcfg = RenderConfig(n_samples=ns, det=True, backbone="ibrnet")
    acfg = AttackConfig(h=h, w=w, n_rand=nrand, use_adam=True, adam_lr=1e-3,
                        epsilon=8.0, adv_iters=iters)
    step = jax.jit(make_attack_step(bundle, rcfg, acfg))
    target = {"camera": jnp.asarray(target_cam), "rgb": jnp.asarray(target_rgb),
              "depth": None, "depth_range": jnp.asarray(depth_range)}
    src = {"rgbs": jnp.asarray(src_rgbs), "cameras": jnp.asarray(src_cams),
           "featmaps_clean": None}
    state = init_attack_state(jax.random.PRNGKey(1), acfg, src["rgbs"])
    losses = []
    for it in range(iters):
        state, aux = step(state, target, src, jax.random.PRNGKey(100 + it))
        losses.append(float(aux["loss"]))
    return np.array(losses)


def test_bf16_feature_attack_efficacy():
    f32 = _run_attack("float32")
    bf16 = _run_attack("bfloat16")
    # both attacks must actually climb
    assert f32[-1] > f32[0] * 1.05, (f32[0], f32[-1])
    assert bf16[-1] > bf16[0] * 1.05, (bf16[0], bf16[-1])
    ratio = bf16[-5:].mean() / f32[-5:].mean()
    assert 0.7 < ratio < 1.4, ratio

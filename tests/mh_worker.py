"""One process of a multi-process (multi-host-style) CPU run.

Drives the REAL multi-host path (nerfool_tpu/parallel/distributed.py): the
torch-DDP env:// rendezvous the reference's launcher exports
(/root/reference/train.py:360-363) mapped onto jax.distributed.initialize,
a global 8-device ray mesh spanning every process, make_global assembly of
process-local data, then ONE full attack step and ONE backbone-training step
with rays sharded over the global mesh — the GSPMD gradient psums cross
process boundaries (gloo on CPU; ICI on a real pod).

WORLD_SIZE=1 runs the identical program single-process (the exact-no-op
degradation documented in distributed.py), so the driving test can assert the
multi-process result equals the single-process one.

Usage: python mh_worker.py RANK WORLD PORT OUTDIR
(not a pytest file — launched by tests/test_multihost.py)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank, world, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    total_devices = 8
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count="
                 f"{total_devices // world}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    # the torch-DDP launcher convention, exactly what distributed._env_spec
    # consumes (WORLD_SIZE=1 must resolve to the single-process no-op)
    os.environ["MASTER_ADDR"] = "localhost"
    os.environ["MASTER_PORT"] = port
    os.environ["WORLD_SIZE"] = str(world)
    os.environ["RANK"] = str(rank)

    import jax

    # the axon sitecustomize registers the relay backend above JAX_PLATFORMS;
    # force the virtual CPU mesh the way tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from nerfool_tpu.parallel import distributed as dist
    from nerfool_tpu.parallel.mesh import get_mesh, replicate, shard_rays

    pi, pc = dist.initialize()
    assert (pi, pc) == (rank, world), (pi, pc)
    assert jax.device_count() == total_devices, jax.device_count()
    assert dist.is_main_process() == (rank == 0)

    # host_shard must tile the global ray axis exactly across the world
    n_probe = 1000
    slices = [dist.host_shard(n_probe, r, world) for r in range(world)]
    covered = sorted(i for s in slices for i in range(n_probe)[s])
    assert covered == list(range(n_probe))

    from __graft_entry__ import _synthetic_inputs
    from nerfool_tpu.attack.attack import (
        AttackConfig, init_attack_state, make_attack_step)
    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.train.trainer import TrainConfig, make_train_step

    mesh = get_mesh(total_devices)
    rs = shard_rays(mesh)
    rep = replicate(mesh)

    def glob(x):
        return dist.make_global(rep, np.asarray(x))

    target_cam, src_rgbs, src_cams, depth_range, (h, w) = _synthetic_inputs()
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(0))
    render_cfg = RenderConfig(n_samples=8, n_importance=8, det=True,
                              backbone="ibrnet")
    cfg = AttackConfig(h=h, w=w, n_rand=16 * total_devices, use_adam=True,
                       adam_lr=1e-3)

    feats_clean = jax.device_get(
        bundle.extract_features(jnp.asarray(src_rgbs)))
    target = {
        "camera": glob(target_cam),
        "rgb": glob(np.random.RandomState(0).rand(h * w, 3).astype(np.float32)),
        "depth": None,
        "depth_range": glob(depth_range),
    }
    src = {
        "rgbs": glob(src_rgbs),
        "cameras": glob(src_cams),
        "featmaps_clean": jax.tree.map(glob, feats_clean),
    }
    import dataclasses

    params = jax.tree.map(glob, jax.device_get(bundle.params))
    bundle = dataclasses.replace(bundle, params=params)

    step = make_attack_step(bundle, render_cfg, cfg, ray_sharding=rs)
    state = jax.tree.map(glob, jax.device_get(
        init_attack_state(jax.random.PRNGKey(1), cfg, np.asarray(src_rgbs))))
    with mesh:
        state, aux = jax.jit(step)(
            state, target, src, np.asarray(jax.device_get(
                jax.random.PRNGKey(2))))
        jax.block_until_ready(state["delta"])
    attack_loss = float(aux["loss"])
    delta_sum = float(jnp.abs(state["delta"]).sum())

    tcfg = TrainConfig(h=h, w=w, n_rand=16 * total_devices)
    train_step, opt = make_train_step(bundle, render_cfg, tcfg,
                                      ray_sharding=rs)
    batch = {
        "camera": target["camera"], "rgb": target["rgb"],
        "depth_range": target["depth_range"],
        "src_rgbs": src["rgbs"], "src_cameras": src["cameras"],
    }
    opt_state = jax.tree.map(glob, jax.device_get(
        opt.init(jax.device_get(params))))
    with mesh:
        params2, opt_state, taux = jax.jit(train_step)(
            params, opt_state, batch,
            np.asarray(jax.device_get(jax.random.PRNGKey(3))))
        jax.block_until_ready(taux["loss"])
    train_loss = float(taux["loss"])
    param_sum = float(jax.tree.reduce(
        lambda a, x: a + jnp.abs(x).sum(), params2, jnp.float32(0.0)))

    out = {
        "rank": rank, "world": world,
        "attack_loss": attack_loss, "delta_sum": delta_sum,
        "train_loss": train_loss, "param_sum": param_sum,
        "seed": dist.host_seed(777), "main": dist.is_main_process(),
    }
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump(out, f)
    print(f"mh_worker rank={rank}/{world} OK {out}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Backbone training entry point (equivalent of /root/reference/train.py).

Supports plain training and adversarial training (--use_adv_train) with the
same flags; data parallelism is ray-axis sharding over the TPU mesh rather
than DDP processes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfool_tpu.config import config_parser
from nerfool_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    args = config_parser().parse_args()
    from nerfool_tpu.utils.platform import apply_precision

    apply_precision(args)

    import jax

    from nerfool_tpu.parallel.distributed import (
        host_seed, initialize, is_main_process,
    )

    # multi-host rendezvous (reference train.py:360-363 env:// DDP init);
    # exact no-op single-process
    proc_idx, proc_cnt = initialize(args)
    if proc_cnt > 1:
        print(f"process {proc_idx}/{proc_cnt}: "
              f"{len(jax.local_devices())} local / {len(jax.devices())} global chips")

    from nerfool_tpu.data import create_training_dataset
    from nerfool_tpu.data.base import Loader
    from nerfool_tpu.models.bundle import create_model, default_render_config
    from nerfool_tpu.train.trainer import TrainConfig, Trainer, aggregator_lr

    dataset = create_training_dataset(args)
    sample = dataset[0]
    h, w = int(sample["camera"][0]), int(sample["camera"][1])

    bundle = create_model(args=args, backbone=args.backbone,
                          ckpt_path=args.ckpt_path or None)
    render_cfg = default_render_config(args, backbone=args.backbone)
    # scale N_rand by source-view count as the reference does (train.py:113)
    n_rand = int(1.0 * args.N_rand * args.num_source_views
                 / max(sample["src_rgbs"].shape[0], 1))
    cfg = TrainConfig(
        h=h, w=w, n_rand=n_rand,
        sample_mode=args.sample_mode, center_ratio=args.center_ratio,
        lrate_feature=args.lrate_feature, lrate_mlp=aggregator_lr(args),
        lrate_decay_factor=args.lrate_decay_factor,
        lrate_decay_steps=args.lrate_decay_steps,
        depth_var_loss=args.depth_var_loss,
        use_adv_train=args.use_adv_train, adv_iters=args.adv_iters,
        epsilon=float(args.epsilon), adv_lr=args.adv_lr,
    )
    out_dir = os.path.join(args.out_dir, args.expname)
    from nerfool_tpu.utils.logging import save_code_snapshot, save_run_config

    save_run_config(out_dir, args)
    save_code_snapshot(out_dir)
    # multi-chip: shard the ray axis over all devices (the reference's DDP
    # equivalent; --distributed forces it on, single-device runs skip it)
    ray_sharding = None
    if args.distributed or len(jax.devices()) > 1:
        from nerfool_tpu.parallel.mesh import get_mesh, shard_rays

        mesh = get_mesh()
        ray_sharding = shard_rays(mesh)
        print(f"training with ray-axis sharding over {mesh.devices.size} devices")
    trainer = Trainer(bundle, render_cfg, cfg, out_dir=out_dir,
                      ray_sharding=ray_sharding)
    if not args.no_reload:
        start = trainer.load_latest(load_opt=not args.no_load_opt)
        print(f"resuming from step {start}")

    # per-host view streams: each process trains on a decorrelated shuffle
    # (the reference's per-rank DistributedSampler,
    # create_training_dataset.py:55-97)
    loader = Loader(dataset, shuffle=True, seed=host_seed(777),
                    num_workers=args.workers, infinite=True)
    # i_img validation panels: render full frames from the training stream
    # (the reference samples a val view each i_img steps, train.py:226-241)
    from nerfool_tpu.utils.logging import ScalarLogger

    logger = ScalarLogger(out_dir, "train") if is_main_process() else None
    val_loader = Loader(dataset, shuffle=True, seed=880, num_workers=1,
                        infinite=True)
    trainer.train(
        iter(loader), args.n_iters,
        key=jax.random.PRNGKey(args.local_rank + proc_idx),
        i_print=args.i_print, i_weights=args.i_weights,
        # rank-0-only logging/ckpt cadence (reference train.py:202)
        i_img=args.i_img if is_main_process() else 0,
        val_iter=iter(val_loader), logger=logger,
    )
    if is_main_process():
        trainer.save(trainer.start_step + args.n_iters)


if __name__ == "__main__":
    main()

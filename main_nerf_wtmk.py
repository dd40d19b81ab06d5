"""Watermark-stage CLI: embed a codebook message into a frozen clean NGP and
train the HiDDeN bit extractor; evaluate bit accuracy + image quality.

Drop-in analog of the reference's ``main_nerf_wtmk.py`` (same flags)."""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    from nerf_signature_tpu.utils.config import (
        add_common_args, add_wtmk_args, apply_O_macro,
    )

    add_common_args(parser)
    add_wtmk_args(parser)
    opt = apply_O_macro(parser.parse_args())
    print(opt)

    import jax

    if opt.cpu:
        jax.config.update("jax_platforms", "cpu")
    if opt.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    # multi-host: form the process group BEFORE the first device query
    # (no-op unless NGP_COORDINATOR is set; parallel/multihost.py)
    from nerf_signature_tpu.parallel.multihost import maybe_initialize

    maybe_initialize()

    from nerf_signature_tpu.api import WatermarkModel
    from nerf_signature_tpu.data.provider_wtmk import NeRFDatasetDisen
    from nerf_signature_tpu.models.ngp import NGPConfig
    from nerf_signature_tpu.models.watermark import WatermarkConfig
    from nerf_signature_tpu.train.metrics import (
        BitAccMeter, LPIPSMeter, PSNRMeter, SSIMMeter,
    )
    from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer

    wcfg = WatermarkConfig(
        ngp=NGPConfig(
            bound=opt.bound,
            compute_dtype=jax.numpy.bfloat16 if opt.fp16 else jax.numpy.float32,
            bg_radius=opt.bg_radius,
            stochastic_hash_grad=opt.stochastic_hash_grad,
            hash_level_stride=opt.hash_level_stride,
            dense_coarse=opt.dense_coarse,
            n_levels=opt.n_levels,
            n_features=opt.n_features,
        ),
        message_dim=opt.message_dim,
        n_views=opt.n_views,
        hash_select=opt.hash_select,
        whole_image=opt.whole_image_wm,
        copyrnerf=opt.copyrnerf,
        copyrnerf_replace=getattr(opt, "copyrnerf_replace", False),
        finetune_decoder=opt.finetune_decoder,
    )
    model = WatermarkModel(
        wcfg, cuda_ray=opt.cuda_ray, min_near=opt.min_near,
        density_thresh=opt.density_thresh, bg_radius=opt.bg_radius,
        dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
        grid_size=opt.grid_size, seed=opt.seed,
        train_budget=opt.train_budget, infer_budget=opt.infer_budget,
        compact_frac=max(0.0, opt.compact_frac), t_cull=opt.t_cull,
    )

    trainer = WatermarkTrainer(
        "ngp", opt, model, workspace=opt.workspace,
        metrics=[PSNRMeter(), LPIPSMeter(weights_path=opt.lpips_weights), SSIMMeter()],
        metrics_message=[BitAccMeter()],
        eval_interval=opt.eval_interval, save_interval=opt.save_interval,
        use_checkpoint=opt.ckpt,
    )

    keyposes = os.path.join(opt.workspace, "key_poses.npy")
    keyblocks = os.path.join(opt.workspace, "key_blocks.npy")

    # pseudo-GT disk cache defaults into the workspace: the self-distillation
    # pool is a full render of every train view through the frozen backbone
    # (~13 min at headline scale through the relay), and the fingerprint
    # check already invalidates it when the backbone/poses change — there is
    # no reason to re-render it on every relaunch/resume.
    if opt.pseudo_gt_cache is None and opt.workspace:
        os.makedirs(opt.workspace, exist_ok=True)
        opt.pseudo_gt_cache = os.path.join(opt.workspace, "pseudo_gt.npz")

    def make_loader(type, n_views, n_test, fresh_keys=False):
        return NeRFDatasetDisen(
            opt,
            keyposes_dir=None if fresh_keys else keyposes,
            keyposes_save_dir=keyposes if fresh_keys else None,
            keyblocks_dir=None if fresh_keys else keyblocks,
            keyblocks_save_dir=keyblocks if fresh_keys else None,
            pretrained_model=model, downscale=opt.downscale, type=type,
            n_views=n_views, n_test=n_test, message_dim=opt.message_dim,
            num_rows=opt.num_rows, num_cols=opt.num_cols,
            use_existset=opt.use_existset,
        ).dataloader()

    if opt.test:
        if not getattr(trainer, "_wm_state_loaded", False):
            # an explicit --ckpt pointing at a CLEAN-stage checkpoint loads
            # only the backbone; msg tables + decoder stay at init and every
            # bit-accuracy below will be chance.  The wm state lives in the
            # workspace ring — resolve it with --ckpt latest.
            print(
                "[warn] test mode with a freshly-initialised watermark "
                "state (the --ckpt file held no msg/decoder weights): "
                "bit accuracy will be ~0.5. Use --ckpt latest (or point "
                "--ckpt at a watermark-stage checkpoint).", flush=True,
            )
        trainer.test_bitacc(make_loader("test", opt.n_views, opt.n_test_bitacc))
        if opt.attack_suite:
            from nerf_signature_tpu.train.attack import attack_sweep
            n_atk = getattr(opt, "n_test_attack", 50)
            attack_sweep(trainer, make_loader("test", opt.n_views, n_atk),
                         n_test=n_atk)
        # one train loader (pseudo-GT renders are expensive) shared by both
        # parameter-space attacks
        attack_loader = (
            make_loader("train", opt.n_views, 100)
            if (opt.adv_attack or opt.finetune_attack) else None
        )
        if opt.adv_attack:
            from nerf_signature_tpu.train.attack import parameter_attack
            attacked = parameter_attack(
                trainer, attack_loader, epsilon=opt.adv_epsilon,
                steps=opt.adv_steps, num_rays=opt.num_rays,
            )
            original = model.trainable
            model.trainable = attacked
            trainer.log("[adv_attack] bit accuracy AFTER epsilon-ball attack:")
            trainer.test_bitacc(make_loader("test", opt.n_views, opt.n_test_bitacc))
            model.trainable = original
        if opt.finetune_attack:
            from nerf_signature_tpu.train.attack import finetune_attack
            attacked_bb = finetune_attack(
                trainer, attack_loader, steps=opt.finetune_attack_steps,
                lr=opt.finetune_attack_lr, num_rays=opt.num_rays,
                full_backbone=opt.finetune_attack_full,
            )
            original_bb = model.backbone
            model.backbone = attacked_bb
            trainer.log("[finetune_attack] bit accuracy AFTER backbone "
                        "finetuning attack:")
            trainer.test_bitacc(make_loader("test", opt.n_views, opt.n_test_bitacc))
            if opt.num_images_test > 0:
                trainer.test_image(
                    make_loader("test_image", opt.num_images_test, 4),
                    name="test_image_after_finetune_attack",
                )
            model.backbone = original_bb
        # --num_images_test 0 skips the image-quality renders entirely
        # (bit-accuracy-only evaluation)
        if opt.num_images_test > 0:
            trainer.test_image(
                make_loader("test_image", opt.num_images_test, 4),
                name="test_image_from_randomviews",
            )
            trainer.test_image(
                make_loader("test_image_testviews", opt.num_images_test, 4),
                name="test_image_from_testviews",
            )
    else:
        fresh = not os.path.exists(keyposes)
        train_loader = make_loader("train", opt.n_views, 100, fresh_keys=fresh)
        # --compact_frac -1: occupancy is frozen in the wm stage, so auto
        # mode resolves once from a probe render (clean CLI adapts in-loop)
        trainer.resolve_auto_compaction(train_loader)
        test_bitacc_loader = make_loader("test", opt.n_views, opt.n_test_bitacc)
        test_image_loader = make_loader("test_image", opt.num_images_test, 4)
        if opt.steps_per_dispatch > 0:
            trainer.train_device(
                train_loader, opt.iters,
                steps_per_dispatch=opt.steps_per_dispatch,
                test_image_loader=test_image_loader,
                test_bitacc_loader=test_bitacc_loader,
            )
        else:
            total = opt.iters + getattr(opt, "wm_polish_iters", 0)
            max_epoch = int(np.ceil(total / len(train_loader)))
            trainer.train(train_loader, test_image_loader,
                          test_bitacc_loader, max_epoch)
        trainer.test_image(
            make_loader("test_image_testviews", opt.num_images_test, 4),
            name="test_image_from_testviews",
        )


if __name__ == "__main__":
    main()

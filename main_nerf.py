"""Clean-stage CLI: train / test an instant-NGP NeRF on TPU.

Drop-in analog of the reference's ``main_nerf.py`` with the same flag
surface (see ``nerf_signature_tpu/utils/config.py``)."""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    from nerf_signature_tpu.utils.config import add_common_args, apply_O_macro

    add_common_args(parser)
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

    from nerf_signature_tpu.api import NGPModel
    from nerf_signature_tpu.data.provider import NeRFDataset
    from nerf_signature_tpu.models.ngp import NGPConfig
    from nerf_signature_tpu.train.metrics import PSNRMeter, LPIPSMeter
    from nerf_signature_tpu.train.trainer import Trainer

    cfg = NGPConfig(
        bound=opt.bound,
        compute_dtype=jax.numpy.bfloat16 if opt.fp16 else jax.numpy.float32,
        bg_radius=opt.bg_radius,
        stochastic_hash_grad=opt.stochastic_hash_grad,
        hash_level_stride=opt.hash_level_stride,
        dense_coarse=opt.dense_coarse,
        n_levels=opt.n_levels,
        n_features=opt.n_features,
    )
    model = NGPModel(
        cfg, cuda_ray=opt.cuda_ray, min_near=opt.min_near,
        density_thresh=opt.density_thresh, bg_radius=opt.bg_radius,
        dt_gamma=opt.dt_gamma, max_steps=opt.max_steps,
        grid_size=opt.grid_size, seed=opt.seed,
        train_budget=opt.train_budget, infer_budget=opt.infer_budget,
        compact_frac=max(0.0, opt.compact_frac), t_cull=opt.t_cull,
        num_steps=opt.num_steps, upsample_steps=opt.upsample_steps,
    )

    metrics = [PSNRMeter(), LPIPSMeter(weights_path=opt.lpips_weights)]

    if opt.gui:
        # interactive browser viewer (replaces the reference's dearpygui
        # window, nerf/gui.py) — drag to orbit, train start/stop in-page
        from nerf_signature_tpu.viewer_server import ViewerServer

        trainer = Trainer("ngp", opt, model, workspace=opt.workspace,
                          ema_decay=0.95, metrics=metrics,
                          use_checkpoint=opt.ckpt, eval_interval=50)
        train_loader = (
            NeRFDataset(opt, type="train").dataloader()
            if not opt.test else None
        )
        ViewerServer(trainer, train_loader, W=opt.W, H=opt.H,
                     radius=opt.radius, fovy=opt.fovy,
                     max_spp=opt.max_spp).serve()
        return

    if opt.test:
        trainer = Trainer("ngp", opt, model, workspace=opt.workspace,
                          metrics=metrics, use_checkpoint=opt.ckpt)
        if opt.mesh_only:
            from nerf_signature_tpu.meshing import save_mesh

            save_mesh(model, f"{opt.workspace}/mesh.ply",
                      resolution=opt.mesh_resolution, threshold=10)
            trainer.log(f"[mesh] wrote {opt.workspace}/mesh.ply")
            return
        test_loader = NeRFDataset(opt, type="test").dataloader()
        if test_loader.has_gt:
            trainer.evaluate_one_epoch(test_loader)
        frames = trainer.test(test_loader, write_video=True)
        if opt.prewatermark:
            # decode the owner message from the rendered views
            from nerf_signature_tpu.models.hidden import (
                HiddenDecoderSingleConfig, init_hidden_decoder_single,
            )
            from nerf_signature_tpu.train.checkpoint import (
                load_checkpoint, restore_like,
            )
            from nerf_signature_tpu.train.prewatermark import bit_survival

            art = load_checkpoint(
                os.path.join(opt.workspace, "prewatermark.ckpt"))
            dec_cfg = HiddenDecoderSingleConfig(
                num_blocks=int(art.get("dec_blocks", 8)),
                num_bits=int(art.get("num_bits", opt.prewatermark_bits)),
                channels=int(art.get("channels", 64)),
            )
            tp, ts = init_hidden_decoder_single(jax.random.PRNGKey(0),
                                                dec_cfg)
            dec = restore_like({"params": tp, "state": ts}, art["decoder"])
            renders = np.stack(frames).astype(np.float32) / 255.0
            acc, per_view = bit_survival(dec, dec_cfg, renders,
                                         art["message"])
            trainer.log(f"[prewatermark] bit survival over {len(per_view)} "
                        f"rendered views: {acc:.4f}")
        from nerf_signature_tpu.meshing import save_mesh
        save_mesh(model, f"{opt.workspace}/mesh.ply",
                  resolution=opt.mesh_resolution, threshold=10)
    else:
        train_set = NeRFDataset(opt, type="train")
        if opt.prewatermark:
            from nerf_signature_tpu.train.checkpoint import save_checkpoint
            from nerf_signature_tpu.train.prewatermark import (
                pretrain_hidden, watermark_images,
            )

            rng = np.random.default_rng(opt.seed)
            message = rng.integers(0, 2, opt.prewatermark_bits)
            imgs = train_set.images.astype(np.float32)
            if imgs.shape[-1] == 4:
                # composite over the white eval background BEFORE embedding:
                # the trainer's GT compose rgb*a + bg*(1-a) would otherwise
                # erase the watermark wherever alpha < 1, and the decoder
                # must see the same background domain the renders have
                imgs = imgs[..., :3] * imgs[..., 3:] + (1.0 - imgs[..., 3:])
            enc, dec, enc_cfg, dec_cfg = pretrain_hidden(
                imgs, opt.prewatermark_bits, steps=opt.prewatermark_steps,
                strength=opt.prewatermark_strength, seed=opt.seed,
            )
            wm = watermark_images(enc, enc_cfg, imgs, message,
                                  strength=opt.prewatermark_strength)
            train_set.images = wm  # 3-channel: bg already composited in
            os.makedirs(opt.workspace, exist_ok=True)
            save_checkpoint(
                os.path.join(opt.workspace, "prewatermark.ckpt"),
                {"decoder": dec, "encoder": enc, "message": message,
                 "dec_blocks": dec_cfg.num_blocks,
                 "channels": dec_cfg.channels,
                 "num_bits": dec_cfg.num_bits},
            )
        train_loader = train_set.dataloader()
        valid_loader = NeRFDataset(opt, type="val", downscale=1).dataloader()
        trainer = Trainer("ngp", opt, model, workspace=opt.workspace,
                          ema_decay=0.95, metrics=metrics,
                          use_checkpoint=opt.ckpt, eval_interval=50)
        if opt.profile:
            import jax.profiler
            os.makedirs(f"{opt.workspace}/profile", exist_ok=True)
            jax.profiler.start_trace(f"{opt.workspace}/profile")
        if opt.steps_per_dispatch > 0:
            trainer.train_device(
                train_loader, opt.iters,
                steps_per_dispatch=opt.steps_per_dispatch,
            )
            trainer.evaluate_one_epoch(valid_loader)
        else:
            max_epoch = int(np.ceil(opt.iters / len(train_loader)))
            trainer.train(train_loader, valid_loader, max_epoch)
        if opt.profile:
            jax.profiler.stop_trace()


if __name__ == "__main__":
    main()

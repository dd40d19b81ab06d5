"""Benchmark: clean-NGP training throughput (rays/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — by
default the primary metric is the clean-train rate, with the staged-render
and wm-stage rates included as extra keys ("render_rays_per_sec",
"wm_train_rays_per_sec") so all three modes land on the per-round record.

Protocol: the training loop runs FULLY ON DEVICE — K steps per dispatch via
``lax.scan`` (``train/device_loop.py``), with pose choice, pixel sampling,
ray generation, occupancy-grid maintenance, march, field, composite, loss,
Adam and EMA all inside one XLA program; the per-step losses are fetched to
host at the end (forcing materialisation, so the wall-clock is honest).
Per-call dispatch latency environments (e.g. tunneled PJRT) would otherwise
measure the transport, not the framework.

Baseline: the reference (torch-ngp + tcnn + CUDA marching) publishes no
numbers in-repo (BASELINE.md); community-measured torch-ngp training
throughput on an A100 at the headline config (4096 rays/step, Blender-scale
scene) is ~2e5 rays/sec.  The north-star target is >2x that per TPU chip
(BASELINE.json), so vs_baseline = value / 4e5: >1.0 beats the target.

Scene: synthetic textured ball (no datasets are vendored) with a converged-
scene-like occupancy (~6.5% cells), headline shapes (4096 rays/step, budget
128, grid 128^3, 16-level 2^19 hash table, bf16 compute).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 4.0e5  # 2x A100 torch-ngp estimate (see docstring)
# steps/dispatch: clamped at runtime by utils/dispatch.max_scan_steps —
# a 32-step scan program reproducibly crashes the tunneled TPU worker
# (kernel fault in the relay); 8 is stable and amortises dispatch well
# enough (measured within ~1% of the 32-step rate when both complete).
N_STEPS = int(os.environ.get("BENCH_STEPS", "8"))  # per dispatch (pre-clamp)


def make_ball_images(poses, intrinsics, H, W):
    """Synthetic textured-ball RGBA views (the bench scene) for given poses."""
    from nerf_signature_tpu.data.rays import get_rays

    images = []
    for p in poses:
        rays = get_rays(p[None], intrinsics, H, W, -1)
        o, d = rays["rays_o"][0], rays["rays_d"][0]
        b = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - 0.4**2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        pt = o + t[..., None] * d
        rgba = np.zeros((o.shape[0], 4), np.float32)
        rgba[:, 0] = np.where(hit, 0.6 + 0.4 * np.sin(8 * pt[:, 0]), 0)
        rgba[:, 1] = np.where(hit, 0.5 + 0.5 * np.cos(7 * pt[:, 1]), 0)
        rgba[:, 2] = np.where(hit, 0.3, 0)
        rgba[:, 3] = hit
        images.append(np.clip(rgba, 0, 1))
    return np.stack(images)


def main():
    if os.environ.get("BENCH_MATRIX") == "1":
        return run_matrix()
    from nerf_signature_tpu.data.rays import get_rays, rand_poses
    from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
    from nerf_signature_tpu.ops.grid import init_occupancy_grid
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.device_loop import device_train_loop
    from nerf_signature_tpu.train.trainer import make_optimizer

    # stochastic_hash_grad: exact forward, one-corner unbiased-stochastic
    # table gradients — 3.3x step speedup with demonstrated-equal e2e
    # convergence (PERF.md, tests/test_stochastic_grad.py).  BENCH_EXACT=1
    # benches the exact-gradient path instead.
    cfg = NGPConfig(
        bound=1.0, compute_dtype=jnp.bfloat16,
        stochastic_hash_grad=os.environ.get("BENCH_EXACT") != "1",
        # BENCH_LEVELS / BENCH_FEATURES: table-geometry A/B at the same
        # enc_dim (e.g. 8x4 or 4x8 vs the reference's 16x2) — halving levels
        # halves BOTH the dominant forward-gather and backward-scatter index
        # counts exactly, with zero estimator variance (VERDICT r4 #1b).
        n_levels=int(os.environ.get("BENCH_LEVELS", "16")),
        n_features=int(os.environ.get("BENCH_FEATURES", "2")),
        # BENCH_LEVEL_STRIDE=2: backward hash-gradient level subsampling
        # (unbiased; halves the step's largest term — see PERF.md round 3)
        hash_level_stride=int(os.environ.get("BENCH_LEVEL_STRIDE", "1")),
        # BENCH_FWD_CORNERS=1: forward corner subsampling — gather only the
        # weight-sampled corner per (level, sample) inside the train step
        # (unbiased one-sample estimate, 8x fewer forward gather rows; the
        # round-4 population-reduction A/B, see PERF.md)
        hash_fwd_corners=int(os.environ.get("BENCH_FWD_CORNERS", "8")),
        # BENCH_DENSE=1: tcnn-style dense coarse levels (A/B the gather
        # locality win; see ops.hashenc.level_sides)
        dense_coarse=os.environ.get("BENCH_DENSE") == "1",
    )
    if cfg.hash_fwd_corners != 8 and not cfg.stochastic_hash_grad:
        raise SystemExit("BENCH_FWD_CORNERS=1 requires the stochastic-grad "
                         "path (unset BENCH_EXACT)")
    # BENCH_COMPACT=<frac>: global sample compaction — pack occupied samples
    # across the batch before the field (renderer.compact_frac; measured
    # 13% mask fill on this scene, so the field otherwise computes ~7.6x
    # more samples than exist).  Default 0.25 = what --compact_frac -1
    # (auto) settles on at this occupancy; measured sweep on-chip:
    # 0 -> 7.9k, 0.25 -> 19.3k (2.43x), 0.5 -> 12.4k rays/s (PERF.md).
    # BENCH_T_CULL: march-time transmittance cull (population lever —
    # samples entering at proxy T below the threshold have exactly zero
    # weight AND gradient in the composite; ops/marching.py t_cull).
    # Train-step only (eval/decode paths pin t_cull=0), and fog-gated like
    # the product trainer: the warmup below runs EXACT and the cull turns on
    # only for the adapted/measured regime (trainer._rc_train).
    # DEFAULT follows the product default (--t_cull 0 — the r5 post-mortem
    # reverted the brief 1e-5 default after a 1200-it campaign regression;
    # PERF.md) so the driver's plain `python bench.py` measures the
    # framework as shipped.  BENCH_T_CULL=1e-5 measures the opt-in lever
    # (41.0k rays/s on the r5 ladder, vs 23.9k exact-adapted).
    t_cull_req = float(os.environ.get("BENCH_T_CULL", "0"))
    rc = RenderConfig(
        bound=1.0, grid_size=128, max_steps=1024,
        compact_frac=float(os.environ.get("BENCH_COMPACT", "0.25")),
        t_cull=0.0,
    )
    # BENCH_BUDGET: static per-ray march budget (the trainer auto-adapts it
    # to the 1.5x-mean occupancy bucket; population levers like t_cull lower
    # the occupied count, so their harvest shows up only when budget AND
    # compact_frac follow — sweep them together, see 015_tcull_compact)
    n_rays, budget = 4096, int(os.environ.get("BENCH_BUDGET", "128"))
    H = W = 256
    n_poses = 16
    from nerf_signature_tpu.utils.dispatch import max_scan_steps
    n_steps = max_scan_steps(N_STEPS)

    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    occ = init_occupancy_grid(1.0, rc.grid_size)

    # synthetic dataset: textured ball, RGBA, orbit poses
    rng = np.random.default_rng(0)
    poses = rand_poses(rng, n_poses, radius=1.8)
    intrinsics = np.array([W / 1.2, W / 1.2, W / 2, H / 2], np.float32)
    images = jnp.asarray(make_ball_images(poses, intrinsics, H, W))
    poses_d = jnp.asarray(poses)
    intr_d = jnp.asarray(intrinsics)

    # density_thresh 10 = the real-scene recipe value every campaign uses
    # (0.01, the device-loop default, NEVER prunes this scene — the
    # documented fog deadlock; every bench before round 5 timed that fog)
    dthresh = float(os.environ.get("BENCH_DENSITY_THRESH", "10"))

    def run(params, ema, opt_state, occ, key, step0):
        return device_train_loop(
            params, ema, opt_state, occ, poses_d, images, intr_d, key,
            step0, cfg, rc, budget, optimizer.update, True, 0.95, n_steps,
            n_rays, H, W, density_thresh=dthresh,
        )

    # warmup/compile + let the grid converge.  One dispatch is NOT enough:
    # its grid update runs on the near-random field (everything above
    # thresh -> dense fog, mean occupied ~255/ray, capped by the prefilter
    # group budget) — the adaptation below must see the converged regime
    # the bench claims to measure, so run a few dispatches (updates at
    # steps 0, 16, 32... with a progressively trained field) before
    # reading the occupancy statistic.
    n_warm = int(os.environ.get("BENCH_WARMUP_DISPATCHES", "30"))
    for i in range(n_warm):
        out = run(params, ema, opt_state, occ, jax.random.PRNGKey(1 + i),
                  i * n_steps)
        params, ema, opt_state, occ = out[:4]
    mean_occ = float(np.asarray(out[5]))
    mean_groups = float(np.asarray(out[8]))
    np.asarray(out[4])  # force
    occ_frac = float(jnp.mean(occ.occupancy.astype(jnp.float32)))
    print(f"# bench warmup: {n_warm * n_steps} steps, grid occupancy "
          f"{occ_frac:.4f}, mean occupied/ray {mean_occ:.1f}, mean "
          f"occupied groups/ray {mean_groups:.1f}", flush=True)

    # BENCH_ADAPT (default on): re-pick the march-budget and compaction
    # buckets with the TRAINER's own auto-adaptation formulas
    # (trainer._adapt_budget: next pow2 >= 1.5x mean occupied, floor 32;
    # trainer._adapt_compaction: smallest bucket >= 1.5x fill) — so the
    # bench measures the framework as its defaults actually configure it
    # (--train_budget auto-adapts both ways, --compact_frac defaults to -1
    # auto).  Explicit BENCH_BUDGET/BENCH_COMPAT env pins win; BENCH_ADAPT=0
    # restores the historical fixed 128/0.25 protocol.
    import math as _math

    rc0, budget0 = rc, budget  # render/wm modes keep the un-adapted shapes
    if (os.environ.get("BENCH_ADAPT", "1") == "1"
            and "BENCH_BUDGET" not in os.environ
            and "BENCH_COMPACT" not in os.environ):
        # budget from the RAW (pre-cull) occupied mean — provisioning
        # follows geometry, never the culled survivors (the r5/03 finding:
        # survivor-provisioned budgets truncate real tail samples).  The
        # warmup above runs t_cull=0 (the product's fog gate keeps the cull
        # off until grid update 16 anyway), so out[9] == out[5] here.
        mean_raw = float(np.asarray(out[9]))
        budget = min(1 << max(5, _math.ceil(_math.log2(max(1.5 * mean_raw,
                                                           1.0)))), 1024)
        import dataclasses as _dc2

        # group-budget adaptation: same 1.5x-mean pow2 rule fed by the
        # UNCAPPED occupied-group statistic (trainer._adapt_group_budget;
        # --group_budget -1 is the product default).  BENCH_GROUP_BUDGET
        # pins it; 0 restores the marcher's static formula.
        from nerf_signature_tpu.ops.marching import num_candidates

        gb_env = os.environ.get("BENCH_GROUP_BUDGET")
        if gb_env is not None:
            gb = int(gb_env)
        else:
            gb = 1 << max(4, _math.ceil(_math.log2(max(1.5 * mean_groups,
                                                       1.0))))
            gb = min(gb, max(num_candidates(rc.bound, rc.max_steps,
                                            rc.dt_gamma) // 4, 1))
        rc = _dc2.replace(rc, group_budget=gb)
        # compaction from the SURVIVOR fill: with a cull requested, run one
        # dispatch at the new budget/group shapes WITH the cull to read the
        # survivor mean (what compaction actually packs), then set the
        # bucket — the product trainer reads the same live statistic.
        if t_cull_req > 0:
            rc = _dc2.replace(rc, t_cull=t_cull_req)
            out = run(params, ema, opt_state, occ, jax.random.PRNGKey(10),
                      n_warm * n_steps)
            params, ema, opt_state, occ = out[:4]
            mean_surv = float(np.asarray(out[5]))
            np.asarray(out[4])
        else:
            mean_surv = mean_raw
        fill = min(mean_surv, budget) / budget
        cb = min(1.0, _math.ceil(1.3 * fill * 16.0) / 16.0)
        rc = _dc2.replace(rc, compact_frac=0.0 if cb == 1.0 else cb)
        print(f"# bench adapt: raw {mean_raw:.1f} -> budget {budget}; "
              f"survivors {mean_surv:.1f} -> compact {cb}; groups "
              f"{mean_groups:.1f} -> group_budget {gb}", flush=True)
        # re-warm at the final shapes (fresh compile)
        out = run(params, ema, opt_state, occ, jax.random.PRNGKey(11),
                  (n_warm + 1) * n_steps)
        params, ema, opt_state, occ = out[:4]
        np.asarray(out[4])
    elif t_cull_req > 0:
        # pinned-shape arms: apply the requested cull directly
        import dataclasses as _dc3

        rc = _dc3.replace(rc, t_cull=t_cull_req)
        out = run(params, ema, opt_state, occ, jax.random.PRNGKey(11),
                  n_warm * n_steps)
        params, ema, opt_state, occ = out[:4]
        np.asarray(out[4])

    t0 = time.perf_counter()
    # step0 === 8 (mod 16): no grid maintenance inside the timed window,
    # matching the historical protocol
    out = run(params, ema, opt_state, occ, jax.random.PRNGKey(2),
              (n_warm + 1) * n_steps if n_warm % 2 == 0 else
              (n_warm + 2) * n_steps)
    losses = np.asarray(out[4])  # fetch all losses -> full materialisation
    dt = time.perf_counter() - t0
    assert np.isfinite(losses).all()
    # the device loop donates its inputs; rebind to the live buffers
    params, ema, opt_state, occ = out[:4]

    # mode selection: BENCH_RENDER=1 / BENCH_WM=1 print only that metric
    # (back-compat with the profiling scripts); the default run measures
    # ALL THREE modes and prints ONE JSON line whose primary metric is the
    # clean-train rate with the other two as extra keys — so every round's
    # BENCH_r*.json tracks every throughput mode (VERDICT r2 weak #7).
    # BENCH_TRAIN_ONLY=1 restores the train-only quick run.
    mode = ("render" if os.environ.get("BENCH_RENDER") == "1"
            else "wm" if os.environ.get("BENCH_WM") == "1"
            else "train" if os.environ.get("BENCH_TRAIN_ONLY") == "1"
            else "all")

    render_rps = wm_rps = None

    if mode in ("all", "render"):
        # inference throughput: staged occupancy render of a full 256x256
        # view through the trained params.  Dispatched as 4-chunk lax.map
        # programs (4 x 4096 rays x budget 128): large per-dispatch programs
        # (16-chunk maps, budget 256) hang/crash the tunneled worker
        # (PERF.md operational note), and this granularity matches what the
        # staged renderer ships in production.
        import functools

        from nerf_signature_tpu.api import _render_occ_clean_staged
        from nerf_signature_tpu.models.ngp import exact_field_cfg

        # renders are ALWAYS exact 8-corner interpolation, even when the
        # train loop above ran the BENCH_FWD_CORNERS=1 subsampled forward —
        # and always exact marching (t_cull pinned 0, matching the api
        # render paths' exactness contract)
        import dataclasses as _dc

        cfg_eval = exact_field_cfg(cfg)
        rc_eval = _dc.replace(rc0, t_cull=0.0) if rc0.t_cull else rc0
        rays = get_rays(poses[:1], intrinsics, H, W, -1)
        ro = np.asarray(rays["rays_o"][0].reshape(-1, 4, 4096, 3))
        rd = np.asarray(rays["rays_d"][0].reshape(-1, 4, 4096, 3))
        render = functools.partial(
            _render_occ_clean_staged, params, occ.occupancy,
            bg_color=1.0, cfg=cfg_eval, rc=rc_eval, budget=128,
        )
        float(jnp.sum(render(
            rays_o_chunks=jnp.asarray(ro[0]), rays_d_chunks=jnp.asarray(rd[0])
        )[0]))  # compile + warm
        t0 = time.perf_counter()
        s = 0.0
        for g in range(ro.shape[0]):
            s += float(jnp.sum(render(
                rays_o_chunks=jnp.asarray(ro[g]),
                rays_d_chunks=jnp.asarray(rd[g]),
            )[0]))  # materialise = barrier
        dt_r = time.perf_counter() - t0
        assert np.isfinite(s)
        render_rps = H * W / dt_r
        if mode == "render":
            print(json.dumps({
                "metric": "render_rays_per_sec",
                "value": round(render_rps, 1),
                "unit": "rays/s",
                "vs_baseline": round(render_rps / BASELINE_RAYS_PER_SEC, 3),
            }))
            return

    if mode in ("all", "wm"):
        # watermark-stage step throughput at the paper's headline shapes:
        # 16-bit message, 16 8x8 key blocks + 4096 content rays per step,
        # all inside the _wm_device_loop scan
        from nerf_signature_tpu.models.watermark import (
            WatermarkConfig, init_watermark_params,
        )
        from nerf_signature_tpu.train.trainer_wtmk import _wm_device_loop

        from nerf_signature_tpu.models.ngp import exact_field_cfg as _exact

        D, bh, bw = 16, 8, 8
        # the wm-mode bench measures the standard (exact-forward) wm step;
        # BENCH_WM_FWD_CORNERS=1 opts the wm step into the subsampled
        # forward (trainer-equivalent of --hash_fwd_corners 1)
        wm_ngp = (cfg if os.environ.get("BENCH_WM_FWD_CORNERS") == "1"
                  else _exact(cfg))
        wcfg = WatermarkConfig(ngp=wm_ngp, message_dim=D)
        p = init_watermark_params(jax.random.PRNGKey(0), wcfg)
        backbone = dict(p["backbone"], hash_table=params["hash_table"],
                        sigma_net=params["sigma_net"],
                        color_net=params["color_net"])
        wm_opt = make_optimizer(1e-2, 30000)
        wm_state = wm_opt.init(p["trainable"])
        # key blocks: ray bundles from the first pose's image corner grid
        rays = get_rays(poses[:1], intrinsics, H, W, -1)
        ro = rays["rays_o"][0].reshape(H, W, 3)
        rd = rays["rays_d"][0].reshape(H, W, 3)
        ro_b = jnp.asarray(np.stack(
            [ro[i * bh:(i + 1) * bh, :bw] for i in range(D)]))
        rd_b = jnp.asarray(np.stack(
            [rd[i * bh:(i + 1) * bh, :bw] for i in range(D)]))
        imgs3 = images[..., :3]

        # the wm step marches with the same t_cull as the clean step (in-step
        # block/content renders are train-time; ownership DECODE paths pin
        # t_cull=0 in the trainer)
        from nerf_signature_tpu.ops.grid import render_grid

        wm_grid = render_grid(occ, rc.t_cull)

        # the wm trainer auto-adapts budget/compaction exactly like the clean
        # trainer, so the wm mode benches the ADAPTED shapes (the shapes the
        # product actually dispatches); BENCH_WM_ADAPT=0 restores the
        # historical fixed-128/0.25 wm protocol for cross-round continuity.
        wm_rc, wm_budget = ((rc0, budget0)
                            if os.environ.get("BENCH_WM_ADAPT") == "0"
                            else (rc, budget))

        def run_wm(trainable, state, key):
            return _wm_device_loop(
                backbone, trainable, state, wm_grid, ro_b, rd_b,
                poses_d, imgs3, intr_d, key, jnp.float32(0.005),
                jnp.float32(1.0), wcfg, wm_rc, wm_budget, wm_budget,
                wm_opt.update, "none", "bce", n_steps, n_rays, H, W,
            )

        out = run_wm(p["trainable"], wm_state, jax.random.PRNGKey(3))
        np.asarray(out[2])  # compile + force
        trainable, wm_state = out[0], out[1]
        t0 = time.perf_counter()
        out = run_wm(trainable, wm_state, jax.random.PRNGKey(4))
        losses = np.asarray(out[2])
        dt_w = time.perf_counter() - t0
        assert np.isfinite(losses).all()
        wm_rps = (n_rays + D * bh * bw) * n_steps / dt_w
        if mode == "wm":
            print(json.dumps({
                "metric": "wm_train_rays_per_sec",
                "value": round(wm_rps, 1),
                "unit": "rays/s",
                "vs_baseline": round(wm_rps / BASELINE_RAYS_PER_SEC, 3),
            }))
            return

    rays_per_sec = n_rays * n_steps / dt
    record = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "budget": budget,
        "compact_frac": rc.compact_frac,
        "t_cull": rc.t_cull,
        "group_budget": rc.group_budget,
        "mean_occ": round(mean_occ, 1),
    }
    if render_rps is not None:
        record["render_rays_per_sec"] = round(render_rps, 1)
    if wm_rps is not None:
        record["wm_train_rays_per_sec"] = round(wm_rps, 1)
    print(json.dumps(record))


def run_matrix():
    """``BENCH_MATRIX=1``: throughput sweep {fresh vs converged occupancy}
    x {budget 64/128/256} x {cascade 1/2 (dt_gamma 0 / 1-128)}, plus a
    marginal-fit TRANSPORT-FREE staged-render rate (VERDICT r4 next #4:
    the single-cell bench is occupancy- and budget-sensitive by
    construction; this pins how the rate generalises, and separates the
    ~20%% per-dispatch relay tax from the chip render rate the way the
    train side's marginal fit does).  Prints ONE JSON line."""
    import functools

    from nerf_signature_tpu.api import _render_occ_clean_staged
    from nerf_signature_tpu.data.rays import get_rays, rand_poses
    from nerf_signature_tpu.models.ngp import (
        NGPConfig, exact_field_cfg, init_ngp_params,
    )
    from nerf_signature_tpu.ops.grid import init_occupancy_grid
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.device_loop import device_train_loop
    from nerf_signature_tpu.train.trainer import make_optimizer
    from nerf_signature_tpu.utils.dispatch import max_scan_steps

    n_rays = 4096
    H = W = 256
    n_steps = max_scan_steps(N_STEPS)
    intrinsics = np.array([W / 1.2, W / 1.2, W / 2, H / 2], np.float32)
    copy = functools.partial(jax.tree_util.tree_map, jnp.copy)
    cells = []
    render_stats = None

    for bound, dt_gamma in ((1.0, 0.0), (2.0, 1.0 / 128)):
        rng = np.random.default_rng(0)
        cfg = NGPConfig(bound=bound, compute_dtype=jnp.bfloat16,
                        stochastic_hash_grad=True)
        rc = RenderConfig(
            bound=bound, grid_size=128, max_steps=1024, dt_gamma=dt_gamma,
            compact_frac=float(os.environ.get("BENCH_COMPACT", "0.25")),
            t_cull=float(os.environ.get("BENCH_T_CULL", "0")),
        )
        poses = rand_poses(rng, 16, radius=1.8)
        images = jnp.asarray(make_ball_images(poses, intrinsics, H, W))
        poses_d, intr_d = jnp.asarray(poses), jnp.asarray(intrinsics)
        optimizer = make_optimizer(1e-2, 30000)

        params = init_ngp_params(jax.random.PRNGKey(0), cfg)
        opt_state = optimizer.init(params)
        ema = copy(params)
        occ = init_occupancy_grid(bound, rc.grid_size)

        def run(params, ema, opt_state, occ, key, step0, budget):
            return device_train_loop(
                params, ema, opt_state, occ, poses_d, images, intr_d, key,
                step0, cfg, rc, budget, optimizer.update, True, 0.95,
                n_steps, n_rays, H, W,
                density_thresh=float(
                    os.environ.get("BENCH_DENSITY_THRESH", "10")),
            )

        # one dispatch from scratch -> young-grid snapshot ("fresh": the
        # early-training occupancy regime, before pruning has bitten)
        out = run(params, ema, opt_state, occ, jax.random.PRNGKey(1), 0, 128)
        params, ema, opt_state, occ = out[:4]
        np.asarray(out[4])
        occ_fresh = copy(occ)
        # train on so the grid prunes toward the converged regime (~240
        # steps at density_thresh 10 measured 5.4% occupancy on this scene)
        n_conv = int(os.environ.get("BENCH_MATRIX_CONV_DISPATCHES", "30"))
        for i in range(n_conv):
            out = run(params, ema, opt_state, occ, jax.random.PRNGKey(2 + i),
                      (1 + i) * n_steps, 128)
            params, ema, opt_state, occ = out[:4]
        np.asarray(out[4])

        for occ_name, occ_s in (("fresh", occ_fresh), ("converged", occ)):
            frac = float(jnp.mean(occ_s.occupancy.astype(jnp.float32)))
            for budget in (64, 128, 256):
                # step0 === 1 (mod 16): no grid maintenance inside the timed
                # dispatch, matching the default bench's timed window
                o = run(copy(params), copy(ema), copy(opt_state),
                        copy(occ_s), jax.random.PRNGKey(91), 16001, budget)
                np.asarray(o[4])  # compile + warm
                t0 = time.perf_counter()
                o = run(copy(params), copy(ema), copy(opt_state),
                        copy(occ_s), jax.random.PRNGKey(92), 16001, budget)
                losses = np.asarray(o[4])
                dt = time.perf_counter() - t0
                assert np.isfinite(losses).all()
                cells.append({
                    "cascade_bound": bound, "dt_gamma": round(dt_gamma, 6),
                    "occ": occ_name, "occ_frac": round(frac, 4),
                    "budget": budget,
                    "train_rays_per_sec": round(n_rays * n_steps / dt, 1),
                })

        if bound == 1.0:
            # transport-free staged-render rate: time G group-dispatches
            # (4 chunks x 4096 rays each) for G in {1, 2, 4}, least-squares
            # the slope -> per-group chip time with the per-dispatch relay
            # tax in the intercept (the train side's marginal-fit protocol)
            cfg_eval = exact_field_cfg(cfg)
            rc_eval = (rc if rc.t_cull == 0 else
                       __import__("dataclasses").replace(rc, t_cull=0.0))
            rays = get_rays(poses[:1], intrinsics, H, W, -1)
            ro = np.asarray(rays["rays_o"][0].reshape(-1, 4, 4096, 3))
            rd = np.asarray(rays["rays_d"][0].reshape(-1, 4, 4096, 3))
            render = functools.partial(
                _render_occ_clean_staged, params, occ.occupancy,
                bg_color=1.0, cfg=cfg_eval, rc=rc_eval, budget=128,
            )
            float(jnp.sum(render(rays_o_chunks=jnp.asarray(ro[0]),
                                 rays_d_chunks=jnp.asarray(rd[0]))[0]))
            xs, ys = [], []
            for _ in range(2):
                for g_count in (1, 2, 4):
                    t0 = time.perf_counter()
                    s = 0.0
                    for g in range(g_count):
                        s += float(jnp.sum(render(
                            rays_o_chunks=jnp.asarray(ro[g]),
                            rays_d_chunks=jnp.asarray(rd[g]))[0]))
                    xs.append(g_count)
                    ys.append(time.perf_counter() - t0)
                    assert np.isfinite(s)
            slope, intercept = np.polyfit(np.asarray(xs, np.float64),
                                          np.asarray(ys, np.float64), 1)
            render_stats = {
                "render_rays_per_group": 4 * 4096,
                "render_marginal_s_per_group": round(float(slope), 4),
                "render_dispatch_tax_s": round(float(intercept), 4),
                "render_rays_per_sec_transport_free":
                    round(4 * 4096 / float(slope), 1),
            }

    best = max(c["train_rays_per_sec"] for c in cells)
    record = {
        "metric": "train_rays_per_sec_matrix_best",
        "value": best,
        "unit": "rays/s",
        "vs_baseline": round(best / BASELINE_RAYS_PER_SEC, 3),
        "matrix": cells,
    }
    if render_stats:
        record.update(render_stats)
    print(json.dumps(record))


if __name__ == "__main__":
    main()

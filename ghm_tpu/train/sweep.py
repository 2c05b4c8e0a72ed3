"""Sweep training CLI: train a whole p_flip grid as one compiled program.

TPU-native replacement for the reference's experiment scripts, which launch
20 background single-GPU processes per variant
(``scripts/experiments/exp_*_*.sh``).  Here the 20 models train
simultaneously via ``vmap`` over stacked transition tensors
(``ghm_tpu.parallel.sweep``), writing per-p checkpoints in the reference
folder layout.

Example (standard-TF CLIP sweep, equivalent to exp_clip_standardTF.sh)::

    python -m ghm_tpu.train.sweep --task=clip --job_name=CLIP \
        --p_list=0.02:0.40:0.02 \
        --clip_tmodel_nlayer=5 --clip_imodel_nlayer=5 \
        --clip_tmodel_deb=128 --clip_imodel_deb=128 --clip_layernorm=True \
        --clip_guide=False --lr_max=3e-4 --lr_min=3e-7 --total_iters=3000
"""

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ghm_tpu.parallel.sweep import (
    cdns_sweep_spec,
    clip_sweep_spec,
    nwp_sweep_spec,
    run_sweep,
    sdns_sweep_spec,
    snwp_sweep_spec,
)
from ghm_tpu.utils.config import (
    ClipModelConfig,
    DoubleTreeConfig,
    ModelConfig,
    UtilConfig,
    parse_config,
)
from ghm_tpu.utils.logger import gen_logger


@dataclass
class SweepConfig(UtilConfig, DoubleTreeConfig, ClipModelConfig, ModelConfig):
    task: Optional[str] = "clip"
    p_list: Optional[str] = "0.02:0.40:0.02"
    clip_feature: Optional[str] = "TF"
    sweep_shard: Optional[int] = 0  # models per compiled program (0 = all)
    job_name: Optional[str] = "sweep"
    resume: Optional[bool] = True   # continue from the sweep resume blob
    stop_after: Optional[int] = 0   # pause (resumable) after N iters; 0 = off
    mesh_devices: Optional[int] = 0  # shard models over N chips (0/1 = off)


def parse_p_list(spec: str):
    if ":" in spec:
        lo, hi, step = (float(x) for x in spec.split(":"))
        n = int(round((hi - lo) / step)) + 1
        return [round(lo + i * step, 4) for i in range(n)]
    return [float(x) for x in spec.split(",")]


def main(argv=None):
    cfg = parse_config(SweepConfig, argv)
    full_p_list = parse_p_list(cfg.p_list)
    logger = gen_logger(".", cfg, raw=True)
    logger.info(f"sweep task={cfg.task} over {len(full_p_list)} p values: "
                f"{full_p_list}")
    shard = cfg.sweep_shard or len(full_p_list)
    for lo in range(0, len(full_p_list), shard):
        p_list = full_p_list[lo : lo + shard]
        if len(full_p_list) > shard:
            logger.info(f"sweep shard {lo // shard + 1}: {p_list}")
        paused = _run_one(cfg, p_list, logger)
        if paused:
            logger.info("sweep paused (stop_after); relaunch to continue")
            break


def _model_name_and_total(cfg):
    """Checkpoint-folder model name and step count, cheaply (no spec build)."""
    if cfg.task == "clip":
        model_name = (f"L{cfg.clip_tmodel_nlayer}H{cfg.clip_tmodel_nhead}"
                      f"D{cfg.clip_tmodel_deb}_L{cfg.clip_imodel_nlayer}"
                      f"H{cfg.clip_imodel_nhead}D{cfg.clip_imodel_deb}")
        model_name = ("GT_" if cfg.clip_guide else "TF_") + model_name
        # Reference CLIP quirk: trains total_iters + 1 steps (train_CLIP.py:139).
        return model_name, cfg.total_iters + 1
    if cfg.task in ("cdns", "nwp"):
        model_name = f"L{cfg.n_model_layer}H{cfg.n_head}D{cfg.d_eb}"
        return ("GT_" if cfg.guide else "JT_") + model_name, cfg.total_iters
    if cfg.task in ("sdns", "snwp"):
        model_name = f"L{cfg.n_model_layer}H{cfg.n_head}D{cfg.d_eb}"
        prefix = ("GT_" if cfg.guide
                  else ("ShT_" if cfg.n_model_layer == 1 else "StT_"))
        return prefix + model_name, cfg.total_iters
    raise SystemExit(f"unknown sweep task {cfg.task!r}")


def _run_one(cfg, p_list, logger):
    model_name, total = _model_name_and_total(cfg)

    resume_path = None
    if cfg.resume and not cfg.raw:
        tag = (f"{cfg.task}_{model_name}_p{int(round(p_list[0] * 100))}"
               f"-{int(round(p_list[-1] * 100))}_T{total}")
        resume_path = os.path.join("logs", cfg.job_name, ".sweep_resume",
                                   tag + ".pkl")
        # Check completion BEFORE building the spec: the spec builders run the
        # 10k-sample Bayes Monte Carlo per p on device, which costs minutes
        # per shard — wasted work when a relaunched queue is only skipping
        # past grids it already finished.
        if os.path.exists(resume_path):
            from ghm_tpu.parallel.sweep import load_resume_blob

            if load_resume_blob(resume_path).get("done"):
                logger.info(f"sweep[{cfg.task}] already complete per "
                            f"{resume_path}; skipping (delete the blob to "
                            f"retrain)")
                return False

    if cfg.task == "clip":
        spec = clip_sweep_spec(cfg, p_list, model_name)
    elif cfg.task == "cdns":
        spec = cdns_sweep_spec(cfg, p_list, model_name)
    elif cfg.task == "nwp":
        spec = nwp_sweep_spec(cfg, p_list, model_name)
    else:  # sdns / snwp (validated in _model_name_and_total)
        builder = sdns_sweep_spec if cfg.task == "sdns" else snwp_sweep_spec
        spec = builder(cfg, p_list, model_name, clip_feature=cfg.clip_feature)

    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices > 1:
        import jax

        from ghm_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices()[:cfg.mesh_devices], axis_name="sweep")
        logger.info(f"sweep mesh: {len(p_list)} models over "
                    f"{cfg.mesh_devices} devices")

    for p, (b, s) in zip(p_list, spec.bayes):
        logger.info(f"p={p}: Bayes {b:.4f} (±{s:.4f})")
    params, results = run_sweep(
        spec, total_iters=total, lr_max=cfg.lr_max, lr_min=cfg.lr_min,
        warmup_iters=cfg.warmup_iters, max_norm=cfg.max_norm,
        log_interval=cfg.log_interval, eval_interval=cfg.eval_interval,
        seed=cfg.seed, logger=logger, save=not cfg.raw,
        resume_path=resume_path,
        stop_after=cfg.stop_after or None, mesh=mesh)
    paused = params is not None and results is None
    if not paused:
        logger.info("sweep complete")
    return paused


if __name__ == "__main__":
    main()

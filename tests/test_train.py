"""Trainer, checkpoint, sweep, and eval-layer integration tests (tiny scale)."""

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghm_tpu.optim import adamw_init
from ghm_tpu.train.tasks import (
    build_cdns_task,
    build_clip_task,
    build_cls_task,
    build_nwp_task,
    build_sequential_dns_task,
    build_sequential_nwp_task,
)
from ghm_tpu.train.trainer import Trainer
from ghm_tpu.utils import checkpoint as ckpt
from ghm_tpu.utils.config import (
    ClipModelConfig,
    DoubleTreeConfig,
    ModelConfig,
    TreeConfig,
    UtilConfig,
    parse_config,
)


@dataclass
class ClipCfg(UtilConfig, DoubleTreeConfig, ClipModelConfig):
    job_name: Optional[str] = "test"


@dataclass
class SingleCfg(UtilConfig, DoubleTreeConfig, ModelConfig):
    clip_feature: Optional[str] = "TF"
    job_name: Optional[str] = "test"


def tiny_clip_cfg(**kw):
    base = dict(n_ttree_layer=2, n_itree_layer=2, n_ttree_child=3,
                n_itree_child=3, p_ttree_flip=0.2, p_itree_flip=0.2, K=4,
                batch_size=8, clip_tmodel_nlayer=2, clip_imodel_nlayer=2,
                clip_tmodel_deb=64, clip_imodel_deb=64, clip_layernorm=True,
                clip_guide=False, lr_max=1e-3, lr_min=1e-6, total_iters=30,
                log_interval=10, eval_interval=20)
    base.update(kw)
    return ClipCfg(**base)


def tiny_single_cfg(**kw):
    base = dict(n_ttree_layer=2, n_itree_layer=2, n_ttree_child=3,
                n_itree_child=3, p_ttree_flip=0.2, p_itree_flip=0.2,
                sigma=1.0, batch_size=8, d_eb=64, n_model_layer=2,
                layernorm=True, guide=False, lr_max=1e-3, lr_min=1e-6,
                total_iters=20, log_interval=10, eval_interval=20)
    base.update(kw)
    return SingleCfg(**base)


class TestTrainer:
    def test_clip_loss_decreases_and_checkpoints(self, tmp_path):
        cfg = tiny_clip_cfg(total_iters=60)
        task, _, _ = build_clip_task(cfg, n_bayes=256)
        path = os.path.join(tmp_path, "run", "checkpoint.pth")
        trainer = Trainer(task, total_iters=cfg.total_iters, lr_max=cfg.lr_max,
                          lr_min=cfg.lr_min, log_interval=cfg.log_interval,
                          eval_interval=cfg.eval_interval, seed=224,
                          checkpoint_path=path, bayes=task.bayes)
        result = trainer.fit()
        early = result.loss_history[:10].mean()
        late = result.loss_history[-10:].mean()
        assert late < early, (early, late)
        assert os.path.exists(path)
        payload = ckpt.load_checkpoint(path)
        for key in ("tmodel_state_dict", "imodel_state_dict",
                    "optimizer_state_dict", "iter", "loss_history",
                    "ploss_history", "bayes"):
            assert key in payload, key
        assert int(payload["iter"]) == cfg.total_iters

    def test_resume_restores_iter(self, tmp_path):
        cfg = tiny_clip_cfg(total_iters=20)
        task, _, _ = build_clip_task(cfg, n_bayes=128)
        path = os.path.join(tmp_path, "run", "checkpoint.pth")
        trainer = Trainer(task, total_iters=20, lr_max=1e-3, lr_min=1e-6,
                          log_interval=10, eval_interval=10, seed=224,
                          checkpoint_path=path, bayes=task.bayes)
        trainer.fit()
        params, opt_state, start, prior = trainer.init_state(init_from="resume")
        assert start == 20
        assert int(np.asarray(opt_state.step)) == 20
        assert prior is not None and "loss_history" in prior

    def test_resume_matches_straight_run(self, tmp_path):
        """A 10+10 resumed run must equal a straight 20-iter run — params,
        loss history, and checkpointed histories (the risk evals read
        loss_history[-100:] from checkpoints, so resumed curves must be
        contiguous, not zero-prefixed)."""
        cfg = tiny_clip_cfg(total_iters=20)
        task, _, _ = build_clip_task(cfg, n_bayes=128)

        def make(path, total):
            return Trainer(task, total_iters=total, lr_max=1e-3, lr_min=1e-6,
                           log_interval=5, eval_interval=10, seed=224,
                           checkpoint_path=path, bayes=task.bayes)

        straight_path = os.path.join(tmp_path, "straight", "checkpoint.pth")
        straight = make(straight_path, 20).fit()

        resumed_path = os.path.join(tmp_path, "resumed", "checkpoint.pth")
        make(resumed_path, 20).fit(stop_after=10)
        resumed = make(resumed_path, 20).fit(init_from="resume")

        np.testing.assert_array_equal(resumed.loss_history,
                                      straight.loss_history)
        np.testing.assert_array_equal(resumed.ploss_history,
                                      straight.ploss_history)
        a = jax.tree_util.tree_leaves(resumed.params)
        b = jax.tree_util.tree_leaves(straight.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        payload = ckpt.load_checkpoint(resumed_path)
        np.testing.assert_array_equal(np.asarray(payload["loss_history"]),
                                      straight.loss_history)
        assert int(payload["iter"]) == 20

    def test_guided_clip_trains(self):
        cfg = tiny_clip_cfg(clip_guide=True, total_iters=12, log_interval=6)
        task, _, _ = build_clip_task(cfg, n_bayes=128)
        trainer = Trainer(task, total_iters=12, lr_max=1e-3, lr_min=1e-6,
                          log_interval=6, eval_interval=0, seed=224,
                          bayes=task.bayes)
        result = trainer.fit()
        assert np.isfinite(result.ploss_history).all()

    @pytest.mark.parametrize("builder,extra", [
        (build_cdns_task, {}),
        (build_nwp_task, {}),
        (build_cls_task, {}),
    ])
    def test_other_tasks_train(self, builder, extra):
        # d_eb must exceed the guided slice offsets ((2*L_t+1+L_t)*V here),
        # as in the reference models.
        cfg = tiny_single_cfg(guide=True, n_model_layer=5, d_eb=128,
                              total_iters=8, log_interval=4)
        task, _, _ = builder(cfg, n_bayes=128, **extra)
        trainer = Trainer(task, total_iters=8, lr_max=1e-3, lr_min=1e-6,
                          log_interval=4, eval_interval=0, seed=224,
                          track_compare=True, bayes=task.bayes)
        result = trainer.fit()
        assert np.isfinite(result.loss_history).all()


class TestSequentialTasks:
    def _train_tiny_clip(self, tmp_path):
        """Produce a CLIP checkpoint for the sequential stacks to consume."""
        cfg = tiny_clip_cfg(clip_tmodel_nlayer=5, clip_imodel_nlayer=5,
                            clip_tmodel_deb=128, clip_imodel_deb=128,
                            total_iters=4, log_interval=2)
        task, _, _ = build_clip_task(cfg, n_bayes=64)
        tree = ckpt.tree_folder_name(4, 2, 3, 0.2, 2, 3, 0.2, 1.0)
        run = os.path.join(tmp_path, "CLIP", tree,
                           "TF_L5H4D128_L5H4D128", "20260101-000000")
        path = os.path.join(run, "checkpoint.pth")
        trainer = Trainer(task, total_iters=4, lr_max=1e-3, lr_min=1e-6,
                          log_interval=2, eval_interval=0, seed=224,
                          checkpoint_path=path, bayes=task.bayes)
        trainer.fit()
        return tmp_path

    def test_sequential_dns_and_nwp(self, tmp_path):
        logs_root = self._train_tiny_clip(tmp_path)
        cfg = tiny_single_cfg(total_iters=6, log_interval=3)
        for builder, kwargs in [
            (build_sequential_dns_task, dict(clip_feature="TF")),
            (build_sequential_nwp_task, dict(clip_feature="TF", raw=True)),
        ]:
            task, _, _ = builder(cfg, logs_root=str(logs_root), n_bayes=64,
                                 **kwargs)
            trainer = Trainer(task, total_iters=6, lr_max=1e-3, lr_min=1e-6,
                              log_interval=3, eval_interval=0, seed=224,
                              track_compare=True, bayes=task.bayes)
            result = trainer.fit()
            assert np.isfinite(result.loss_history).all()


class TestSweep:
    def test_clip_sweep_runs_and_saves(self, tmp_path, monkeypatch):
        from ghm_tpu.parallel.sweep import clip_sweep_spec, run_sweep

        cfg = tiny_clip_cfg(job_name="CLIP")
        spec = clip_sweep_spec(cfg, [0.1, 0.3], "TF_L2H4D64_L2H4D64",
                               n_bayes=128, logs_root=str(tmp_path))
        params, results = run_sweep(spec, total_iters=10, lr_max=1e-3,
                                    lr_min=1e-6, log_interval=5, seed=224,
                                    save=True)
        assert len(results) == 2
        for payload, run_dir in zip(results, spec.run_dirs):
            assert np.isfinite(payload["loss_history"]).all()
            assert os.path.exists(os.path.join(run_dir, "checkpoint.pth"))
        # Different p values must produce different training losses.
        assert not np.allclose(results[0]["loss_history"],
                               results[1]["loss_history"])

    def test_sweep_pause_and_resume_matches_straight(self, tmp_path):
        """Kill-and-relaunch a sweep mid-run: the resumed sweep must produce
        the same checkpoints (params + contiguous histories) as an
        uninterrupted run (VERDICT round-1, Weak #1)."""
        from ghm_tpu.parallel.sweep import (clip_sweep_spec, load_resume_blob,
                                            run_sweep)

        cfg = tiny_clip_cfg(job_name="CLIP")
        common = dict(total_iters=12, lr_max=1e-3, lr_min=1e-6,
                      log_interval=3, eval_interval=6, seed=224)

        spec_a = clip_sweep_spec(cfg, [0.1, 0.3], "TF_L2H4D64_L2H4D64",
                                 n_bayes=128,
                                 logs_root=str(tmp_path / "straight"))
        _, straight = run_sweep(spec_a, save=True, **common)

        blob_path = str(tmp_path / "resume.pkl")
        spec_b = clip_sweep_spec(cfg, [0.1, 0.3], "TF_L2H4D64_L2H4D64",
                                 n_bayes=128,
                                 logs_root=str(tmp_path / "resumed"))
        _, paused = run_sweep(spec_b, save=True, resume_path=blob_path,
                              stop_after=6, **common)
        assert paused is None
        assert load_resume_blob(blob_path)["iter"] == 6

        spec_c = clip_sweep_spec(cfg, [0.1, 0.3], "TF_L2H4D64_L2H4D64",
                                 n_bayes=128,
                                 logs_root=str(tmp_path / "resumed"))
        _, resumed = run_sweep(spec_c, save=True, resume_path=blob_path,
                               **common)
        # run_dirs restored from the blob: same timestamped dirs as run B.
        assert list(spec_c.run_dirs) == list(spec_b.run_dirs)
        assert load_resume_blob(blob_path).get("done") is True
        for r, s in zip(resumed, straight):
            np.testing.assert_array_equal(r["loss_history"],
                                          s["loss_history"])
            np.testing.assert_array_equal(r["ploss_history"],
                                          s["ploss_history"])
            for k in ("tmodel_state_dict", "imodel_state_dict"):
                for name in r[k]:
                    np.testing.assert_array_equal(
                        np.asarray(r[k][name]), np.asarray(s[k][name]))
        # Relaunching a completed sweep is a no-op (done marker).
        p, res = run_sweep(spec_c, save=True, resume_path=blob_path, **common)
        assert p is None and res is None

    def test_sweep_cli_skips_done_shard_before_spec_build(self, tmp_path,
                                                          monkeypatch):
        """A relaunched queue must skip completed shards WITHOUT re-running
        the per-p Bayes Monte Carlo (which lives in the spec builders and
        costs minutes per shard on the tunneled TPU)."""
        import pickle

        from ghm_tpu.train import sweep as sweep_cli

        monkeypatch.chdir(tmp_path)
        blob_dir = tmp_path / "logs" / "CLIP" / ".sweep_resume"
        blob_dir.mkdir(parents=True)
        with open(blob_dir / "clip_TF_L2H4D64_L2H4D64_p10-30_T41.pkl",
                  "wb") as f:
            pickle.dump({"done": True, "n_models": 2, "total": 41,
                         "run_dirs": []}, f)

        def boom(*a, **kw):
            raise AssertionError("spec builder ran for a completed shard")

        monkeypatch.setattr(sweep_cli, "clip_sweep_spec", boom)
        sweep_cli.main([
            "--task=clip", "--job_name=CLIP", "--p_list=0.1,0.3",
            "--clip_tmodel_nlayer=2", "--clip_imodel_nlayer=2",
            "--clip_tmodel_deb=64", "--clip_imodel_deb=64",
            "--total_iters=40", "--raw=False",
        ])


class TestConfigCLI:
    def test_parse_reference_style_flags(self):
        cfg = parse_config(ClipCfg, [
            "--n_ttree_layer=4", "--p_ttree_flip=0.2", "--clip_guide=True",
            "--lr_max=3e-4", "--total_iters", "3000", "--raw=False",
        ])
        assert cfg.n_ttree_layer == 4
        assert cfg.p_ttree_flip == 0.2
        assert cfg.clip_guide is True
        assert cfg.lr_max == 3e-4
        assert cfg.total_iters == 3000
        assert cfg.raw is False

    def test_unknown_flag_rejected(self):
        with pytest.raises(SystemExit):
            parse_config(ClipCfg, ["--nope=1"])


class TestSequentialSweep:
    def test_sdns_sweep_with_stacked_clip(self, tmp_path):
        """Sequential-CDM sweep: per-p frozen CLIP params stacked on the
        sweep axis; two tiny p points, one vmapped program."""
        from ghm_tpu.parallel.sweep import sdns_sweep_spec, run_sweep
        from ghm_tpu.train.tasks import build_clip_task
        from ghm_tpu.train.trainer import Trainer

        # Train + save a tiny L5/D128-compatible CLIP checkpoint per p.
        for p in (0.1, 0.3):
            cfg = tiny_clip_cfg(clip_tmodel_nlayer=5, clip_imodel_nlayer=5,
                                clip_tmodel_deb=128, clip_imodel_deb=128,
                                p_ttree_flip=p, p_itree_flip=p,
                                total_iters=2, log_interval=1)
            task, _, _ = build_clip_task(cfg, n_bayes=64)
            tree = ckpt.tree_folder_name(4, 2, 3, p, 2, 3, p, 1.0)
            path = os.path.join(tmp_path, "CLIP", tree,
                                "TF_L5H4D128_L5H4D128", "ts", "checkpoint.pth")
            Trainer(task, total_iters=2, lr_max=1e-3, lr_min=1e-6,
                    log_interval=1, eval_interval=0, seed=224,
                    checkpoint_path=path, bayes=task.bayes).fit()

        cfg = tiny_single_cfg(job_name="CDM")
        spec = sdns_sweep_spec(cfg, [0.1, 0.3], "StT_L2H4D64",
                               clip_feature="TF", n_bayes=64,
                               logs_root=str(tmp_path))
        params, results = run_sweep(spec, total_iters=4, lr_max=1e-3,
                                    lr_min=1e-6, log_interval=2, seed=224,
                                    save=False)
        assert len(results) == 2
        for payload in results:
            assert np.isfinite(payload["loss_history"]).all()

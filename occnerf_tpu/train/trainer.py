"""Trainer: jitted train step, loss assembly, progress rendering,
checkpointing.

Behavioral equivalent of the reference Trainer
(`core/train/trainers/occnerf/trainer.py`), restructured for TPU:

- the whole optimization step — forward, LPIPS+MSE+completeness loss,
  backward, global-norm clip 1.0, Adam update, per-group exp LR decay — is
  ONE jitted function of pytrees (no Python in the hot loop);
- the visibility-counter side effect is the returned ``state`` pytree;
- patch images come back as a reshape (static patch layout) instead of the
  reference's per-patch scatter loop (`trainer.py:31-41`);
- checkpoints are msgpack pytrees with the reference cadence
  (`latest`/`iter_N`/`init`, `configs/default.yaml:93-94`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import cfg
from ..data import create_dataloader, unpack_to_image
from ..metrics.lpips import LPIPS, scale_for_lpips
from ..utils.image import save_image, tile_images, to_8b_image
from ..utils.log import Timer
from . import checkpoint as ckpt
from .optimizer import get_optimizer

EXCLUDE_KEYS_TO_GPU = ["frame_name", "img_width", "img_height", "idx",
                       "time", "ray_mask", "n_valid_rays", "patch_xy",
                       "Rh", "Th", "joints", "poses", "betas", "verts",
                       "img", "alpha"]

PROGRESS_EXTRA_ITERS = (20, 100, 300, 1000, 2500)


def _device_batch(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if k not in EXCLUDE_KEYS_TO_GPU}


class Trainer:
    def __init__(self, network, statics, params, state,
                 progress_loader=None):
        from ..ops import (set_compute_dtype, set_hashgrid_backend,
                           set_knn_recall, set_vertagg_backend,
                           set_xla_matmul_precision)
        set_compute_dtype(cfg.get("tpu", {}).get("compute_dtype",
                                                 "float32"))
        set_xla_matmul_precision(cfg.get("tpu", {}).get(
            "xla_matmul_precision", "default"))
        set_knn_recall(cfg.get("tpu", {}).get("knn_recall", 0.95))
        set_hashgrid_backend(cfg.get("tpu", {}).get("hashgrid_backend",
                                                    "auto"))
        set_vertagg_backend(cfg.get("tpu", {}).get("vertagg_backend",
                                                   "auto"))
        self.network = network
        self.statics = statics
        self.params = params
        self.state = state
        self.logdir = cfg.logdir

        self.lpips = None
        self.lpips_params = None
        if "lpips" in cfg.train.lossweights:
            self.lpips = LPIPS()
            LPIPS.announce("Trainer")
            self.lpips_params = self.lpips.load_params(jax.random.PRNGKey(0))

        self.tx, self.opt_state = get_optimizer(self.params)

        # mesh data parallelism (the TPU equivalent of the reference's
        # default DataParallel training over all local GPUs,
        # `configs/config.py:36-50` + `network.py:68-72`): when more than
        # one chip is visible, shard the ray axis over a 1-D mesh and
        # replicate params/state/optimizer; XLA inserts the gradient psum
        # and the output all-gather.
        self.mesh = None
        self._warned_shard_fallback = False
        from ..parallel import make_mesh
        mesh = make_mesh()
        n_rays = cfg.patch.N_patches * cfg.patch.size ** 2
        if mesh.devices.size > 1:
            if n_rays % mesh.devices.size == 0:
                self.mesh = mesh
                print(f"[Trainer] data-parallel over {mesh.devices.size} "
                      f"devices ({n_rays} rays/step, "
                      f"{n_rays // mesh.devices.size}/device)")
            else:
                print(f"[Trainer] WARNING: {n_rays} rays/step not "
                      f"divisible by {mesh.devices.size} devices; "
                      "training single-device")

        self._async_ckpt = None
        if cfg.get("tpu", {}).get("async_checkpoint", False):
            self._async_ckpt = ckpt.AsyncCheckpointer()

        self.iter = 0
        if cfg.resume and ckpt.ckpt_exists(self.logdir, cfg.load_net):
            self.load_ckpt(cfg.load_net)
        else:
            self.save_ckpt("init")
            self.iter = 1
        self._replicate_all()

        self.timer = Timer()
        self.rng = jax.random.PRNGKey(cfg.get("tpu", {}).get("seed", 42))
        self._train_step = None
        self._render_step = None
        self.progress_loader = progress_loader

        # observability: per-log-interval metrics stream + optional
        # jax profiler capture (SURVEY.md §5 — the reference has only a
        # wall-clock Timer; these are the cheap superset)
        os.makedirs(self.logdir, exist_ok=True)
        self._metrics_path = os.path.join(self.logdir, "metrics.jsonl")
        self._profile_dir = cfg.get("tpu", {}).get("profile_dir", "")
        self._profile_steps = cfg.get("tpu", {}).get("profile_steps", 5)
        self._profiling = False

    # ------------------------------------------------------------------
    def _replicate_all(self) -> None:
        """Place params/state/optimizer/statics on the mesh, replicated
        on every device (no-op single-device)."""
        if self.mesh is None:
            return
        from ..parallel import replicated
        self.params = replicated(self.mesh, self.params)
        self.state = replicated(self.mesh, self.state)
        self.opt_state = replicated(self.mesh, self.opt_state)
        self.statics = replicated(self.mesh, self.statics)
        if self.lpips_params is not None:
            self.lpips_params = replicated(self.mesh, self.lpips_params)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _build_train_step(self):
        network = self.network
        lpips_model = self.lpips
        weights = {k: float(v) for k, v in cfg.train.lossweights.items()}
        n_patches = cfg.patch.N_patches
        psize = cfg.patch.size
        perturb = float(cfg.train.perturb)
        n_samples = cfg.N_samples

        # patch-shard the perceptual loss: the ray axis shards as
        # contiguous blocks that don't line up with whole patches, so the
        # (N,3)->(P,s,s,3) reshape would otherwise all-gather and run the
        # full VGG forward replicated on every chip.  Constraining the
        # patch axis instead re-shards the (tiny) rgb/target tensors and
        # each device convolves only its ceil(P/n) patches — the mesh
        # analog of the reference's LPIPS DataParallel
        # (`core/train/trainers/occnerf/trainer.py:70`).  GSPMD handles
        # P % n != 0 by internal padding.
        patch_sharding = replicated_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            patch_sharding = NamedSharding(
                self.mesh, PartitionSpec(self.mesh.axis_names[0]))
            replicated_sharding = NamedSharding(self.mesh, PartitionSpec())

        def loss_fn(params, state, statics, lpips_params, batch, it, key):
            out, new_state = network.forward(
                params, statics, state, batch, it, training=True,
                perturb=perturb, rng=key)
            rgb_flat = out["rgb"]
            if patch_sharding is not None:
                # ray-sharded (N,3) -> patch-sharded (P,s,s,3) has no
                # direct SPMD transition (the reshape propagates a mixed
                # patch/row split that GSPMD can only reach by an
                # "involuntary full rematerialization" — a logged
                # warning).  Route it explicitly: all-gather the (tiny)
                # flat rgb, reshape locally, then slice to patch shards.
                rgb_flat = jax.lax.with_sharding_constraint(
                    rgb_flat, replicated_sharding)
            rgb = rgb_flat.reshape(n_patches, psize, psize, 3)
            target = batch["target_patches"]
            if patch_sharding is not None:
                rgb = jax.lax.with_sharding_constraint(rgb, patch_sharding)
                target = jax.lax.with_sharding_constraint(
                    target, patch_sharding)

            losses = {}
            if "mse" in weights:
                losses["mse"] = jnp.mean((rgb - target) ** 2)
            if "l1" in weights:
                losses["l1"] = jnp.mean(jnp.abs(rgb - target))
            if "lpips" in weights:
                d = lpips_model.apply(lpips_params,
                                      scale_for_lpips(rgb),
                                      scale_for_lpips(target))
                losses["lpips"] = jnp.mean(d)

            total = sum(weights[k] * losses[k] for k in losses)
            if "comp_loss" in out:
                # mean over the *valid* samples only — matches the
                # reference's mean over rendered rays (trainer.py:167-170)
                denom = jnp.maximum(
                    jnp.sum(batch["ray_valid"]) * n_samples, 1.0)
                comp = jnp.sum(out["comp_loss"]) / denom
                losses["comp_loss"] = comp
                total = total + comp
            return total, (new_state, losses)

        tx = self.tx

        def train_step(params, state, opt_state, statics, lpips_params,
                       batch, it, key):
            (loss, (new_state, losses)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state, statics,
                                       lpips_params, batch, it, key)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(
                lambda p, u: p + u, params, updates)
            return new_params, new_state, new_opt_state, loss, losses

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _build_render_step(self):
        network = self.network

        def render_step(params, state, statics, batch, it):
            out, _ = network.forward(
                params, statics, state, batch, it, training=False,
                perturb=0.0, rng=None,
                ignore_non_rigid=bool(cfg.ignore_non_rigid_motions))
            return out

        # render ray counts vary per frame; new shapes recompile, so cache
        # per padded-length executable
        return jax.jit(render_step)

    # ------------------------------------------------------------------
    def _shard_or_put(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host batch -> device: ray axis sharded over the mesh when one
        is active (ray counts from the data layer are always bucket- or
        patch-padded, so divisibility holds), else default placement."""
        host = {k: v for k, v in batch.items()
                if k not in EXCLUDE_KEYS_TO_GPU}
        if self.mesh is not None:
            from ..parallel import shard_batch
            n = batch["near"].shape[0]
            if n % self.mesh.devices.size == 0:
                return shard_batch(self.mesh, host)
            if not self._warned_shard_fallback:
                self._warned_shard_fallback = True
                print(f"[Trainer] WARNING: batch of {n} rays not divisible "
                      f"by the {self.mesh.devices.size}-device mesh; "
                      "falling back to single-device placement for such "
                      "batches (unsharded retrace)")
        return {k: jnp.asarray(v) for k, v in host.items()}

    def train_step(self, batch: Dict[str, Any]):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        self.rng, key = jax.random.split(self.rng)
        dbatch = self._shard_or_put(batch)
        (self.params, self.state, self.opt_state, loss, losses) = \
            self._train_step(self.params, self.state, self.opt_state,
                             self.statics, self.lpips_params, dbatch,
                             jnp.float32(self.iter), key)
        return loss, losses

    def render(self, batch: Dict[str, Any], iter_val: Optional[int] = None):
        if self._render_step is None:
            self._render_step = self._build_render_step()
        dbatch = self._shard_or_put(batch)
        it = jnp.float32(cfg.eval_iter if iter_val is None else iter_val)
        return self._render_step(self.params, self.state, self.statics,
                                 dbatch, it)

    # ------------------------------------------------------------------
    def train(self, epoch: int, dataloader) -> bool:
        """One epoch; returns True when maxiter is reached."""
        log_interval = cfg.train.log_interval
        for batch in dataloader:
            if self.iter > cfg.train.maxiter:
                return True
            self._maybe_profile()
            loss, losses = self.train_step(batch)

            if self.iter % log_interval == 0:
                loss = float(loss)
                scalars = {k: float(v) for k, v in losses.items()}
                parts = ", ".join(
                    f"{k}: {v:.5f}" for k, v in sorted(scalars.items()))
                elapsed = self.timer.log()
                print(f"Epoch: {epoch} [Iter {self.iter}, "
                      f"{elapsed}] loss: {loss:.5f} [{parts}]")
                self._log_metrics({"iter": self.iter, "epoch": epoch,
                                   "loss": loss, "sec": elapsed,
                                   **scalars})
                self._check_finite(loss)

            # The reference ships with progress-triggered model reload
            # disabled (core/train/trainers/occnerf/trainer.py:374-389
            # always falls through), so progress() is a pure side-effect
            # here and the iteration always advances.  The old
            # `is_reload_model` gate skipped the increment on a branch
            # that could never fire — and would have re-run the same
            # iteration forever if it ever did.
            if self.iter in PROGRESS_EXTRA_ITERS or \
                    self.iter % cfg.progress.dump_interval == 0:
                self.progress()

            if self.iter % cfg.train.save_checkpt_interval == 0:
                # never overwrite 'latest' with a poisoned state, even
                # when the save cadence is not a multiple of
                # log_interval (the in-log-block check above may not
                # have run this iter)
                self._check_finite(loss)
                self.save_ckpt("latest")
            if cfg.save_all and \
                    self.iter % cfg.train.save_model_interval == 0:
                self._check_finite(loss)
                self.save_ckpt(f"iter_{self.iter}")
            self.iter += 1
        done = self.iter > cfg.train.maxiter
        if done:
            # training complete: a checkpoint is only durable once the
            # background writer has flushed it
            self.wait_ckpt()
        return done

    # ------------------------------------------------------------------
    def _check_finite(self, loss) -> None:
        """Failure guard (no reference equivalent): a NaN state poisons
        every later iter and checkpoint — stop so the last finite
        checkpoint stays usable."""
        if not np.isfinite(float(loss)):
            # flush the (finite) checkpoints already enqueued before
            # aborting — they are exactly the state worth keeping
            self.wait_ckpt()
            raise FloatingPointError(
                f"non-finite training loss at iter {self.iter}; "
                "aborting before overwriting checkpoints")

    def _log_metrics(self, record: Dict[str, Any]) -> None:
        import json
        import time as _time
        record["time"] = _time.time()
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _maybe_profile(self) -> None:
        """Capture a jax profiler trace for tpu.profile_steps iterations
        starting at iteration 10 (post-compile) when tpu.profile_dir is
        set."""
        if not self._profile_dir:
            return
        if not self._profiling and self.iter == 10:
            jax.profiler.start_trace(self._profile_dir)
            self._profiling = True
        elif self._profiling and self.iter >= 10 + self._profile_steps:
            jax.profiler.stop_trace()
            self._profiling = False
            self._profile_dir = ""
            print(f"[Trainer] profiler trace written")

    def _point_cloud_scatter(self) -> None:
        """3-D scatter of the learnable point cloud colored by the
        visibility counter (reference `trainer.py:344-372`); needs
        matplotlib, skipped silently without it."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        if "point_dist" not in self.params:
            return
        pts = np.asarray(self.statics["point_base"]
                         + self.params["point_dist"])
        counter = np.asarray(self.state.get(
            "point_counter", np.zeros(len(pts))))
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=counter, s=1,
                   cmap="viridis")
        fig.savefig(os.path.join(self.logdir,
                                 f"points_{self.iter:06d}.jpg"), dpi=80)
        plt.close(fig)

    def progress(self) -> bool:
        """Render the held-out progress frames, tile render|truth pairs,
        detect empty renders (`trainer.py:301-392`)."""
        if self.progress_loader is None:
            try:
                self.progress_loader = create_dataloader("progress")
            except Exception as e:  # no progress split configured
                print(f"[Trainer] progress rendering skipped: {e}")
                return False

        images = []
        is_empty_img = False
        for batch in self.progress_loader:
            H, W = batch["img_height"], batch["img_width"]
            bgcolor = np.asarray(batch["bgcolor"], np.float32) / 255.0
            out = self.render(batch, iter_val=self.iter)
            n_valid = int(batch["n_valid_rays"])
            rgb = unpack_to_image(
                H, W, batch["ray_mask"], bgcolor,
                np.asarray(out["rgb"]), n_valid)
            truth = unpack_to_image(
                H, W, batch["ray_mask"], bgcolor,
                np.asarray(batch["target_rgbs"]), n_valid) \
                if "target_rgbs" in batch else np.zeros_like(rgb)
            images.append(np.concatenate(
                [to_8b_image(rgb), to_8b_image(truth)], axis=1))

            if np.allclose(rgb, bgcolor, atol=5.0 / 255.0) and \
                    self.iter <= 5000:
                is_empty_img = True
                break

        os.makedirs(self.logdir, exist_ok=True)
        tiled = tile_images(images)
        save_image(tiled, os.path.join(
            self.logdir, f"prog_{self.iter:06d}.jpg"))
        if self.network.is_occnerf_mlp:
            self._point_cloud_scatter()

        if is_empty_img:
            print("Produces empty images.")
        # Reference parity: the reload-on-empty branch is disabled there
        # (trainer.py:374-389), so progress() has no return value to act
        # on — see the call site in train().

    # ------------------------------------------------------------------
    def save_ckpt(self, name: str):
        if self._async_ckpt is not None:
            path = self._async_ckpt.save(
                self.logdir, name, iter_val=self.iter, params=self.params,
                state=self.state, opt_state=self.opt_state)
            print(f"save checkpoint to {path} (async) ...")
            return
        path = ckpt.save_ckpt(self.logdir, name, iter_val=self.iter,
                              params=self.params, state=self.state,
                              opt_state=self.opt_state)
        print(f"save checkpoint to {path} ...")

    def wait_ckpt(self) -> None:
        """Drain pending async checkpoint writes (no-op when sync)."""
        if self._async_ckpt is not None:
            self._async_ckpt.wait()

    def load_ckpt(self, name: str):
        print(f"load network from {ckpt.ckpt_path(self.logdir, name)} ...")
        restored = ckpt.load_ckpt(
            self.logdir, name, params_template=self.params,
            state_template=self.state,
            opt_state_template=self.opt_state)
        self.iter = restored["iter"] + 1
        self.params = restored["params"]
        self.state = restored["state"]
        self.opt_state = restored["opt_state"]
        self._replicate_all()

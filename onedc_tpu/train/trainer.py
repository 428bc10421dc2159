"""Stage-I trainer: RD training of codec + one-step generator.

Counterpart of the reference ``train_sd15_codec_stage1.py`` Trainer,
re-designed for single-controller JAX:

- data parallelism = batch sharded over the mesh ``data`` axis (no ranks,
  no DDP wrappers, no broadcast of the per-step transform choice — every
  host derives it deterministically from the step index)
- one jitted train step (model fwd + loss + grads + optimizer)
- eval epoch with metric means (the ``accelerator.reduce(mean)``
  equivalent falls out of jnp.mean over the sharded batch)
- rotating checkpoints + best tracking, TensorBoard scalars/images
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import (
    DataLoader,
    ImageFolderDataset,
    MultiResolutionCrop,
    cycle,
    random_crop,
)
from ..models.onedc import OneDC
from ..parallel.mesh import batch_sharding, make_mesh, replicate_params
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import AvgDict, get_logger, make_writer
from .losses import RDLoss
from .step import create_train_state, make_train_step

log = get_logger("onedc_tpu.train")


def save_config_snapshot(cfg: Config, run_dir) -> None:
    """Persist the resolved config into the run dir so every run is
    reproducible from its own artifacts (ref train_sd15_codec_stage1.py:75
    ``OmegaConf.save(args, output_path/config.yaml)``)."""
    import yaml

    def clean(o):
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        if isinstance(o, (str, int, float, bool, type(None))):
            return o
        # in-memory objects (e.g. state-dict warm-starts): type tag only
        return f"<{type(o).__name__}>"

    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump(clean(cfg.to_dict()), f, default_flow_style=False)


def load_part_ckpts(params, cfg: Config, logger):
    """Partial warm-start from reference-layout checkpoints before
    training (ref model_sd15_with_codec_stage1.py:125-148 load_part_ckpt):

    - ``codec_ckpt``: IntraNoAR state dict, full coverage required
      (reference loads strict=True)
    - ``unet_ckpt_lora``: SD1.5 UNet + LoRA state dict, partial allowed
      (reference loads strict=False); LoRA is merged at load
    - ``codeformer_ckpt``: Codeformer state dict, full coverage required

    Each path is a torch-layout safetensors file. Returns params with the
    matching subtrees overlaid; untouched subtrees keep their init values.
    """
    part = dict(unet_path=cfg.get("unet_ckpt_lora"),
                codec_path=cfg.get("codec_ckpt"),
                codeformer_path=cfg.get("codeformer_ckpt"))
    if not any(part.values()):
        return params
    from ..utils.port_torch import port_onedc_checkpoint
    req = tuple(sub for sub, p in (("codec", part["codec_path"]),
                                   ("codeformer", part["codeformer_path"]))
                if p)
    logger.info("warm-start from reference checkpoints: %s",
                {k: v for k, v in part.items() if v})
    return port_onedc_checkpoint(reference_params=params,
                                 require_complete=req, **part)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        # Validate the LPIPS decision BEFORE any model build: a config
        # error must fail in milliseconds, not after minutes of init
        # compiles (ref loss: src/losses/pixel_loss.py:51-89).
        lpips_fn = None
        if cfg.get("lpips_weights"):
            from ..nn.lpips import make_lpips_fn
            lpips_fn = make_lpips_fn(cfg.lpips_weights)
        elif cfg.get("allow_no_lpips", False):
            log.warning("training WITHOUT the LPIPS term (allow_no_lpips): "
                        "this is a materially different objective than the "
                        "reference L1+LPIPS+lambda*bpp loss")
        else:
            raise ValueError(
                "no lpips_weights configured. The reference stage-1 loss is "
                "L1 + LPIPS + lambda*bpp (src/losses/pixel_loss.py:51-89); "
                "training without LPIPS silently changes the objective. "
                "Set lpips_weights: <path> or allow_no_lpips: true.")
        self.mesh = make_mesh()
        self.model = OneDC(**dict(cfg.get("model", {})))

        key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
        res = int(cfg.get("base_resolution", 512))
        img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.jit(lambda x: self.model.init({"params": key}, x))(img0)
        params = load_part_ckpts(params, cfg, log)

        # the VQGAN tokenizer is a frozen distillation target
        # (ref model_..._stage1.py:198-202); the codeformer itself trains
        default_frozen = ("vae", "vqgan") if self.model.use_codeformer \
            else ("vae",)
        frozen = tuple(cfg.get("frozen", default_frozen))
        self.frozen = frozen
        self.state = create_train_state(
            self.model, params,
            lr=float(cfg.get("lr", 5e-5)),
            warmup_steps=int(cfg.get("warmup_steps", 500)),
            grad_clip=float(cfg.get("grad_clip", 5.0)),
            frozen=frozen,
            optimizer=cfg.get("optimizer", "adamw"))
        if cfg.get("fsdp", False):
            from ..parallel.fsdp import shard_state
            self.state = shard_state(self.mesh, self.state)
        else:
            self.state = replicate_params(self.mesh, self.state)

        lmbda = float(cfg.get("lmbda", 1.8))
        sched = cfg.get("lmbda_schedule",
                        dict(start_step=0, end_step=4000,
                             start_value=1e-4, end_value=lmbda))
        self.loss = RDLoss(
            pix_weight=float(cfg.get("pix_weight", 1.0)),
            lpips_weight=float(cfg.get("lpips_weight", 1.0)),
            lmbda=lmbda, lmbda_schedule=dict(sched),
            pix_loss_type=cfg.get("pix_loss_type", "l1"),
            lpips_fn=lpips_fn)
        self.grad_accum = int(cfg.get("grad_accum", 1))
        step_kwargs = dict(
            remat=bool(cfg.get("gradient_checkpointing", True)),
            codeformer_loss_weight=float(
                cfg.get("codeformer_loss_weight", 1e-3)),
            codeformer_mse_weight=float(
                cfg.get("codeformer_mse_weight", 1e-2)))
        # grad_accum_mode "unrolled": jitted micro-grad + accumulate +
        # apply programs instead of one scan-fused step — identical math
        # (tests/test_trainer.py), needed where the fused full-size
        # program exceeds the compile service's budget (step.py:
        # make_unrolled_accum_step)
        if (self.grad_accum > 1
                and cfg.get("grad_accum_mode", "scan") == "unrolled"):
            from .step import make_unrolled_accum_step
            # donate_state: the loop exclusively owns self.state (it is
            # rebound every step), so the apply program may reuse the
            # old params' buffers — see make_unrolled_accum_step
            self.step_fn = make_unrolled_accum_step(
                self.model, self.loss, grad_accum=self.grad_accum,
                donate_state=True, **step_kwargs)
        else:
            self.step_fn = jax.jit(make_train_step(
                self.model, self.loss, grad_accum=self.grad_accum,
                **step_kwargs))

        # data
        self.batch_size = int(cfg.get("batch_size", 8))
        self.crop = MultiResolutionCrop(
            cfg.get("resolutions", [res]),
            cfg.get("batch_scales", None),
            seed=int(cfg.get("seed", 0)))
        train_ds = ImageFolderDataset(cfg.train_data)
        if cfg.get("loader", "simple") == "grain":
            # production pipeline: multiprocess decode, deterministic
            # shuffle, per-process sharding for multi-host; its iterator
            # state rides the checkpoints (loader_state_*.bin) so resume
            # continues the exact stream
            from ..data.datasets import make_grain_loader
            self.train_loader = None
            self.train_iter = make_grain_loader(
                train_ds, self.batch_size, shuffle=True,
                seed=int(cfg.get("seed", 0)),
                num_workers=int(cfg.get("loader_workers", 8)))
        else:
            self.train_loader = DataLoader(
                train_ds, self.batch_size, shuffle=True,
                seed=int(cfg.get("seed", 0)))
            self.train_iter = cycle(self.train_loader)
        self.eval_loader = (DataLoader(
            ImageFolderDataset(cfg.eval_data), 1)
            if cfg.get("eval_data") else None)

        run_dir = Path(cfg.get("run_dir", "runs/stage1"))
        # multi-host: one writer of checkpoints/logs (the reference's
        # accelerator.is_main_process gating); make_writer gates itself
        from ..parallel.distributed import is_main_process
        self._is_main = is_main_process()
        self.ckpt = CheckpointManager(run_dir,
                                      int(cfg.get("max_checkpoint", 3)))
        save_config_snapshot(cfg, run_dir)
        self.writer = make_writer(run_dir / "tb",
                                  wandb_project=cfg.get("wandb_project"),
                                  run_name=cfg.get("wandb_run_name"))
        self.writer.log_config(cfg)
        self.log_interval = int(cfg.get("log_interval", 200))
        self.save_interval = int(cfg.get("save_interval", 5000))
        self.total_steps = int(cfg.get("total_steps", 400_000))
        # per-step noise keys are fold_in(base, step), not a split chain:
        # a resumed run reproduces the exact keys an uninterrupted run
        # would have used at the same steps
        self.base_rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 1)

    # -- one training step ---------------------------------------------------

    def _prepare_batch(self, batch, step: int):
        """Per-step multi-resolution crop + batch reduction
        (ref train_sd15_codec_stage1.py:279-290, deterministic here).

        The reduced batch is rounded up to a multiple of the data-axis
        size so the sharded leading dim always divides the mesh."""
        res, scale = self.crop.pick(step)
        # each micro-batch's leading dim must divide the mesh data axis
        n_data = self.mesh.shape["data"] * self.grad_accum
        bs = max(1, int(round(self.batch_size * scale)))
        bs = max(n_data, (bs // n_data) * n_data)
        rng = np.random.default_rng(step)
        imgs = np.stack([random_crop(im, res, rng)
                         for im in batch["image"][:bs]])
        return {"image": jax.device_put(
            jnp.asarray(imgs), batch_sharding(self.mesh))}

    def train_one_step(self, step: int):
        batch = self._prepare_batch(next(self.train_iter), step)
        sub = jax.random.fold_in(self.base_rng, step)
        self.state, metrics = self.step_fn(self.state, batch, sub)
        return metrics

    # -- eval epoch (ref :220-266) -------------------------------------------

    def eval_one_epoch(self, step: int, max_images=None):
        """Evaluate the TRAINING objective on the eval set.

        Mirrors the reference (train_sd15_codec_stage1.py:220-266): the
        full RD loss (pix + LPIPS when configured + lambda*bpp, with the
        lambda schedule evaluated at the current step) — so the metric
        the best checkpoint is selected by (``total_loss``) is the same
        objective the trainer optimizes. Codeformer distillation terms are
        included when the model trains them (the reference evals only the
        pixel loss; adding them keeps eval == train objective).

        Consumes the WHOLE eval loader by default (like the reference);
        cap with ``eval_max_images`` in the config or the ``max_images``
        arg. Multi-host: per-host means are reduced across processes.
        """
        if self.eval_loader is None:
            return {}
        if max_images is None:
            max_images = self.cfg.get("eval_max_images")  # None = all
        avg = AvgDict()
        if not hasattr(self, "_eval_fwd"):
            cf_w = float(self.cfg.get("codeformer_loss_weight", 1e-3))
            cf_mse_w = float(self.cfg.get("codeformer_mse_weight", 1e-2))

            def eval_fwd(p, x, step):
                enc_dict, pred = self.model.apply(p, x)
                total, ld = self.loss(x, pred, enc_dict["bpp"], step=step,
                                      training=True)
                ld["bpp_hard_y"] = enc_dict["bpp_hard_y"]
                if "code_ce_loss" in enc_dict:
                    cf = (enc_dict["code_ce_loss"]
                          + enc_dict["code_mse_loss"] * cf_mse_w)
                    ld["total_loss"] = total + cf * cf_w
                    ld["codeformer_loss"] = cf
                return ld, pred
            self._eval_fwd = jax.jit(eval_fwd)
        eval_fwd = self._eval_fwd
        for i, batch in enumerate(self.eval_loader):
            img = jnp.asarray(batch["image"])
            # center-crop to x64 for static shapes
            h, w = img.shape[1] // 64 * 64, img.shape[2] // 64 * 64
            img = img[:, :h, :w]
            ld, pred = eval_fwd(self.state.params, img,
                                jnp.asarray(step, jnp.int32))
            mse = float(jnp.mean((jnp.asarray(pred) - img) ** 2))
            avg.update({k: float(v) for k, v in ld.items()})
            avg.update({"mse": mse,
                        "psnr": -10 * np.log10(max(mse / 4, 1e-12))})
            if i == 0:
                self.writer.log_image("eval/recon", np.asarray(pred[0]), step)
                self.writer.log_image("eval/gt", np.asarray(img[0]), step)
            # break AFTER processing so the capped epoch never fetches an
            # extra batch (a grain loader fetch can be expensive)
            if max_images is not None and i + 1 >= max_images:
                break
        from ..parallel.distributed import reduce_mean_across_hosts
        means = reduce_mean_across_hosts(avg.mean())
        self.writer.log_dict(means, step, prefix="eval")
        return means

    # -- main loop ------------------------------------------------------------

    def train(self):
        from ..utils.preempt import PreemptionGuard

        start = int(self.state.step)
        if start and self.train_loader is not None:
            # resumed (simple loader): fast-forward the stream, no loads
            self.train_iter = cycle(self.train_loader, skip=start)
        log.info("training from step %d to %d", start, self.total_steps)
        t0 = time.perf_counter()
        with self.mesh, PreemptionGuard() as preempt:
            for step in range(start, self.total_steps):
                metrics = self.train_one_step(step)
                if (step + 1) % self.log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = (time.perf_counter() - t0) / self.log_interval
                    m["sec_per_step"] = dt
                    t0 = time.perf_counter()
                    self.writer.log_dict(m, step + 1, prefix="train")
                    log.info("step %d: loss=%.4f bpp=%.4f (%.2fs/step)",
                             step + 1, m["total_loss"], m["bpp"], dt)
                saved = False
                if (step + 1) % self.save_interval == 0:
                    ev = self.eval_one_epoch(step + 1)
                    # best-checkpoint selection by the full training
                    # objective (ref monitor_key total_loss,
                    # train_sd15_codec_stage1.py:346-356)
                    metric = ev.get("total_loss")
                    if self._is_main:
                        self.ckpt.save(
                            jax.device_get(self.state), step + 1, metric)
                        self._save_loader_state(step + 1)
                    saved = True
                if preempt.triggered:
                    # SIGTERM/SIGUSR1: save once and stop cleanly so the
                    # run resumes from this exact step (utils/preempt.py)
                    if not saved and self._is_main:
                        self.ckpt.save(jax.device_get(self.state), step + 1)
                        self._save_loader_state(step + 1)
                    log.info("preempted: checkpointed step %d, stopping",
                             step + 1)
                    break
        self.writer.flush()

    # -- loader-state checkpointing (grain path) ------------------------------

    def _loader_state_path(self, step: int):
        return Path(self.ckpt.run_dir) / f"loader_state_{step:06d}.bin"

    def _save_loader_state(self, step: int):
        """Grain iterators checkpoint their exact stream position
        (get_state/set_state); the simple DataLoader path doesn't need
        this (cycle(skip=) reconstructs it from the step count)."""
        get_state = getattr(self.train_iter, "get_state", None)
        if get_state is None:
            return
        self._loader_state_path(step).write_bytes(get_state())
        states = sorted(Path(self.ckpt.run_dir).glob("loader_state_*.bin"))
        while len(states) > self.ckpt.max_checkpoints:
            states.pop(0).unlink()

    def resume(self, step: Optional[int] = None):
        self.state, restored = self.ckpt.restore(jax.device_get(self.state),
                                                 step)
        set_state = getattr(self.train_iter, "set_state", None)
        lsp = self._loader_state_path(int(restored))
        if set_state is not None:
            if lsp.exists():
                set_state(lsp.read_bytes())
                self._loader_state_restored = True
                log.info("restored grain loader state at step %d", restored)
            else:
                log.warning("no loader state for step %d: the grain data "
                            "stream restarts from scratch", restored)
        # escape hatches (ref train_sd15_codec_stage1.py:125-132):
        # override_lr rebuilds a FRESH optimizer at the new lr (moments
        # reset, like the reference's prepare_optimizer); override_step
        # rewrites the schedule/loop position.
        if self.cfg.get("override_lr") is not None:
            new_lr = float(self.cfg.override_lr)
            cur_step = int(self.state.step)
            fresh = create_train_state(
                self.model, self.state.params,
                lr=new_lr,
                warmup_steps=int(self.cfg.get("warmup_steps", 500)),
                grad_clip=float(self.cfg.get("grad_clip", 5.0)),
                frozen=self.frozen,
                optimizer=self.cfg.get("optimizer", "adamw"))
            self.state = fresh.replace(step=cur_step)
            log.info("override_lr: fresh optimizer at lr=%g", new_lr)
        if self.cfg.get("override_step") is not None:
            self.state = self.state.replace(
                step=int(self.cfg.override_step))
            log.info("override_step: step rewritten to %d",
                     int(self.state.step))
        if self.cfg.get("fsdp", False):
            from ..parallel.fsdp import shard_state
            self.state = shard_state(self.mesh, self.state)
        else:
            self.state = replicate_params(self.mesh, self.state)
        log.info("resumed from step %d", restored)


def main(argv=None):
    import argparse
    from ..config import load_config
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--resume", action="store_true")
    args, overrides = parser.parse_known_args(argv)
    cfg = load_config(args.config, overrides)
    if cfg.get("multihost"):  # TPU pod slice: wire the hosts first
        from ..parallel.distributed import initialize
        initialize()
    trainer = Trainer(cfg)
    if args.resume:
        trainer.resume()
    trainer.train()


if __name__ == "__main__":
    main()

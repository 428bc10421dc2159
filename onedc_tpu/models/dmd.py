"""DMD2 guidance for stage-II training.

JAX re-design of the reference ``SDGuidance``
(``src/modules/dmd/sd_guidance.py``): frozen ``real_unet`` + trainable
``fake_unet`` (both standard SD1.5 text-conditioned UNets) with

- distribution-matching loss: grad = (p_real - p_fake)/|p_real|.mean
  applied as a detached-target MSE on the generator latents (ref :179-266)
- critic epsilon-MSE ``compute_loss_fake`` (ref :268-321)
- diffusion-GAN classifier on the fake UNet's mid-block feature with a
  conv head to one logit (ref :120-176); softplus real/fake losses

Hyperparameters follow the stage-2 config: real_guidance_scale 1.75,
fake_guidance_scale 1.0, min/max step percent 0.02/0.64, diffusion-GAN
noising up to t<1000.

Everything is a pure function of (params, rng); the two-optimizer turn
structure lives in ``onedc_tpu/train/trainer_stage2.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import GroupNorm
from ..nn.diffusion import get_x0_from_noise, make_alphas_cumprod
from ..nn.unet_sd import SD15UNet


def add_noise(latents, noise, timesteps, alphas_cumprod):
    """DDPM forward q(x_t | x_0) (diffusers scheduler.add_noise)."""
    abar = jnp.asarray(alphas_cumprod, jnp.float32)[timesteps]
    abar = abar.reshape(-1, 1, 1, 1).astype(latents.dtype)
    return jnp.sqrt(abar) * latents + jnp.sqrt(1.0 - abar) * noise


class ClsHead(nn.Module):
    """1280-ch mid feature (8x8 at 512px) -> 1 realism logit
    (ref sd_guidance.py:136-151, SD1.5 branch)."""

    channels: int = 1280

    @nn.compact
    def __call__(self, rep):
        c = self.channels
        # production mid features are >= 8x8 (512px -> 8x8, 768px -> 12x12);
        # smaller inputs (tiny test geometries) would reduce to an EMPTY
        # spatial conv output and a NaN mean — pad them up to 8x8 instead
        b, hh, ww, _ = rep.shape
        if hh < 8 or ww < 8:
            rep = jnp.pad(rep, ((0, 0), (0, max(0, 8 - hh)),
                                (0, max(0, 8 - ww)), (0, 0)))
        h = nn.Conv(c, (4, 4), strides=(2, 2), padding=1, name="conv0")(rep)
        h = GroupNorm(32, 1e-5, name="norm0")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(c, (4, 4), strides=(4, 4), padding="VALID",
                    name="conv1")(h)
        h = GroupNorm(32, 1e-5, name="norm1")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(1, (1, 1), name="conv_out")(h)
        return jnp.mean(h, axis=(1, 2))  # (B, 1); mean if spatial dims remain


class SDGuidance(nn.Module):
    """real/fake UNet pair + GAN head. Freeze ``real_unet`` via the
    optimizer mask (it stays in the param tree for checkpoint parity)."""

    block_channels: Sequence[int] = (320, 640, 1280, 1280)
    context_dim: int = 768
    num_train_timesteps: int = 1000
    min_step_percent: float = 0.02
    max_step_percent: float = 0.64
    real_guidance_scale: float = 1.75
    fake_guidance_scale: float = 1.0
    diffusion_gan: bool = True
    diffusion_gan_max_timestep: int = 1000
    cls_on_clean_image: bool = True
    gan_alone: bool = False

    def setup(self):
        self.real_unet = SD15UNet(block_channels=self.block_channels,
                                  context_dim=self.context_dim)
        self.fake_unet = SD15UNet(block_channels=self.block_channels,
                                  context_dim=self.context_dim)
        self.cls_pred_branch = ClsHead(self.block_channels[-1])
        self.alphas_cumprod = make_alphas_cumprod(self.num_train_timesteps)

    # -- building blocks ----------------------------------------------------

    def _predict_noise(self, unet, noisy, text_emb, uncond_emb, t,
                       guidance_scale: float):
        """CFG epsilon prediction (ref sd_guidance.py:19-48), batched as
        one 2B forward when guidance > 1."""
        if guidance_scale > 1.0:
            both = jnp.concatenate([noisy, noisy])
            embs = jnp.concatenate([uncond_emb, text_emb])
            tt = jnp.concatenate([t, t])
            eps = unet(both, tt, embs)
            eps_uncond, eps_text = jnp.split(eps, 2)
            return eps_uncond + guidance_scale * (eps_text - eps_uncond)
        return unet(noisy, t, text_emb)

    def compute_cls_logits(self, image, text_emb, rng):
        if self.diffusion_gan:
            t_rng, n_rng = jax.random.split(rng)
            t = jax.random.randint(t_rng, (image.shape[0],), 0,
                                   self.diffusion_gan_max_timestep)
            noise = jax.random.normal(n_rng, image.shape, image.dtype)
            image = add_noise(image, noise, t, self.alphas_cumprod)
        else:
            t = jnp.zeros((image.shape[0],), jnp.int32)
        rep = self.fake_unet(image, t, text_emb, classify=True)
        return self.cls_pred_branch(rep.astype(jnp.float32))

    # -- losses -------------------------------------------------------------

    def distribution_matching_loss(self, latents, text_emb, uncond_emb, rng):
        b = latents.shape[0]
        min_step = int(self.min_step_percent * self.num_train_timesteps)
        max_step = int(self.max_step_percent * self.num_train_timesteps)
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(
            t_rng, (b,), min_step,
            min(max_step + 1, self.num_train_timesteps))
        noise = jax.random.normal(n_rng, latents.shape, latents.dtype)
        stop = jax.lax.stop_gradient
        noisy = add_noise(stop(latents), noise, t, self.alphas_cumprod)

        eps_fake = self._predict_noise(self.fake_unet, noisy, text_emb,
                                       uncond_emb, t,
                                       self.fake_guidance_scale)
        x0_fake = get_x0_from_noise(noisy, eps_fake, self.alphas_cumprod, t)
        eps_real = self._predict_noise(self.real_unet, noisy, text_emb,
                                       uncond_emb, t,
                                       self.real_guidance_scale)
        x0_real = get_x0_from_noise(noisy, eps_real, self.alphas_cumprod, t)

        lat32 = latents.astype(jnp.float32)
        p_real = stop(lat32) - x0_real
        p_fake = stop(lat32) - x0_fake
        grad = (p_real - p_fake) / jnp.mean(
            jnp.abs(p_real), axis=(1, 2, 3), keepdims=True)
        grad = jnp.nan_to_num(grad)
        # detached-target MSE: d/dlatents = grad (ref :246)
        target = stop(lat32 - grad)
        loss = 0.5 * jnp.mean((lat32 - target) ** 2)
        return loss, {"dm_gradient_norm": jnp.linalg.norm(grad)}

    def loss_fake(self, latents, text_emb, uncond_emb, rng):
        """Critic epsilon MSE; latents detached (ref :268-321)."""
        latents = jax.lax.stop_gradient(latents)
        b = latents.shape[0]
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (b,), 0, self.num_train_timesteps)
        noise = jax.random.normal(n_rng, latents.shape, latents.dtype)
        noisy = add_noise(latents, noise, t, self.alphas_cumprod)
        eps = self._predict_noise(self.fake_unet, noisy, text_emb,
                                  uncond_emb, t, 1.0)
        return jnp.mean((eps.astype(jnp.float32)
                         - noise.astype(jnp.float32)) ** 2)

    # -- the two turns ------------------------------------------------------

    def generator_forward(self, image_latents, text_emb, uncond_emb,
                          rng) -> Dict[str, jnp.ndarray]:
        """Generator-side losses (ref :338-377). Gradients flow to
        ``image_latents`` only; freeze fake/real via optimizer masks."""
        rng_dm, rng_cls = jax.random.split(rng)
        out = {}
        if not self.gan_alone:
            loss_dm, aux = self.distribution_matching_loss(
                image_latents, text_emb, uncond_emb, rng_dm)
            out["loss_dm"] = loss_dm
            out.update(aux)
        if self.cls_on_clean_image:
            logits = self.compute_cls_logits(image_latents, text_emb, rng_cls)
            out["gen_cls_loss"] = jnp.mean(jax.nn.softplus(-logits))
        return out

    def guidance_forward(self, fake_latents, real_latents, text_emb,
                         uncond_emb, real_text_emb,
                         rng) -> Dict[str, jnp.ndarray]:
        """Critic-side losses (ref :408-438)."""
        rng_fake, rng_r, rng_f = jax.random.split(rng, 3)
        out = {"loss_fake_mean": self.loss_fake(
            fake_latents, text_emb, uncond_emb, rng_fake)}
        if self.cls_on_clean_image:
            stop = jax.lax.stop_gradient
            on_real = self.compute_cls_logits(stop(real_latents),
                                              real_text_emb, rng_r)
            on_fake = self.compute_cls_logits(stop(fake_latents),
                                              text_emb, rng_f)
            out["guidance_cls_loss"] = (
                jnp.mean(jax.nn.softplus(on_fake))
                + jnp.mean(jax.nn.softplus(-on_real)))
            out["pred_realism_on_real"] = jnp.mean(jax.nn.sigmoid(on_real))
            out["pred_realism_on_fake"] = jnp.mean(jax.nn.sigmoid(on_fake))
        return out

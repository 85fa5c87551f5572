"""Image-to-video pipeline (TPU-native rebuild of wan/image2video.py:29-389).

Same structure as WanT2V but with the i2v conditioning: the first video
frame is VAE-encoded, concatenated with a first-frame temporal mask into
``y`` (extra 20 input channels), and CLIP ViT features of the image ride in
as ``clip_fea`` cross-attention context (ref :235-271)."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.configs import WanConfig
from wanq_tpu.models.dit import dit_forward
from wanq_tpu.pipelines.text2video import WanT2V


def i2v_latent_size(cfg: WanConfig, img_hw: Tuple[int, int], max_area: int):
    """Aspect-preserving latent size from max_area (ref image2video.py:200-213)."""
    h, w = img_hw
    ar = h / w
    lat_h = round(
        np.sqrt(max_area * ar) // cfg.vae_stride[1] // cfg.patch_size[1]
        * cfg.patch_size[1]
    )
    lat_w = round(
        np.sqrt(max_area / ar) // cfg.vae_stride[2] // cfg.patch_size[2]
        * cfg.patch_size[2]
    )
    return int(lat_h), int(lat_w)


def first_frame_mask(
    frame_num: int, lat_h: int, lat_w: int, t_stride: int = 4
) -> jax.Array:
    """[t_stride, F_lat, lat_h, lat_w] mask: 1 on the (t_stride-repeated)
    first frame (ref image2video.py:235-242; the reference hard-codes the
    Wan temporal stride 4)."""
    msk = jnp.zeros((1, frame_num, lat_h, lat_w), jnp.float32)
    msk = msk.at[:, 0].set(1.0)
    msk = jnp.concatenate(
        [jnp.repeat(msk[:, 0:1], t_stride, axis=1), msk[:, 1:]], axis=1
    )
    msk = msk.reshape(
        1, (frame_num - 1) // t_stride + 1, t_stride, lat_h, lat_w
    )
    return jnp.swapaxes(msk, 1, 2)[0]  # [t_stride, F_lat, h, w]


@dataclasses.dataclass
class WanI2V(WanT2V):
    """Reuses the jitted batched-CFG step machinery of WanT2V, adding the
    conditioning inputs (ref WanI2V.generate, image2video.py:134-389)."""

    vae: Optional[Any] = None  # wanq_tpu.models.vae.WanVAE
    clip: Optional[Any] = None  # wanq_tpu.models.clip.CLIPModel

    def _build_step_fn(self, seq_len: int, mode: str):
        cfg = self.config
        closure_ctx = self.quant_ctx if mode == "calib" else None

        def step(params, qctx, latents, t, context, context_null, guide_scale,
                 y, clip_fea):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            c2 = jnp.concatenate([context, context_null], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y, y], axis=0)
            cf2 = jnp.concatenate([clip_fea, clip_fea], axis=0)
            use_ctx = qctx if qctx is not None else closure_ctx
            out = dit_forward(
                params, cfg, x2, t2, c2, seq_len, ctx=use_ctx,
                clip_fea=cf2, y=y2, plan=self.shardings,
            )
            cond, uncond = out[:b], out[b:]
            return uncond + guide_scale * (cond - uncond)

        return jax.jit(step)

    def _build_split_step_fn(self, seq_len: int):
        """Batched CFG pair returning (cond, uncond) separately with the
        i2v conditioning — the caching loop holds the raw uncond across
        steps (see WanT2V._generate_cached)."""
        cfg = self.config

        def step(params, qctx, latents, t, context, context_null, y,
                 clip_fea):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            c2 = jnp.concatenate([context, context_null], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y, y], axis=0)
            cf2 = jnp.concatenate([clip_fea, clip_fea], axis=0)
            out = dit_forward(
                params, cfg, x2, t2, c2, seq_len, ctx=qctx,
                clip_fea=cf2, y=y2, plan=self.shardings,
            )
            return out[:b], out[b:]

        return jax.jit(step)

    def _build_cond_step_fn(self, seq_len: int):
        """Single-branch [B] forward with the i2v conditioning inputs —
        the sequential-CFG building block (see WanT2V.generate cfg_mode;
        at i2v-14B 720p the batched pair doubles activation memory past
        what fits next to the weight state on one 16 GB chip)."""
        cfg = self.config

        def step(params, qctx, latents, t, context, y, clip_fea):
            return dit_forward(
                params, cfg, latents, t, context, seq_len, ctx=qctx,
                clip_fea=clip_fea, y=y, plan=self.shardings,
            )

        return jax.jit(step)

    def generate(
        self,
        img: jax.Array,
        context: jax.Array,
        context_null: jax.Array,
        max_area: int = 720 * 1280,
        frame_num: int = 81,
        shift: float = 5.0,
        sample_solver: str = "unipc",
        sampling_steps: int = 40,
        guide_scale: float = 5.0,
        seed: int = -1,
        clip_fea: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        ref_latents: Optional[jax.Array] = None,
        ref_latent_strength: float = 0.01,
        cfg_mode: str = "batched",
        cache_policy: Optional[Any] = None,
        on_step: Optional[Any] = None,
    ):
        """img: [3, H, W] in [-1, 1]. Returns latents [1, 16, F_lat, h, w];
        decode via self.vae. ``clip_fea``/``y`` may be precomputed (tests /
        checkpoint-free runs).

        ``ref_latents``: optional encoded reference-video latents
        [z_dim, F_lat, lat_h, lat_w] mixed into the initial noise as
        (1−s)·noise + s·ref (the capability of the reference's dev-scratch
        WanI2V_Noise variant, image2video_noise_easy.py — its hard-coded
        0.99/0.01 mix and developer paths become explicit arguments)."""
        cfg = self.config
        lat_h, lat_w = i2v_latent_size(cfg, img.shape[1:], max_area)
        h, w = lat_h * cfg.vae_stride[1], lat_w * cfg.vae_stride[2]
        lat_f = (frame_num - 1) // cfg.vae_stride[0] + 1
        seq_len = (
            lat_f * lat_h * lat_w // (cfg.patch_size[1] * cfg.patch_size[2])
        )
        seq_len = int(math.ceil(seq_len / self.sp_size)) * self.sp_size

        seed = seed if seed >= 0 else np.random.randint(0, 2**31)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (1, cfg.z_dim, lat_f, lat_h, lat_w),
            dtype=jnp.float32,
        )
        if ref_latents is not None:
            s = float(ref_latent_strength)
            noise = (1.0 - s) * noise + s * ref_latents[None].astype(noise.dtype)

        msk = first_frame_mask(frame_num, lat_h, lat_w, cfg.vae_stride[0])

        if clip_fea is None:
            assert self.clip is not None, "need a CLIPModel or precomputed clip_fea"
            clip_fea = self.clip.visual(img[None, :, None])  # [1, 257, 1280]
        if y is None:
            assert self.vae is not None, "need a WanVAE or precomputed y"
            img_r = jax.image.resize(img[None], (1, 3, h, w), method="cubic")
            vid = jnp.concatenate(
                [img_r[:, :, None], jnp.zeros((1, 3, frame_num - 1, h, w))], axis=2
            )
            y_lat = self.vae.encode(vid)[0]  # [16, F_lat, h', w']
            y = jnp.concatenate([msk, y_lat], axis=0)[None]
        elif y.ndim == 4:
            y = y[None]

        sch, timesteps = self._make_scheduler(sample_solver, sampling_steps, shift)
        if cfg_mode not in ("batched", "sequential"):
            raise ValueError(f"unknown cfg_mode {cfg_mode!r}")
        sequential = cfg_mode == "sequential"
        mode = self.quant_ctx.mode if self.quant_ctx is not None else "fp"
        step_fn = (self._step_fn(seq_len, "cond") if sequential
                   else self._step_fn(seq_len, mode))
        arg_ctx = self.quant_ctx if mode in ("sim", "int8") else None

        gs = jnp.float32(guide_scale)
        latents = noise

        if cache_policy is not None and cache_policy.active:
            # ride WanT2V's cached loop with the i2v conditioning bound
            # into the step fns (StepCachePolicy / AdaptiveCachePolicy)
            raw_cond = self._step_fn(seq_len, "cond")

            def cond_fn(params, qctx, lat, tt, ctx_):
                return raw_cond(params, qctx, lat, tt, ctx_, y, clip_fea)

            if sequential:
                split_fn = None  # cached loop builds it from cond_fn
            else:
                raw_split = self._step_fn(seq_len, "split")

                def split_fn(params, qctx, lat, tt, ctx_, ctx_null):
                    return raw_split(params, qctx, lat, tt, ctx_, ctx_null,
                                     y, clip_fea)

            return self._generate_cached(
                cache_policy, sch, timesteps, latents, arg_ctx,
                context, context_null, gs, seq_len, 1,
                sequential=sequential, on_step=on_step,
                cond_fn=cond_fn, split_fn=split_fn,
            )

        for i, t in enumerate(timesteps):
            tt = jnp.full((1,), float(t), dtype=jnp.float32)
            if sequential:
                cond = step_fn(self.params, arg_ctx, latents, tt, context,
                               y, clip_fea)
                uncond = step_fn(self.params, arg_ctx, latents, tt,
                                 context_null, y, clip_fea)
                noise_pred = uncond + gs * (cond - uncond)
            else:
                noise_pred = step_fn(
                    self.params, arg_ctx, latents, tt, context, context_null,
                    gs, y, clip_fea
                )
            latents = sch.step(noise_pred, int(t), latents)
            if on_step is not None:
                on_step(i, float(t), latents)
        return latents

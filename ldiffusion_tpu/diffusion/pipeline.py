"""The L-Diffusion pipeline: SD components + the two core transforms.

1. ``one_step_transform`` — the "diffusion feature extraction" applied to
   every segmentor input: VAE encode → PNDM ``set_timesteps(1)`` → one UNet
   pass → scheduler step → ``decode_latents`` → [0,1] image (reference
   ``segmentor.py:86-112``, ``utils.py:176-206``).

2. ``trajectory_features`` — the stage-1 warm-up forward: per timestep t,
   add Laplace(0, sqrt(1-ᾱ_t)) noise to the *same* clean latents, run the
   UNet, decode its raw output as latents (the reference feeds the UNet
   output straight into ``vae.decode`` — it is NOT used as an epsilon
   prediction here), grayscale-reduce to 64×64 and stack along channels
   (reference ``ldiffusion.py:227-252``). Expressed as one ``lax.scan`` so
   the whole trajectory jits into a single XLA program and remats cleanly.

Faithfulness notes (quirks preserved because the fine-tuned weights depend
on them): latents are the raw VAE mean — NOT scaled by 0.18215 — while
``decode_latents`` divides by 0.18215; PNDM's PLMS duplicate step means
``num_inference_steps//5`` timesteps yield ``steps+1`` trajectory channels.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldiffusion_tpu.diffusion.schedulers import PNDMScheduler
from ldiffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from ldiffusion_tpu.models.tokenizer import CLIPTokenizer
from ldiffusion_tpu.models.unet import UNet2DCondition, UNet2DConditionConfig
from ldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from ldiffusion_tpu.ops.resize import resize_bilinear, rgb_to_gray

# Fixed conditioning prompt (reference ldiffusion.py:211, segmentor.py:93).
DEFAULT_PROMPT = "A pathological slide"
# Token ids of the prompt under the CLIP vocab: [bos, a, pathological, slide, eos].
# Precomputed so the pipeline works without tokenizer files (fixed prompt).
DEFAULT_PROMPT_IDS = (49406, 320, 29018, 10556, 49407)


def apply_proj(proj_params, emb):
    """The learned text-projection Linear(768 → cross_attention_dim)
    (reference ``ldiffusion.py:150``, fixed here to always use trained
    weights — the reference's ``utils.py:192`` untrained-Linear bug is
    deliberately not reproduced)."""
    return emb @ proj_params["kernel"] + proj_params["bias"]


def init_proj(rng, in_dim: int, out_dim: int):
    """Match torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    kr, br = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(kr, (in_dim, out_dim), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(br, (out_dim,), jnp.float32, -bound, bound),
    }


@dataclasses.dataclass
class SDComponents:
    """SD v1.5 model bundle (modules + params + tokenizer + scheduler)."""

    unet_config: UNet2DConditionConfig
    vae_config: VAEConfig
    text_config: CLIPTextConfig
    unet: UNet2DCondition
    vae: AutoencoderKL
    text: CLIPTextEncoder
    params: dict  # {"unet", "vae", "text", "proj"}
    tokenizer: Optional[CLIPTokenizer] = None
    scheduler: PNDMScheduler = dataclasses.field(default_factory=PNDMScheduler)
    prompt_ids: tuple = DEFAULT_PROMPT_IDS

    # -- construction -------------------------------------------------------
    @classmethod
    def load(cls, model_dir: str, dtype=jnp.bfloat16, rng=None,
             unet_override_dir: Optional[str] = None) -> "SDComponents":
        """Load from an SD checkpoint directory (diffusers layout). When
        ``unet_override_dir`` points at a fine-tuned UNet saved by this
        framework, it replaces the base UNet (reference
        ``segmentor.py:76-84``)."""
        from ldiffusion_tpu.models.convert import load_sd_component, load_unet_dir

        unet_cfg, unet_params = load_sd_component(model_dir, "unet")
        vae_cfg, vae_params = load_sd_component(model_dir, "vae")
        text_cfg, text_params = load_sd_component(model_dir, "text_encoder")
        proj = None
        if unet_override_dir is not None:
            unet_cfg, loaded, proj_flat = load_unet_dir(unet_override_dir)
            unet_params = {"params": loaded.get("params", loaded)} if "params" not in loaded else loaded
            proj = proj_flat
        rng = jax.random.key(0) if rng is None else rng
        if proj is None:
            proj = init_proj(rng, text_cfg.hidden_size, unet_cfg.cross_attention_dim)
        tokenizer = None
        try:
            tokenizer = CLIPTokenizer.from_pretrained(model_dir)
        except (FileNotFoundError, OSError):
            pass
        prompt_ids = DEFAULT_PROMPT_IDS
        if tokenizer is not None:
            prompt_ids = tuple(tokenizer([DEFAULT_PROMPT])["input_ids"][0])
        return cls(
            unet_config=unet_cfg, vae_config=vae_cfg, text_config=text_cfg,
            unet=UNet2DCondition(unet_cfg, dtype=dtype),
            vae=AutoencoderKL(vae_cfg, dtype=dtype),
            text=CLIPTextEncoder(text_cfg, dtype=dtype),
            params={"unet": unet_params["params"], "vae": vae_params["params"],
                    "text": text_params["params"], "proj": proj},
            tokenizer=tokenizer, prompt_ids=prompt_ids,
        )

    @classmethod
    def random(cls, rng=None, dtype=jnp.float32, image_size: int = 64,
               unet_config=None, vae_config=None, text_config=None) -> "SDComponents":
        """Randomly-initialized tiny bundle for tests/benchmarks without
        checkpoint files."""
        rng = jax.random.key(0) if rng is None else rng
        unet_cfg = unet_config or UNet2DConditionConfig.tiny()
        vae_cfg = vae_config or VAEConfig.tiny()
        text_cfg = text_config or CLIPTextConfig.tiny(
        )
        if text_config is None:
            text_cfg = dataclasses.replace(text_cfg, vocab_size=49408)
        unet = UNet2DCondition(unet_cfg, dtype=dtype)
        vae = AutoencoderKL(vae_cfg, dtype=dtype)
        text = CLIPTextEncoder(text_cfg, dtype=dtype)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        ls = max(image_size // 8, 8)
        unet_params = unet.init(
            r1, jnp.zeros((1, ls, ls, unet_cfg.in_channels)), jnp.int32(1),
            jnp.zeros((1, 5, unet_cfg.cross_attention_dim)),
        )["params"]
        vae_params = vae.init(r2, jnp.zeros((1, image_size, image_size, 3)))["params"]
        text_params = text.init(r3, jnp.zeros((1, 5), jnp.int32))["params"]
        proj = init_proj(r4, text_cfg.hidden_size, unet_cfg.cross_attention_dim)
        return cls(
            unet_config=unet_cfg, vae_config=vae_cfg, text_config=text_cfg,
            unet=unet, vae=vae, text=text,
            params={"unet": unet_params, "vae": vae_params, "text": text_params, "proj": proj},
        )

    # -- text ---------------------------------------------------------------
    def text_embeddings(self, params=None, batch_size: int = 1, prompt: Optional[str] = None):
        """CLIP last_hidden_state → learned projection (reference
        ``segmentor.py:54-60``). Uses the fixed-prompt ids unless a tokenizer
        is available for arbitrary prompts."""
        params = self.params if params is None else params
        if prompt is not None and prompt != DEFAULT_PROMPT:
            assert self.tokenizer is not None, "arbitrary prompt needs tokenizer files"
            ids = self.tokenizer([prompt] * batch_size)["input_ids"]
        else:
            ids = [list(self.prompt_ids)] * batch_size
        ids = jnp.asarray(ids, jnp.int32)
        hidden = self.text.apply({"params": params["text"]}, ids)
        return apply_proj(params["proj"], hidden)


# ---------------------------------------------------------------------------
# Pure transform functions (take params explicitly; jit-friendly)
# ---------------------------------------------------------------------------

def one_step_transform(components: SDComponents, params, images, text_emb):
    """images: (B, H, W, 3) normalized (imagenet stats); returns the
    1-step-diffusion transformed images in [0, 1], same spatial size 1024 is
    applied by callers (reference resizes the decoded PIL back to 1024,
    ``segmentor.py:107-108`` — here decode already returns input/8*8 size)."""
    sch = components.scheduler
    ts = sch.set_timesteps(1)
    t = jnp.int32(ts.values[0])
    latents = components.vae.apply({"params": params["vae"]}, images,
                                   method=components.vae.encode_mean)
    state = sch.init_state(latents.shape, latents.dtype)
    eps = components.unet.apply({"params": params["unet"]}, latents, t, text_emb)
    latents, _ = sch.step(ts, state, eps, t, latents)
    decoded = components.vae.apply({"params": params["vae"]}, latents,
                                   method=components.vae.decode_latents)
    return decoded


def trajectory_features(components: SDComponents, params, images,
                        key, num_inference_steps: int, remat: bool = True,
                        context_sharding=None):
    """The stage-1 forward pass (reference ``ldiffusion.py:209-252``).

    images: (B, 64, 64, 3) normalized. Returns (trajectory_gray, final_rgb):
      trajectory_gray: (B, 64, 64, T) stacked grayscale decodes per timestep
      final_rgb: (B, 64, 64, 3) last decode (caller upsamples to 1024 for the
                 VGG content loss, reference :251).
    """
    sch = components.scheduler
    steps = max(1, num_inference_steps)
    ts = sch.set_timesteps(steps)
    t_values = jnp.asarray(ts.array)  # (T,) includes the PLMS duplicate
    scales = jnp.sqrt(1.0 - jnp.asarray(sch.schedule.alphas_cumprod)[ts.array])

    latents = components.vae.apply({"params": params["vae"]}, images,
                                   method=components.vae.encode_mean)

    def step_fn(carry, inp):
        t, scale, k = inp
        noise = jax.random.laplace(k, latents.shape, latents.dtype) * scale.astype(latents.dtype)
        noisy = latents + noise
        denoised = components.unet.apply({"params": params["unet"]}, noisy, t, carry["emb"])
        rgb = components.vae.apply({"params": params["vae"]}, denoised,
                                   method=components.vae.decode)
        rgb64 = resize_bilinear(rgb, (64, 64))
        gray = rgb_to_gray(rgb64)  # (B,64,64,1)
        return carry, (gray[..., 0], rgb64)

    if remat:
        step_fn = jax.checkpoint(step_fn)

    keys = jax.random.split(key, len(ts))
    carry = {"emb": trajectory_text_emb(components, params, images.shape[0],
                                        sharding=context_sharding)}
    _, (grays, rgbs) = jax.lax.scan(step_fn, carry, (t_values, scales, keys))
    trajectory = jnp.moveaxis(grays, 0, -1)  # (B, 64, 64, T)
    final_rgb = rgbs[-1]
    return trajectory, final_rgb


def trajectory_text_emb(components: SDComponents, params, batch_size: int,
                        sharding=None):
    """Prompt embedding for the fixed training prompt, computed once at batch
    1 and broadcast. ``sharding`` (a replicated NamedSharding) pins the tiny
    (B, 77ish, D) tensor replicated under pjit — batch-sharding it forces
    GSPMD reshards in every cross-attention (SPMD remat warnings)."""
    ids = jnp.asarray([list(components.prompt_ids)], jnp.int32)
    hidden = components.text.apply({"params": params["text"]}, ids)
    emb = apply_proj(params["proj"], hidden)
    emb = jnp.broadcast_to(emb, (batch_size,) + emb.shape[1:])
    if sharding is not None:
        emb = jax.lax.with_sharding_constraint(emb, sharding)
    return emb

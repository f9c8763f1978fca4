from ldiffusion_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder  # noqa: F401
from ldiffusion_tpu.models.unet import UNet2DConditionConfig, UNet2DCondition  # noqa: F401
from ldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: F401

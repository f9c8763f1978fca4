from ldiffusion_tpu.diffusion.schedule import NoiseSchedule, sd15_schedule  # noqa: F401
from ldiffusion_tpu.diffusion.schedulers import (  # noqa: F401
    DDIMScheduler,
    LMSScheduler,
    PNDMScheduler,
    make_scheduler,
)

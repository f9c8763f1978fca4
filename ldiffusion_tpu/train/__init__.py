from ldiffusion_tpu.train.ldiffusion import DiffusionWarmupTrainer  # noqa: F401

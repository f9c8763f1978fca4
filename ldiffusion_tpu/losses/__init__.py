from ldiffusion_tpu.losses.dice import (  # noqa: F401
    CombinedLoss,
    dc_and_ce_loss,
    dc_and_focal_loss,
    deep_supervision_loss,
    micro_dice,
    robust_cross_entropy,
    soft_dice_loss,
)
from ldiffusion_tpu.losses.infonce import InfoNceLoss, contrastive_loss  # noqa: F401

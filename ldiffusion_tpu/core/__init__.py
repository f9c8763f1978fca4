from ldiffusion_tpu.core.config import (  # noqa: F401
    DiffusionTrainConfig,
    LDiffusionConfig,
    MeshConfig,
    SegmentorTrainConfig,
)
from ldiffusion_tpu.core.dist import MeshContext, make_mesh  # noqa: F401

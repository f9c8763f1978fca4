from ldiffusion_tpu.ops.attention import dot_product_attention  # noqa: F401
from ldiffusion_tpu.ops.resize import resize_bilinear, resize_nearest  # noqa: F401

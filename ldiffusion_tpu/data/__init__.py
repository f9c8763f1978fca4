from ldiffusion_tpu.data.labels import (  # noqa: F401
    PIXEL_TO_LABEL_CELL,
    PIXEL_TO_LABEL_TISSUE,
    convert_labels,
)
from ldiffusion_tpu.data.dataset import (  # noqa: F401
    SegmentationDataset,
    load_image,
    split_dataset,
)

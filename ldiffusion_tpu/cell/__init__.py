from ldiffusion_tpu.cell.instance import (  # noqa: F401
    DistanceWatershedProposer,
    FlowNetProposer,
    InstanceProposer,
)
from ldiffusion_tpu.cell.classifier import CellSegClassifier, CellTrainer  # noqa: F401

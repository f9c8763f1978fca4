from ldiffusion_tpu.segmentor.fingerprint import extract_fingerprint  # noqa: F401
from ldiffusion_tpu.segmentor.planner import SegPlan, plan_experiment  # noqa: F401
from ldiffusion_tpu.segmentor.preprocess import preprocess_case, PreprocessedDataset  # noqa: F401
from ldiffusion_tpu.segmentor.trainer import SegmentorTrainer  # noqa: F401
from ldiffusion_tpu.segmentor.predictor import SlidingWindowPredictor  # noqa: F401

from wst_tpu.utils.config import ExperimentConfig
from wst_tpu.utils.artifacts import save_artifacts, load_artifacts

__all__ = ["ExperimentConfig", "save_artifacts", "load_artifacts"]

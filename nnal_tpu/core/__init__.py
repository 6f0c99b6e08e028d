from nnal_tpu.core.config import ExperimentConfig, ModelConfig, QueryConfig, DataConfig
from nnal_tpu.core.rng import RngStream

"""kge_tpu: a TPU-native knowledge-graph-embedding framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of LibKGE
(uma-pi1/kge): configurable KGE training (negative sampling, 1vsAll, KvsAll),
filtered entity-ranking evaluation, a yaml config system, checkpoint/resume,
tracing, hyperparameter search, and a full model zoo — designed for sharded
execution over TPU device meshes.
"""

from kge_tpu.config import Config, Configurable
from kge_tpu.dataset import Dataset

__version__ = "0.1.0"

__all__ = ["Config", "Configurable", "Dataset"]

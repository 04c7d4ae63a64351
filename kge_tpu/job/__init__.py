"""Jobs: training, evaluation, search."""

from kge_tpu.job.job import Job, TrainingOrEvaluationJob
from kge_tpu.job.train import TrainingJob
from kge_tpu.job.train_negative_sampling import TrainingJobNegativeSampling
from kge_tpu.job.train_1vsAll import TrainingJob1vsAll
from kge_tpu.job.train_KvsAll import TrainingJobKvsAll
from kge_tpu.job.eval import EvaluationJob
from kge_tpu.job.eval_entity_ranking import EntityRankingJob
from kge_tpu.job.eval_entity_pair_ranking import EntityPairRankingJob
from kge_tpu.job.eval_training_loss import TrainingLossEvaluationJob
from kge_tpu.job.search_grash import GraSHSearchJob
from kge_tpu.job.search import (
    AutoSearchJob,
    AxSearchJob,
    GridSearchJob,
    ManualSearchJob,
    SearchJob,
)

__all__ = [
    "Job",
    "TrainingOrEvaluationJob",
    "TrainingJob",
    "TrainingJobNegativeSampling",
    "TrainingJob1vsAll",
    "TrainingJobKvsAll",
    "EvaluationJob",
    "EntityRankingJob",
    "EntityPairRankingJob",
    "TrainingLossEvaluationJob",
    "SearchJob",
    "ManualSearchJob",
    "GridSearchJob",
    "AutoSearchJob",
    "AxSearchJob",
    "GraSHSearchJob",
]

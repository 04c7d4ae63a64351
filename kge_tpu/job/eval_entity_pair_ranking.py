"""Entity-pair ranking evaluation (reference kge/job/eval_entity_pair_ranking.py:4-12).

Like the reference, this job is a declared-but-unimplemented placeholder: the
constructor wires it into the job registry so configs referencing it resolve,
but ``_evaluate`` is not provided.
"""

from __future__ import annotations

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.eval import EvaluationJob
from kge_tpu.job.job import Job


class EntityPairRankingJob(EvaluationJob):
    """Ranks (subject, object) pairs for a given relation."""

    def __init__(self, config: Config, dataset: Dataset, parent_job, model):
        super().__init__(config, dataset, parent_job, model)
        if self.__class__ == EntityPairRankingJob:
            for f in Job.job_created_hooks:
                f(self)

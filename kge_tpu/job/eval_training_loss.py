"""Training-loss evaluation: a forward-only pass of the training job over the
evaluation split (reference kge/job/eval_training_loss.py)."""

from __future__ import annotations

import time
from typing import Any, Dict

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.eval import EvaluationJob
from kge_tpu.job.job import Job


class TrainingLossEvaluationJob(EvaluationJob):
    def __init__(self, config: Config, dataset: Dataset, parent_job, model):
        super().__init__(config, dataset, parent_job, model)
        from kge_tpu.job.train import TrainingJob

        training_loss_eval_config = config.clone()
        training_loss_eval_config.set("job.type", "train")
        training_loss_eval_config.set("train.split", self.eval_split)
        self._train_job = TrainingJob.create(
            config=training_loss_eval_config, parent_job=self,
            dataset=dataset, model=model, forward_only=True,
        )
        if self.__class__ == TrainingLossEvaluationJob:
            for f in Job.job_created_hooks:
                f(self)

    def _evaluate(self) -> Dict[str, Any]:
        epoch_start = time.time()
        self._train_job.model_params = self.model_params
        self._train_job.epoch = self.epoch
        train_trace_entry = self._train_job.run_epoch()
        return dict(
            type="training_loss", scope="epoch",
            epoch=self.epoch, split=self.eval_split,
            epoch_time=time.time() - epoch_start,
            event="eval_completed",
            avg_loss=train_trace_entry["avg_loss"],
            avg_penalty=train_trace_entry["avg_penalty"],
            avg_cost=train_trace_entry["avg_cost"],
        )

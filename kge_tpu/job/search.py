"""Hyperparameter search jobs (stub for now; full implementation follows the
reference kge/job/search*.py in a later milestone)."""

from __future__ import annotations

from kge_tpu.config import Config
from kge_tpu.dataset import Dataset
from kge_tpu.job.job import Job


class SearchJob(Job):
    @staticmethod
    def create(config: Config, dataset: Dataset, parent_job=None) -> "SearchJob":
        from kge_tpu import misc

        search_type = config.get("search.type")
        class_name = config.get_default(search_type + ".class_name")
        return misc.init_from(
            class_name, config.get("modules"), config, dataset,
            parent_job=parent_job,
        )

"""Multi-host (multi-process) training: 2 processes x 2 virtual CPU devices
must reproduce the single-process 4-device run and write one checkpoint."""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = pathlib.Path(__file__).resolve().parent
REPO = TESTS_DIR.parent

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
data_folder = sys.argv[4]; out_folder = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from kge_tpu import Config, Dataset
from kge_tpu.job import TrainingJob

config = Config()
config.set("console.quiet", True)
config.load_options({{"model": "complex"}})
config.set("dataset.name", "synth_mp")
config.set("train.type", "negative_sampling")
config.set("train.batch_size", 64)
config.set("train.max_epochs", 2)
config.set("valid.every", 0)
config.set("parallel.data", 4)
config.set("parallel.model", 1)
config.set("parallel.partition_edges", "never")
config.set("parallel.distributed.coordinator_address", "localhost:" + port)
config.set("parallel.distributed.num_processes", n)
config.set("parallel.distributed.process_id", pid)
config.set("complex.entity_embedder.dim", 16, create=True)
config.set("complex.relation_embedder.dim", 16, create=True)
config.set("random_seed.default", 11)
config.folder = out_folder
from kge_tpu.parallel import distributed
assert distributed.maybe_initialize(config)
if pid == 0:
    config.init_folder()
dataset = Dataset.create(config, folder=data_folder)
job = TrainingJob.create(config, dataset)
job._prepare()
job._is_prepared = True
losses = []
for e in (1, 2):
    job.epoch = e
    losses.append(job.run_epoch()["avg_loss"])
job._save(config.checkpoint_file(2))
print("LOSSES", pid, losses, flush=True)

from kge_tpu.job import EvaluationJob
ev = EvaluationJob.create(config, dataset, job, job.model)
ev.model_params = job.model_params
ev.epoch = 2
trace = ev._evaluate()
print("MRR", pid, trace["mean_reciprocal_rank_filtered"], flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_training_matches_single_process(tmp_path):
    from tests.util import make_synthetic_dataset

    data_folder = make_synthetic_dataset(tmp_path / "synth_mp", seed=4)

    # single-process 4-device baseline
    from tests.util import get_test_config
    from kge_tpu import Dataset
    from kge_tpu.job import TrainingJob

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("dataset.name", "synth_mp")
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 64)
    config.set("valid.every", 0)
    config.set("parallel.data", 4)
    config.set("parallel.model", 1)
    config.set("complex.entity_embedder.dim", 16, create=True)
    config.set("complex.relation_embedder.dim", 16, create=True)
    config.set("random_seed.default", 11)
    dataset = Dataset.create(config, folder=str(data_folder))
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    base_losses = []
    for e in (1, 2):
        job.epoch = e
        base_losses.append(job.run_epoch()["avg_loss"])

    # two worker processes sharing the global mesh
    port = str(_free_port())
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO)))
    out_folder = tmp_path / "exp_mp"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port,
             str(data_folder), str(out_folder)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={k: v for k, v in os.environ.items()
                 if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    losses, mrrs = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                _, pid, rest = line.split(" ", 2)
                losses[int(pid)] = eval(rest)
            elif line.startswith("MRR"):
                _, pid, rest = line.split(" ", 2)
                mrrs[int(pid)] = float(rest)
    assert set(losses) == {0, 1}
    # filtered eval also runs under the multi-host mesh, same result on both
    assert set(mrrs) == {0, 1} and np.isclose(mrrs[0], mrrs[1])
    assert 0.0 <= mrrs[0] <= 1.0
    # both processes observe the same global losses
    assert np.allclose(losses[0], losses[1], rtol=1e-6)
    # and they match the single-process 4-device run
    assert np.allclose(base_losses, losses[0], rtol=1e-4, atol=1e-5), (
        base_losses, losses[0]
    )
    # only process 0 wrote the checkpoint
    assert (out_folder / "checkpoint_00002.pt").exists()


WORKER_PART = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
data_folder = sys.argv[4]; out_folder = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax, math
jax.config.update("jax_platforms", "cpu")
import numpy as np

from kge_tpu import Config, Dataset
from kge_tpu.job import TrainingJob

config = Config()
config.set("console.quiet", True)
config.load_options({{"model": "complex"}})
config.set("dataset.name", "synth_mp")
config.set("train.type", "negative_sampling")
config.set("train.batch_size", 64)
config.set("valid.every", 0)
config.set("parallel.data", 2)
config.set("parallel.model", 2)
config.set("parallel.partition_edges", "always")
config.set("parallel.distributed.coordinator_address", "localhost:" + port)
config.set("parallel.distributed.num_processes", n)
config.set("parallel.distributed.process_id", pid)
config.set("complex.entity_embedder.dim", 16, create=True)
config.set("complex.relation_embedder.dim", 16, create=True)
config.set("random_seed.default", 11)
config.folder = out_folder
from kge_tpu.parallel import distributed
assert distributed.maybe_initialize(config)
if pid == 0:
    config.init_folder()
dataset = Dataset.create(config, folder=data_folder)
job = TrainingJob.create(config, dataset)
job._prepare()
job._is_prepared = True
assert job._partition_edges

# each host holds a DISJOINT shard: poison every row this process's data
# shards do not own; the run only stays correct if the partitioned input
# pipeline reads local rows exclusively
D = 2
size = len(job.triples)
base = math.ceil(size / D)
local_shards = (pid,)   # 2 devices per process = one data row of the 2x2 mesh
tri = job.triples.copy()
owned = np.zeros(size, dtype=bool)
for s in local_shards:
    owned[s * base : min(size, (s + 1) * base)] = True
tri[~owned] = 2**31 - 7  # out-of-range garbage would crash any gather
job.triples = tri

losses = []
for e in (1, 2):
    job.epoch = e
    losses.append(job.run_epoch()["avg_loss"])
print("LOSSES", pid, losses, flush=True)

# sharded checkpoint: every process writes only its own shard file
job._save(config.checkpoint_file(2))
print("SAVED", pid, flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_disjoint_edge_partitions(tmp_path):
    """Two processes with disjoint triple shards (non-local rows poisoned)
    must reproduce the single-process partitioned trajectory exactly."""
    from tests.util import get_test_config, make_synthetic_dataset
    from kge_tpu import Dataset
    from kge_tpu.job import TrainingJob

    data_folder = make_synthetic_dataset(tmp_path / "synth_mp", seed=4)

    config = get_test_config()
    config.load_options({"model": "complex"})
    config.set("dataset.name", "synth_mp")
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 64)
    config.set("valid.every", 0)
    config.set("parallel.data", 2)
    config.set("parallel.model", 2)
    config.set("parallel.partition_edges", "always")
    config.set("complex.entity_embedder.dim", 16, create=True)
    config.set("complex.relation_embedder.dim", 16, create=True)
    config.set("random_seed.default", 11)
    dataset = Dataset.create(config, folder=str(data_folder))
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    assert job._partition_edges
    base_losses = []
    for e in (1, 2):
        job.epoch = e
        base_losses.append(job.run_epoch()["avg_loss"])

    port = str(_free_port())
    script = tmp_path / "worker_part.py"
    script.write_text(WORKER_PART.format(repo=str(REPO)))
    out_folder = tmp_path / "exp_mp_part"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port,
             str(data_folder), str(out_folder)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={k: v for k, v in os.environ.items()
                 if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                _, pid, rest = line.split(" ", 2)
                losses[int(pid)] = eval(rest)
    assert set(losses) == {0, 1}
    np.testing.assert_allclose(losses[0], base_losses, rtol=1e-6)
    np.testing.assert_allclose(losses[1], base_losses, rtol=1e-6)

    # the checkpoint was written as a main file plus one shard file per
    # process (no full gather); loading reassembles the global entity table
    # and must reproduce the single-process run's trained parameters
    from kge_tpu.utils.io import load_checkpoint

    cpt_file = str(out_folder / "checkpoint_00002.pt")
    assert os.path.isfile(cpt_file)
    assert os.path.isfile(cpt_file + ".shard00000")
    assert os.path.isfile(cpt_file + ".shard00001")
    checkpoint = load_checkpoint(cpt_file)
    loaded_params = checkpoint["model"][0]
    ent = np.asarray(loaded_params["entity_embedder"]["embeddings"])
    base_ent = np.asarray(
        job.model_params["entity_embedder"]["embeddings"]
    )
    np.testing.assert_allclose(ent, base_ent, rtol=1e-5, atol=1e-6)
    opt = checkpoint["optimizer_state"]
    assert opt is not None


WORKER_RESUME = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
data_folder = sys.argv[4]; out_folder = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from kge_tpu import Config, Dataset
from kge_tpu.job import Job

from kge_tpu.utils.io import load_checkpoint

config = Config()
config.set("console.quiet", True)
config.load_options({{"model": "complex"}})
config.set("dataset.name", "synth_mp")
config.set("train.type", "negative_sampling")
config.set("train.batch_size", 64)
config.set("train.max_epochs", 4)
config.set("valid.every", 0)
config.set("parallel.data", 2)
config.set("parallel.model", 2)
config.set("parallel.partition_edges", "always")
config.set("parallel.distributed.coordinator_address", "localhost:" + port)
config.set("parallel.distributed.num_processes", n)
config.set("parallel.distributed.process_id", pid)
config.set("complex.entity_embedder.dim", 16, create=True)
config.set("complex.relation_embedder.dim", 16, create=True)
config.set("random_seed.default", 11)
config.folder = out_folder
from kge_tpu.parallel import distributed
assert distributed.maybe_initialize(config)
dataset = Dataset.create(config, folder=data_folder)

# resume the sharded checkpoint written by the earlier 2-process run and
# train two more epochs
checkpoint = load_checkpoint(os.path.join(out_folder, "checkpoint_00002.pt"))
job = Job.create_from(checkpoint, new_config=config, dataset=dataset)
assert job.epoch == 2
losses = []
for e in (3, 4):
    job.epoch = e
    losses.append(job.run_epoch()["avg_loss"])
print("RESUMED", pid, losses, flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_resume_from_sharded_checkpoint(tmp_path):
    """A 2-process run resumes the sharded checkpoint written by another
    2-process run and continues training (multi-host elastic restart)."""
    from tests.util import make_synthetic_dataset

    data_folder = make_synthetic_dataset(tmp_path / "synth_mp", seed=4)
    out_folder = tmp_path / "exp_mp_resume"

    def launch(worker_src):
        port = str(_free_port())
        script = tmp_path / f"worker_{abs(hash(worker_src)) % 10**6}.py"
        script.write_text(worker_src.format(repo=str(REPO)))
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(pid), "2", port,
                 str(data_folder), str(out_folder)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env={k: v for k, v in os.environ.items()
                     if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
            )
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=540)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
        return outs

    launch(WORKER_PART)  # trains 2 epochs + writes the sharded checkpoint
    outs = launch(WORKER_RESUME)

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESUMED"):
                _, pid, rest = line.split(" ", 2)
                losses[int(pid)] = eval(rest)
    assert set(losses) == {0, 1}
    assert losses[0] == losses[1]
    assert all(np.isfinite(v) for v in losses[0])

"""Make the reference LibKGE importable for golden parity tests.

The environment has torch but no numba/igraph; the reference only uses
``@numba.njit`` (a no-op on tiny test data) and ``numba.typed.Dict`` (a plain
dict works). This installs a minimal stub so ``import kge`` succeeds, then
puts /root/reference on sys.path.

The stub exists ONLY so tests can compare our numerics against the actual
reference implementation; nothing in kge_tpu imports it.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def install():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.njit = njit
        numba.jit = njit

        typed = types.ModuleType("numba.typed")

        class _TypedDict(dict):
            @staticmethod
            def empty(*args, **kwargs):
                return _TypedDict()

        typed.Dict = _TypedDict
        typed.List = list
        numba.typed = typed

        core_types = types.ModuleType("numba.core.types")
        for name in ("int32", "int64", "float32", "float64", "UniTuple", "Tuple"):
            setattr(core_types, name, object())
        numba.types = core_types
        numba.int32 = numba.int64 = numba.float32 = numba.float64 = object()

        sys.modules["numba"] = numba
        sys.modules["numba.typed"] = typed
        sys.modules["numba.core"] = types.ModuleType("numba.core")
        sys.modules["numba.core.types"] = core_types

    if "ax" not in sys.modules:
        # Ax Bayesian-optimization search, untouched by parity tests
        ax = types.ModuleType("ax")
        ax.Models = object
        service = types.ModuleType("ax.service")
        ax_client = types.ModuleType("ax.service.ax_client")
        ax_client.AxClient = object
        ax.Models = types.SimpleNamespace(SOBOL=0, GPEI=1)
        gs_mod = types.ModuleType("ax.modelbridge.generation_strategy")
        gs_mod.GenerationStrategy = object
        gs_mod.GenerationStep = object
        sys.modules["ax"] = ax
        sys.modules["ax.service"] = service
        sys.modules["ax.service.ax_client"] = ax_client
        sys.modules["ax.modelbridge"] = types.ModuleType("ax.modelbridge")
        sys.modules["ax.modelbridge.generation_strategy"] = gs_mod
        ax.service = service
        service.ax_client = ax_client

    if "hpbandster" not in sys.modules:
        # GraSH / HyperBand search, untouched by parity tests
        hp = types.ModuleType("hpbandster")
        core = types.ModuleType("hpbandster.core")
        nameserver = types.ModuleType("hpbandster.core.nameserver")
        nameserver.NameServer = object
        result_mod = types.ModuleType("hpbandster.core.result")
        result_mod.json_result_logger = object
        worker_mod = types.ModuleType("hpbandster.core.worker")
        worker_mod.Worker = object
        optimizers = types.ModuleType("hpbandster.optimizers")
        optimizers.HyperBand = object
        hyperband = types.ModuleType("hpbandster.optimizers.hyperband")
        hyperband.HyperBand = object
        master = types.ModuleType("hpbandster.core.master")
        master.Master = object
        iterations = types.ModuleType("hpbandster.core.base_iteration")
        iterations.BaseIteration = object
        for n, m in [
            ("hpbandster", hp), ("hpbandster.core", core),
            ("hpbandster.core.nameserver", nameserver),
            ("hpbandster.core.result", result_mod),
            ("hpbandster.core.worker", worker_mod),
            ("hpbandster.core.master", master),
            ("hpbandster.core.base_iteration", iterations),
            ("hpbandster.optimizers", optimizers),
            ("hpbandster.optimizers.hyperband", hyperband),
        ]:
            sys.modules[n] = m

    for name in ("ConfigSpace", "ConfigSpace.hyperparameters"):
        # search-space bridge, untouched by parity tests
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.ConfigurationSpace = object
            mod.UniformFloatHyperparameter = object
            mod.UniformIntegerHyperparameter = object
            mod.CategoricalHyperparameter = object
            mod.Constant = object
            sys.modules[name] = mod

    if "igraph" not in sys.modules:
        # only used by the reference's k-core search machinery, which the
        # parity tests never touch
        igraph = types.ModuleType("igraph")
        igraph.Graph = object
        sys.modules["igraph"] = igraph

    if "path" not in sys.modules:
        # the `path` library's Path is used as a chdir context manager in
        # kge/misc.py:58 only
        import os

        path_mod = types.ModuleType("path")

        class _Path(str):
            def __enter__(self):
                self._old = os.getcwd()
                os.chdir(self)
                return self

            def __exit__(self, *exc):
                os.chdir(self._old)
                return False

        path_mod.Path = _Path
        sys.modules["path"] = path_mod

    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)


def libkge_available() -> bool:
    try:
        install()
        import kge  # noqa

        return True
    except Exception:
        return False

"""Run the bench workload with config overrides from the command line:

    python scripts/exp_bench.py train.sparse_embedding_update=always ...

Prints triples/s like bench.py (stderr diagnostics only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    overrides = []
    for arg in sys.argv[1:]:
        key, value = arg.split("=", 1)
        for conv in (int, float):
            try:
                value = conv(value)
                break
            except ValueError:
                continue
        if value in ("True", "true"):
            value = True
        if value in ("False", "false"):
            value = False
        overrides.append((key, value))

    job = bench.build_job(overrides)
    job._prepare()
    job._is_prepared = True

    n = 10
    t0 = time.time()
    job.run_epoch_group(n)
    compile_time = time.time() - t0
    t0 = time.time()
    traces = job.run_epoch_group(n)
    group_time = time.time() - t0
    trace = traces[-1]
    tps = trace["size"] * n / group_time
    print(
        f"{tps/1e6:.3f}M triples/s  ({group_time/n*1e3:.1f} ms/epoch, "
        f"compile {compile_time:.0f}s, avg_loss {trace['avg_loss']:.4f}) "
        f"overrides={overrides}"
    )


if __name__ == "__main__":
    main()

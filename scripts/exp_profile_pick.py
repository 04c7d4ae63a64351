"""Profile the pick-based exact step: per-op time breakdown via xprof."""

import functools
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CACHE_ROOT = os.environ.get("KGE_CACHE", os.path.expanduser("~/.cache/kge_tpu"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_ROOT, "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

import jax
import jax.numpy as jnp

from exp_exact_scan import make_step, B, VP, D, NR, STEPS  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    E = jax.random.normal(key, (VP, D), jnp.float32) * 0.1
    R = jax.random.normal(key, (NR, D), jnp.float32) * 0.1
    step = make_step("pick", jnp.bfloat16, 2)

    def body(carry, k):
        return step(carry, k), ()

    f = jax.jit(lambda c, ks: jax.lax.scan(body, c, ks)[0])
    keys = jax.random.split(jax.random.PRNGKey(1), STEPS)
    out = f((E, R), keys)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)

    logdir = "/tmp/pickprof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = f((E, R), keys)
        jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)

    from xprof.convert import raw_to_tool_data

    xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplane, "framework_op_stats", {}
    )
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -float(r.get("total_self_time_in_us", 0) or 0))
    total = sum(float(r.get("total_self_time_in_us", 0) or 0) for r in rows)
    print(f"total device self time: {total/1e3:.1f} ms over {STEPS} steps")
    for r in rows[:18]:
        t = float(r.get("total_self_time_in_us", 0) or 0)
        print(
            f"{t/1e3:8.2f} ms {100*t/total:5.1f}%  {r.get('op_type','?'):24s} "
            f"{(r.get('op_name','?') or '?')[:90]}"
        )


if __name__ == "__main__":
    main()

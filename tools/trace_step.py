"""Trace the production train step on the real chip and print an op-level
time breakdown (self-time by op category + top ops), parsed from the JAX
profiler's xplane output via tensorboard_plugin_profile.

Usage (axon remote TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_step.py

Env knobs: TRACE_BATCH (16), TRACE_STEPS (3), TRACE_DIR (/tmp/jax_trace).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir: str) -> dict:
    """Aggregate device op time from the trace.json.gz chrome trace the
    profiler writes next to the xplane file."""
    import gzip

    out: dict[str, float] = {}
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return {}
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    # only the "XLA Ops" thread of the device process carries leaf op
    # events; "XLA Modules"/"Steps" are containers and would double-count
    pid_names, tid_names = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        if ("TPU" not in pname and "/device" not in pname.lower()) or tname != "XLA Ops":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        out[name] = out.get(name, 0.0) + dur
    return out


_CATEGORIES = (
    ("fusion", ("fusion",)),
    ("convolution", ("convolution", "conv")),
    ("window/reduce", ("reduce-window", "reduce_window", "select-and-scatter")),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("dynamic-slice/update", ("dynamic-slice", "dynamic-update")),
    ("custom-call (pallas etc.)", ("custom-call",)),
    ("all-reduce/collective", ("all-reduce", "all-gather", "collective")),
)


def categorize(op_times: dict) -> dict:
    agg = {k: 0.0 for k, _ in _CATEGORIES}
    agg["other"] = 0.0
    for name, t in op_times.items():
        low = name.lower()
        for cat, pats in _CATEGORIES:
            if any(p in low for p in pats):
                agg[cat] += t
                break
        else:
            agg["other"] += t
    return agg


def main() -> None:
    import importlib.util

    import jax
    import numpy as np

    import bench as benchmod  # repo-root bench.py: production aug + step builders
    from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from viscy_tpu.training.state import TrainState

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(benchmod.__file__), "__graft_entry__.py")
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/jax_trace")
    b = int(os.environ.get("TRACE_BATCH", "16"))
    n_steps = int(os.environ.get("TRACE_STEPS", "3"))

    mesh = make_mesh()
    module = graft._flagship(tiny=benchmod._TINY)
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((b, 1, *benchmod.STACK), np.float32),
        "target": rng.random((b, 2, *benchmod.STACK), np.float32),
    }
    init_batch = {
        k: v[:, :, : benchmod.PATCH[0], : benchmod.PATCH[1], : benchmod.PATCH[2]]
        for k, v in batch.items()
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)
    step = benchmod._build_step(module, benchmod._production_aug(), mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    for w in range(2):
        state, loss = step(state, device_batch, jax.random.fold_in(key, 100 + w))
    print("warm loss:", float(jax.device_get(loss)), flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            state, loss = step(state, device_batch, jax.random.fold_in(key, i))
        _ = float(jax.device_get(loss))
    wall = time.perf_counter() - t0
    print(f"traced {n_steps} steps in {wall:.3f}s ({wall / n_steps * 1e3:.1f} ms/step)")

    op_times = aggregate_trace(trace_dir)
    if not op_times:
        print("NO DEVICE EVENTS FOUND in chrome trace; files present:")
        for f in glob.glob(f"{trace_dir}/**/*", recursive=True):
            print("  ", f)
        return
    total = sum(op_times.values())
    print(f"\ntotal device op time: {total / 1e3:.1f} ms over {n_steps} steps")
    cats = categorize(op_times)
    print("\n== by category ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{v / total * 100:6.1f}%  {v / 1e3 / n_steps:8.2f} ms/step  {k}")
    print("\n== top 25 ops ==")
    for name, t in sorted(op_times.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t / total * 100:6.1f}%  {t / 1e3 / n_steps:8.2f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()

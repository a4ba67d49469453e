"""Trace the DynaCLR contrastive train step on the real chip and print an
op-level time breakdown (same aggregation as ``tools/trace_step.py``).

The round-4 closeout measured the step latency-bound (MFU 4.8%, HBM util
26.6% at 321.6 cells/s/chip) — this tool attributes the gap.

Usage (axon remote TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_dynaclr.py

Env knobs: TRACE_STEPS (3), TRACE_DIR (/tmp/jax_trace_dynaclr),
BENCH_DYNACLR_BATCH / BENCH_DYNACLR_AUG_CHUNK (forwarded to the bench
setup).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_step import aggregate_trace, categorize  # noqa: E402


def main() -> None:
    import glob

    import jax

    import bench as benchmod
    from viscy_tpu.parallel.mesh import make_mesh

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/jax_trace_dynaclr")
    n_steps = int(os.environ.get("TRACE_STEPS", "3"))

    mesh = make_mesh()
    n_dev = jax.device_count()
    step, state, device_batch, key, b = benchmod._dynaclr_setup(mesh, n_dev)

    for w in range(2):
        state, loss = step(state, device_batch, jax.random.fold_in(key, 100 + w))
    print("warm loss:", float(jax.device_get(loss)), flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            state, loss = step(state, device_batch, jax.random.fold_in(key, i))
        _ = float(jax.device_get(loss))
    wall = time.perf_counter() - t0
    print(
        f"traced {n_steps} steps in {wall:.3f}s ({wall / n_steps * 1e3:.1f} ms/step, "
        f"{b / (wall / n_steps) / n_dev:.1f} cells/s/chip)"
    )

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
    print("\n== top 30 ops ==")
    for name, t in sorted(op_times.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t / total * 100:6.1f}%  {t / 1e3 / n_steps:8.2f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()

"""Print the largest copy/transpose ops of the compiled production step.

Complements tools/trace_step.py (which gives per-op *time*): this maps the
copy ops to their source locations via HLO metadata, so the layout-copy
slice of the step can be attributed to model code.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/inspect_hlo.py
Env: HLO_KIND=copy|fusion|all (default copy), HLO_TOP (default 25).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}


def shape_bytes(shape: str) -> int:
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def main() -> None:
    import importlib.util

    import jax
    import numpy as np

    import bench

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from viscy_tpu.training.state import TrainState

    mesh = make_mesh()
    n_dev = jax.device_count()
    module = graft._flagship()
    b = 16 * n_dev
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((b, 1, *bench.STACK), np.float32),
        "target": rng.random((b, 2, *bench.STACK), np.float32),
    }
    init_batch = {
        k: v[:, :, : bench.PATCH[0], : bench.PATCH[1], : bench.PATCH[2]]
        for k, v in batch.items()
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    step = bench._build_step(module, bench._production_aug(), mesh)
    compiled = step.lower(state, device_batch, jax.random.fold_in(key, 0)).compile()
    text = compiled.as_text()

    kind = os.environ.get("HLO_KIND", "copy")
    top = int(os.environ.get("HLO_TOP", "25"))
    pat = {
        "copy": r"^\s*(?:ROOT )?%?([\w.\-]*(?:copy|transpose)[\w.\-]*) = ([^\s]+) ",
        "fusion": r"^\s*(?:ROOT )?%?([\w.\-]*fusion[\w.\-]*) = ([^\s]+) ",
        "all": r"^\s*(?:ROOT )?%?([\w.\-]+) = ([^\s]+) ",
    }[kind]
    rows = []
    for line in text.splitlines():
        m = re.match(pat, line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        meta = ""
        mm = re.search(r'op_name="([^"]*)"', line)
        if mm:
            meta = mm.group(1)
        sloc = ""
        sm = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        if sm:
            sloc = f'{sm.group(1).split("/")[-1]}:{sm.group(2)}'
        rows.append((shape_bytes(shape), name, shape, meta, sloc))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} {kind} ops, {total / 1e9:.2f} GB total output bytes")
    for bts, name, shape, meta, sloc in rows[:top]:
        print(f"{bts / 1e6:9.1f} MB  {name:28s} {shape:40s} {sloc}")
        if meta:
            print(f"            {meta[:150]}")


if __name__ == "__main__":
    main()

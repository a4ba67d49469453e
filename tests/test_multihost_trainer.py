"""2-process ``Trainer.fit`` e2e test — the production multi-host path.

Where ``test_multihost.py`` proves the sharded *step* (hand-rolled), this
proves the shipped stack: ``maybe_initialize`` env bootstrap, the
``DataLoader``-level ``ShardedDistributedSampler`` auto-attach, global
batch assembly in ``shard_batch``, and rank-gated checkpoint/CSV writes —
the TPU-native analog of the reference's Lightning DDP fit
(``viscy-data/tests/test_combined_ddp.py`` + Lightning's process-group
init). Asserts:

1. the 2-process loss curve equals a single-process run on the same
   global batch (same script, ``num_procs=1``);
2. the two hosts read disjoint sample-index sets that tile the dataset;
3. exactly one checkpoint tree and one metrics row per step (rank 0 only).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from viscy_tpu.zarr_io.synthetic import DEFAULT_CHANNELS, build_hcs_plate

_WORKER = Path(__file__).parent / "_multihost_trainer_worker.py"
_GLOBAL_BATCH = 4


def _run(num_procs: int, port: str, plate: Path, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(_WORKER),
                str(i),
                str(num_procs),
                port,
                str(plate),
                str(out_dir),
                str(_GLOBAL_BATCH),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=str(_WORKER.parent.parent),
        )
        for i in range(num_procs)
    ]
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            assert p.returncode == 0, (
                f"worker failed:\n{out.decode(errors='replace')[-3000:]}"
            )
    finally:
        for p in procs:  # watchdog: never leave a hung rank behind
            if p.poll() is None:
                p.kill()


def _loss_curve(out_dir: Path) -> dict[str, list[tuple[int, float]]]:
    curves: dict[str, list[tuple[int, float]]] = {}
    for line in (out_dir / "metrics.csv").read_text().splitlines():
        row = json.loads(line)
        for key in ("loss/train", "loss/validate"):
            if key in row:
                curves.setdefault(key, []).append((row["step"], row[key]))
    return curves


def test_two_process_trainer_fit_matches_single_process(tmp_path):
    plate = build_hcs_plate(
        tmp_path / "plate.zarr",
        DEFAULT_CHANNELS,
        zyx_shape=(12, 64, 64),
        dtype=np.float32,
        max_value=1.0,
        multiscales=True,
        norm_meta=True,
    )
    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"
    _run(1, "49771", plate, single_dir)
    _run(2, "49772", plate, multi_dir)

    # 1. loss parity: same global batches (strided interleave vs contiguous
    # order — the mean reduces the same index set), same init/step RNG
    ref = _loss_curve(single_dir)
    got = _loss_curve(multi_dir)
    assert set(ref) == set(got) and ref["loss/train"], (ref, got)
    for key in ref:
        assert [s for s, _ in got[key]] == [s for s, _ in ref[key]], key
        np.testing.assert_allclose(
            [v for _, v in got[key]],
            [v for _, v in ref[key]],
            rtol=1e-4,
            err_msg=f"{key}: multi-host curve diverged from single-process",
        )

    # 2. disjoint per-host reads that interleave the index space
    reads0 = set(json.loads((multi_dir / "reads_rank0.json").read_text()))
    reads1 = set(json.loads((multi_dir / "reads_rank1.json").read_text()))
    assert reads0 and reads1
    assert not (reads0 & reads1), f"hosts read overlapping indices: {reads0 & reads1}"
    # shuffle=False sharding is the strided interleave: rank p gets p::2
    assert all(i % 2 == 0 for i in reads0), sorted(reads0)
    assert all(i % 2 == 1 for i in reads1), sorted(reads1)

    # 3. single checkpoint tree (rank 0 only) + one metrics row per step
    ckpts = sorted((multi_dir / "checkpoints").glob("epoch=*"))
    assert len(ckpts) == 1, ckpts
    assert (multi_dir / "checkpoints" / "last").exists()
    train_steps = [s for s, _ in got["loss/train"]]
    assert len(train_steps) == len(set(train_steps)), (
        f"duplicate metric rows — non-zero rank wrote to the CSV: {train_steps}"
    )

"""Multi-host (multi-process) runtime initialization.

TPU-native replacement for the reference's Lightning DDP process-group
bootstrap (reference attaches its ``ShardedDistributedSampler`` whenever
``torch.distributed.is_initialized()``, ``viscy_data/gpu_aug.py:44-46``;
Lightning itself initializes the NCCL group). Here the equivalents are:

- :func:`maybe_initialize` — call ``jax.distributed.initialize()`` when the
  environment says this is one process of a multi-process job (TPU pods
  auto-detect; CPU/GPU jobs pass explicit coordinator env vars). Invoked by
  the ``viscy`` CLI before any device use, so ``jax.process_count()`` is
  correct by the time datamodules build loaders and the trainer shards
  batches.
- :func:`is_rank_zero` — gate for checkpoint/log/metric writes (the
  reference's rank-0-only logging, ``cytoland/engine.py:558``).

Environment contract (checked in order):

1. ``VISCY_COORDINATOR`` + ``VISCY_NUM_PROCESSES`` + ``VISCY_PROCESS_ID``:
   explicit bootstrap, any platform (used by the 2-process tests).
2. ``JAX_COORDINATOR_ADDRESS`` / Cloud-TPU pod metadata: ``jax.distributed
   .initialize()`` with no args (JAX reads the cluster environment itself).
   Detected via ``JAX_COORDINATOR_ADDRESS`` or ``TPU_WORKER_HOSTNAMES``
   listing more than one worker.
3. Otherwise: single-process, do nothing.
"""

from __future__ import annotations

import logging
import os

import jax

_logger = logging.getLogger("viscy_tpu")

_INITIALIZED = False


def maybe_initialize(env: dict | None = None) -> bool:
    """Initialize ``jax.distributed`` if the environment calls for it.

    Idempotent; returns True when running (or already running) as part of
    a multi-process job.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    env = os.environ if env is None else env

    coordinator = env.get("VISCY_COORDINATOR")
    if coordinator:
        num = int(env["VISCY_NUM_PROCESSES"])
        pid = int(env["VISCY_PROCESS_ID"])
        jax.distributed.initialize(coordinator, num_processes=num, process_id=pid)
        _INITIALIZED = True
        _logger.info(
            "jax.distributed initialized: process %d/%d via %s",
            pid,
            num,
            coordinator,
        )
        return num > 1

    tpu_workers = env.get("TPU_WORKER_HOSTNAMES", "")
    if env.get("JAX_COORDINATOR_ADDRESS") or len(tpu_workers.split(",")) > 1:
        # pod slice / cluster env: JAX auto-detects coordinator + process id
        jax.distributed.initialize()
        _INITIALIZED = True
        _logger.info(
            "jax.distributed initialized (auto): process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return jax.process_count() > 1

    return False


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_rank_zero() -> bool:
    """True on the process that owns checkpoint/log/metric writes."""
    return jax.process_index() == 0

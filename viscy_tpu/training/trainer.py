"""Trainer: jit-compiled SPMD train/eval/predict loops.

TPU-native replacement for Lightning's ``Trainer`` + ``VisCyTrainer``
(reference ``viscy_utils/trainer.py:19``, call stack SURVEY.md §3.1):

- one jitted train step per (module, datamodule) pair: device-side
  augmentation (the datamodule's batched transform pipeline) fuses with
  the forward/backward into a single XLA program;
- data parallelism over a ``data`` mesh axis (``NamedSharding``): batches
  shard, state replicates, gradients reduce over ICI — no NCCL/DDP;
- host input pipeline overlaps zarr reads with device compute via a
  prefetching loader and async ``device_put``;
- Orbax checkpointing (top-k on monitored metric + last), CSV/TensorBoard
  logging, fast-dev-run.
"""

from __future__ import annotations

import json
import logging
import time
from functools import partial
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viscy_tpu.parallel.mesh import get_mesh, make_mesh, replicate, shard_batch
from viscy_tpu.training.callbacks.base import Callback
from viscy_tpu.training.module import TrainModule
from viscy_tpu.training.state import TrainState

_logger = logging.getLogger("viscy_tpu")

_STOP = object()  # prefetch-queue sentinel


class CSVLogger:
    """Minimal metrics logger: CSV + optional TensorBoard + extra sinks.

    ``extra`` sinks (e.g. the env-gated W&B logger,
    ``viscy_tpu.training.loggers.WandbLogger``) receive the same
    ``log_metrics``/``log_image``/``close`` calls; sink failures never
    interrupt training.
    """

    def __init__(
        self, log_dir: Path, use_tensorboard: bool = True, extra: Sequence | None = None
    ) -> None:
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._csv = open(self.log_dir / "metrics.csv", "a")
        self._tb = None
        self.extra = list(extra or [])
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None

    def log_metrics(self, metrics: dict[str, float], step: int) -> None:
        payload = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._csv.write(json.dumps(payload) + "\n")
        self._csv.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        for sink in self.extra:
            try:
                sink.log_metrics(metrics, step)
            except Exception:  # never let an observability sink kill training
                _logger.debug("extra logger %r failed", sink, exc_info=True)

    def log_image(self, tag: str, image: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, image, step, dataformats="HWC")
        for sink in self.extra:
            try:
                sink.log_image(tag, image, step)
            except Exception:
                _logger.debug("extra logger %r failed", sink, exc_info=True)

    def close(self) -> None:
        self._csv.close()
        if self._tb is not None:
            self._tb.close()
        for sink in self.extra:
            try:
                sink.close()
            except Exception:
                pass


class _NullLogger:
    """Metrics sink for non-zero ranks in a multi-host job: accepts the
    CSVLogger interface and writes nothing (the reference's rank-0-only
    logging, ``cytoland/engine.py:558``; ``sync_dist`` metric values are
    replicated across hosts so dropping them loses no information)."""

    log_dir = None
    extra: list = []

    def log_metrics(self, metrics: dict, step: int) -> None:
        pass

    def log_image(self, tag: str, image, step: int) -> None:
        pass

    def close(self) -> None:
        pass


class Trainer:
    """Compact trainer driving TrainModule engines over DataModules."""

    def __init__(
        self,
        max_epochs: int = 1,
        max_steps: int | None = None,
        callbacks: Sequence[Callback] | None = None,
        default_root_dir: str | Path = "lightning_logs",
        fast_dev_run: bool = False,
        limit_train_batches: int | None = None,
        limit_val_batches: int | None = None,
        log_every_n_steps: int = 10,
        checkpoint_every_n_epochs: int = 1,
        checkpoint_monitor: str = "loss/validate",
        checkpoint_top_k: int = 5,
        seed: int = 42,
        mesh=None,
        use_tensorboard: bool = True,
        precision: str | None = None,
        gradient_clip_val: float | None = None,
        gradient_clip_algorithm: str = "norm",
        accumulate_grad_batches: int = 1,
        check_val_every_n_epoch: int = 1,
        profile_dir: str | None = None,
        profile_steps: tuple[int, int] = (10, 15),
        loggers: Sequence | None = None,
    ) -> None:
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.callbacks = list(callbacks or [])
        self.default_root_dir = Path(default_root_dir)
        self.fast_dev_run = fast_dev_run
        self.limit_train_batches = 1 if fast_dev_run else limit_train_batches
        self.limit_val_batches = 1 if fast_dev_run else limit_val_batches
        self.log_every_n_steps = log_every_n_steps
        self.checkpoint_every_n_epochs = checkpoint_every_n_epochs
        self.checkpoint_monitor = checkpoint_monitor
        self.checkpoint_top_k = checkpoint_top_k
        self.seed = seed
        self.mesh = mesh or get_mesh()
        self.precision = precision
        if precision is not None:
            # Compute dtype on TPU is a model-config decision (param_dtype /
            # dtype on the flax modules), not a trainer flag; accepting the
            # Lightning value silently would imply it changes numerics here.
            _logger.warning(
                "Trainer(precision=%r) has no effect: compute/param dtype is "
                "set by the model config (e.g. model.init_args.dtype). The "
                "value is recorded but ignored.",
                precision,
            )
        self.gradient_clip_val = gradient_clip_val
        self.gradient_clip_algorithm = gradient_clip_algorithm
        self.accumulate_grad_batches = max(1, int(accumulate_grad_batches or 1))
        self.check_val_every_n_epoch = max(1, int(check_val_every_n_epoch or 1))
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        # Multi-host: only rank 0 owns the log/checkpoint tree. Metric
        # values are replicated by the sharded step, so non-zero ranks
        # write nothing (single checkpoint tree, no file races).
        self.is_rank_zero = jax.process_index() == 0
        if self.is_rank_zero:
            self.logger = CSVLogger(self.default_root_dir, use_tensorboard, extra=loggers)
        else:
            self.logger = _NullLogger()
        self.state: TrainState | None = None
        self.current_epoch = 0
        self.global_step = 0
        self._ckpt_scores: list[tuple[float, str]] = []
        self.logged_metrics: dict[str, float] = {}

    # -- helpers --------------------------------------------------------------
    def _init_state(self, module: TrainModule, datamodule, total_steps: int) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        batch = module.example_input()
        variables = module.init_variables(rng, batch)
        variables = module.load_pretrained(variables)
        tx, self._schedule = module.configure_optimizers(total_steps)
        if self.gradient_clip_val:
            import optax

            # Lightning's trainer-level gradient clipping, applied before the
            # module's optimizer chain.
            clip = (
                optax.clip(self.gradient_clip_val)
                if self.gradient_clip_algorithm == "value"
                else optax.clip_by_global_norm(self.gradient_clip_val)
            )
            tx = optax.chain(clip, tx)
        if self.accumulate_grad_batches > 1:
            import optax

            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate_grad_batches)
        state = TrainState.create(variables, tx)
        return replicate(state, self.mesh)

    def _device_transform(self, datamodule, stage: str):
        fn = getattr(datamodule, "device_transform", None)
        if fn is None:
            return None
        return partial(fn, stage=stage)

    def _build_train_step(self, module: TrainModule, aug):
        def train_step(state: TrainState, batch: dict, rng):
            if aug is not None:
                rng, aug_rng = jax.random.split(rng)
                batch = aug(batch, aug_rng)

            def loss_fn(params):
                variables = {"params": params, **state.extra_vars}
                loss, (metrics, updates) = module.training_loss(variables, batch, rng)
                return loss, (metrics, updates)

            (loss, (metrics, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            new_state = state.apply_gradients(grads, updates or state.extra_vars)
            metrics = dict(metrics)
            metrics["loss/train"] = loss
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_val_step(self, module: TrainModule, aug):
        def val_step(state: TrainState, batch: dict, rng):
            if aug is not None:
                rng, aug_rng = jax.random.split(rng)
                batch = aug(batch, aug_rng)
            loss, metrics = module.validation_loss(state.variables, batch, rng)
            metrics = dict(metrics)
            metrics["loss/validate"] = loss
            return metrics

        return jax.jit(val_step)

    @staticmethod
    def _device_view(batch: dict) -> dict:
        """Keep only numeric-array leaves (recursively) for the jitted step;
        host-only metadata like ``index`` paths stays out of the trace."""

        def keep(node):
            if isinstance(node, dict):
                out = {k: keep(v) for k, v in node.items()}
                return {k: v for k, v in out.items() if v is not None}
            if isinstance(node, (np.ndarray, jnp.ndarray)):
                dt = np.asarray(node).dtype
                if np.issubdtype(dt, np.number) or np.issubdtype(dt, np.bool_):
                    return node
            return None

        return keep(batch)

    def _iter_loader(
        self, loader, limit: int | None, sched: dict | None = None, prefetch: int = 2
    ):
        """Double-buffered device feed: a producer thread walks the host
        loader and issues async ``device_put`` (``shard_batch``) up to
        ``prefetch`` batches ahead, so H2D transfer overlaps the previous
        step's device compute instead of sitting on the critical path.
        """
        import queue
        import threading

        def make_view(i, batch):
            view = self._device_view(batch)
            if sched:
                # epoch-dependent scalars (temperatures, aux-head weights)
                # ride in as replicated array args: no retrace across epochs
                view["_schedule"] = {k: np.float32(v) for k, v in sched.items()}
            return i, shard_batch(view, self.mesh)

        q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        stop = threading.Event()

        def producer():
            try:
                for i, batch in enumerate(loader):
                    if stop.is_set() or (limit is not None and i >= limit):
                        break
                    item = make_view(i, batch)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surface loader errors in the main thread
                q.put(e)
            finally:
                q.put(_STOP)

        t = threading.Thread(target=producer, daemon=True, name="viscy-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is _STOP:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    # -- fit --------------------------------------------------------------------
    def fit(self, module: TrainModule, datamodule, ckpt_path: str | None = None) -> None:
        self._active_datamodule = datamodule
        datamodule.prepare_data()
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        try:
            steps_per_epoch = len(train_loader)
        except TypeError:
            steps_per_epoch = getattr(datamodule, "steps_per_epoch", None)
            if steps_per_epoch is None:
                steps_per_epoch = 100
                _logger.warning(
                    "train_dataloader has no len() and the datamodule defines no "
                    "steps_per_epoch: assuming %d steps/epoch for the LR schedule "
                    "(total_steps=%d). Set datamodule.steps_per_epoch or "
                    "Trainer(max_steps=...) to silence this.",
                    steps_per_epoch,
                    steps_per_epoch * self.max_epochs,
                )
        if self.limit_train_batches:
            steps_per_epoch = min(steps_per_epoch, self.limit_train_batches)
        total_steps = self.max_steps or steps_per_epoch * self.max_epochs

        if self.state is None:
            self.state = self._init_state(module, datamodule, total_steps)
        if ckpt_path is not None:
            self.load_checkpoint(ckpt_path, module)

        train_step = self._build_train_step(module, self._device_transform(datamodule, "train"))
        val_step = self._build_val_step(module, self._device_transform(datamodule, "val"))

        for cb in self.callbacks:
            cb.on_fit_start(self, module)

        rng = jax.random.PRNGKey(self.seed + 1)
        max_epochs = 1 if self.fast_dev_run else self.max_epochs
        for epoch in range(self.current_epoch, max_epochs):
            self.current_epoch = epoch
            module.on_epoch_start(epoch)
            sched = module.schedule_state(epoch) if hasattr(module, "schedule_state") else {}
            if hasattr(datamodule, "set_epoch"):
                datamodule.set_epoch(epoch)
            for cb in self.callbacks:
                cb.on_train_epoch_start(self, module, epoch)

            t0 = time.time()
            n_seen = 0
            step_t0 = time.time()
            for i, batch in self._iter_loader(
                datamodule.train_dataloader(), self.limit_train_batches, sched
            ):
                # first-class profiler hook (SURVEY §5): trace a step window
                if self.profile_dir and self.global_step == self.profile_steps[0]:
                    jax.profiler.start_trace(self.profile_dir)
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = train_step(self.state, batch, step_rng)
                if self.profile_dir and self.global_step == self.profile_steps[1]:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                self.global_step += 1
                n_seen += 1
                if self.global_step % self.log_every_n_steps == 0 or self.fast_dev_run:
                    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    host["lr"] = float(self._schedule(self.global_step))
                    now = time.time()
                    host["step_time_ms"] = (now - step_t0) / max(
                        self.log_every_n_steps, 1
                    ) * 1000
                    step_t0 = now
                    self.logged_metrics.update(host)
                    self.logger.log_metrics(host, self.global_step)
                for cb in self.callbacks:
                    cb.on_train_batch_end(self, module, metrics, batch, i)
                if self.max_steps and self.global_step >= self.max_steps:
                    break
            dt = time.time() - t0
            if n_seen:
                _logger.info(
                    f"epoch {epoch}: {n_seen} steps in {dt:.1f}s ({n_seen / dt:.2f} it/s)"
                )

            # validation (every check_val_every_n_epoch epochs, Lightning-style)
            val_metrics = {}
            if (epoch + 1) % self.check_val_every_n_epoch == 0 or self.fast_dev_run:
                val_metrics = self._run_validation(module, datamodule, val_step, rng, sched)
            for cb in self.callbacks:
                cb.on_train_epoch_end(self, module, epoch)

            if (epoch + 1) % self.checkpoint_every_n_epochs == 0 and not self.fast_dev_run:
                self._save_checkpoint(val_metrics)
            if self.max_steps and self.global_step >= self.max_steps:
                break

        for cb in self.callbacks:
            cb.on_fit_end(self, module)

    def _run_validation(self, module, datamodule, val_step, rng, sched: dict | None = None) -> dict:
        loader_fn = getattr(datamodule, "val_dataloader", None)
        if loader_fn is None:
            return {}
        loader = loader_fn()
        if loader is None:
            return {}
        for cb in self.callbacks:
            cb.on_validation_epoch_start(self, module)
        agg: dict[str, list[float]] = {}
        for i, batch in self._iter_loader(loader, self.limit_val_batches, sched):
            rng, step_rng = jax.random.split(rng)
            metrics = val_step(self.state, batch, step_rng)
            host = {k: float(v) for k, v in jax.device_get(metrics).items()}
            for k, v in host.items():
                agg.setdefault(k, []).append(v)
            for cb in self.callbacks:
                cb.on_validation_batch_end(self, module, host, batch, i)
        mean_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
        if mean_metrics:
            self.logged_metrics.update(mean_metrics)
            self.logger.log_metrics(mean_metrics, self.global_step)
        for cb in self.callbacks:
            cb.on_validation_epoch_end(self, module, mean_metrics)
        return mean_metrics

    # -- validate / test ---------------------------------------------------------
    def validate(self, module: TrainModule, datamodule, ckpt_path: str | None = None) -> dict:
        self._active_datamodule = datamodule
        datamodule.prepare_data()
        datamodule.setup("validate")
        if self.state is None:
            self.state = self._init_state(module, datamodule, 1)
        if ckpt_path:
            self.load_checkpoint(ckpt_path, module)
        val_step = self._build_val_step(module, self._device_transform(datamodule, "val"))
        return self._run_validation(module, datamodule, val_step, jax.random.PRNGKey(0))

    def test(self, module: TrainModule, datamodule, ckpt_path: str | None = None) -> dict:
        self._active_datamodule = datamodule
        datamodule.prepare_data()
        datamodule.setup("test")
        if self.state is None:
            self.state = self._init_state(module, datamodule, 1)
        if ckpt_path:
            self.load_checkpoint(ckpt_path, module)
        if getattr(module, "jit_test_step", True):
            test_step = jax.jit(
                lambda state, batch: module.test_step(state.variables, batch)
            )
        else:
            # host-side metric modules (e.g. SegmentationMetrics2D instance
            # matching) cannot trace under jit
            test_step = lambda state, batch: module.test_step(state.variables, batch)
        agg: dict[str, list[float]] = {}
        host_step = getattr(module, "test_step_host", None)
        for i, batch in self._iter_loader(datamodule.test_dataloader(), None):
            metrics = jax.device_get(test_step(self.state, batch))
            host = {k: float(np.mean(v)) for k, v in metrics.items()}
            if host_step is not None:
                # host-side metrics (e.g. instance-segmentation matching)
                # are not jittable; modules opt in via test_step_host
                host.update(
                    {
                        k: float(np.mean(v))
                        for k, v in host_step(self.state.variables, batch).items()
                    }
                )
            for k, v in host.items():
                agg.setdefault(k, []).append(v)
            for cb in self.callbacks:
                cb.on_test_batch_end(self, module, host, batch, i)
        mean_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
        self.logger.log_metrics({f"test/{k}": v for k, v in mean_metrics.items()}, self.global_step)
        # console summary like Lightning's end-of-test table
        if mean_metrics:
            width = max(len(k) for k in mean_metrics)
            lines = "\n".join(
                f"  test/{k:<{width}}  {v:.6f}" for k, v in sorted(mean_metrics.items())
            )
            _logger.info(f"Test metrics (mean over {len(next(iter(agg.values())))} batches):\n{lines}")
        else:
            _logger.warning("Test stage saw zero batches — nothing to report")
        for cb in self.callbacks:
            cb.on_test_end(self, module, mean_metrics)
        return mean_metrics

    # -- predict ------------------------------------------------------------------
    def predict(
        self, module: TrainModule, datamodule, ckpt_path: str | None = None, return_predictions: bool = False
    ):
        if jax.process_count() > 1:
            # The prediction/embedding writers are host-side zarr consumers
            # that expect the full output on one host; sharded-across-host
            # predictions are not addressable for device_get. Inference
            # parallelism is per-host (one process per output plate).
            raise NotImplementedError(
                "Trainer.predict is single-host: run one process per output "
                "store (shard work by FOV/plate across hosts) instead of a "
                f"{jax.process_count()}-process job."
            )
        self._active_datamodule = datamodule
        datamodule.prepare_data()
        datamodule.setup("predict")
        if self.state is None:
            self.state = self._init_state(module, datamodule, 1)
        if ckpt_path:
            self.load_checkpoint(ckpt_path, module)
        predict_step = jax.jit(lambda state, batch: module.predict_step(state.variables, batch))
        for cb in self.callbacks:
            cb.on_predict_start(self, module)
        # callbacks that blend/convert on device (e.g. HCSPredictionWriter's
        # DeviceFovAssembler) opt into receiving the raw jax.Array — no
        # device_get on the hot path, the callback fetches final slabs only
        keep_on_device = any(
            getattr(cb, "wants_device_predictions", False) for cb in self.callbacks
        ) and not return_predictions
        outputs = []
        for i, batch in enumerate(datamodule.predict_dataloader()):
            device_batch = shard_batch(self._device_view(batch), self.mesh)
            pred = predict_step(self.state, device_batch)
            if not keep_on_device:
                pred = jax.device_get(pred)
            for cb in self.callbacks:
                cb.write_on_batch_end(self, module, pred, batch, i)
            if return_predictions:
                outputs.append(pred)
        for cb in self.callbacks:
            cb.on_predict_end(self, module)
        return outputs if return_predictions else None

    # -- checkpointing ---------------------------------------------------------------
    def _ckpt_dir(self) -> Path:
        d = self.default_root_dir / "checkpoints"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _save_checkpoint(self, val_metrics: dict) -> None:
        import orbax.checkpoint as ocp

        score = val_metrics.get(self.checkpoint_monitor)
        name = f"epoch={self.current_epoch}-step={self.global_step}"
        if score is not None:
            # metric values are replicated across hosts, so every rank
            # formats the same name
            name += f"-loss={score:.3f}"
        path = self._ckpt_dir() / name
        payload = {
            "params": jax.device_get(self.state.params),
            "extra_vars": jax.device_get(self.state.extra_vars),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "epoch": self.current_epoch,
        }
        # Multi-host: orbax save is a COLLECTIVE — every process must call
        # it (internal finalize barriers deadlock otherwise); orbax writes
        # one tree with primary-host semantics. Host-side fs bookkeeping
        # (symlink, top-k pruning) stays rank-0-only below.
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), payload, force=True)
        ckptr.wait_until_finished()
        if not self.is_rank_zero:
            return
        # maintain top-k by monitored score (lower is better) + always keep last
        last = self._ckpt_dir() / "last"
        if last.is_symlink() or last.exists():
            try:
                last.unlink()
            except OSError:
                import shutil

                shutil.rmtree(last, ignore_errors=True)
        last.symlink_to(path.absolute())
        if score is not None:
            self._ckpt_scores.append((score, str(path)))
            self._ckpt_scores.sort(key=lambda t: t[0])
            # Top-k pruning must never delete the checkpoint that "last"
            # points at (the just-written one), or resume-from-last breaks.
            last_target = str(path.absolute())
            keep: list[tuple[float, str]] = []
            while len(self._ckpt_scores) - len(keep) > self.checkpoint_top_k:
                worst_score, worst = self._ckpt_scores.pop()
                if str(Path(worst).absolute()) == last_target:
                    keep.append((worst_score, worst))
                    continue
                import shutil

                shutil.rmtree(worst, ignore_errors=True)
            self._ckpt_scores.extend(keep)
            self._ckpt_scores.sort(key=lambda t: t[0])

    def load_checkpoint(self, path: str | Path, module: TrainModule) -> None:
        import orbax.checkpoint as ocp

        path = Path(path)
        if path.name == "last" and path.is_symlink():
            resolved = path.resolve()
            if not resolved.exists():
                raise FileNotFoundError(
                    f"'last' checkpoint symlink {path} points at {resolved}, "
                    "which no longer exists (it may have been pruned). Pass an "
                    "explicit epoch=*-step=* checkpoint directory instead."
                )
            path = resolved
        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": jax.device_get(self.state.params),
            "extra_vars": jax.device_get(self.state.extra_vars),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
            "epoch": 0,
        }
        try:
            restored = ckptr.restore(path.absolute(), target=template)
            opt_state = restored["opt_state"]
        except ValueError:
            # Optimizer structure changed between save and load (e.g. the
            # saving run used gradient_clip_val / accumulate_grad_batches and
            # this one doesn't, or vice versa). Weights are what matters for
            # predict/test/validate and for resuming with a new optimizer —
            # restore them and keep the fresh opt_state.
            _logger.warning(
                "checkpoint %s: optimizer state structure does not match the "
                "current trainer config; restoring weights only (fresh "
                "optimizer state).",
                path,
            )
            # params/extra_vars are plain nested dicts, so a target-free
            # restore reproduces them structurally.
            restored = ckptr.restore(path.absolute())
            opt_state = self.state.opt_state
        # weights-only payloads ({'params': ...} from converters/exports)
        # carry no extra_vars/step/epoch — fall back to the fresh state's
        self.state = self.state.replace(
            params=restored["params"],
            extra_vars=restored.get("extra_vars", self.state.extra_vars),
            opt_state=opt_state,
            step=jnp.asarray(restored.get("step", 0), jnp.int32),
        )
        self.state = replicate(self.state, self.mesh)
        # The payload records the just-completed epoch; resume at the next one
        # (Lightning semantics — re-running the saved epoch double-trains it).
        self.current_epoch = int(restored.get("epoch", -1)) + 1
        self.global_step = int(restored.get("step", 0))

"""DynaCLR contrastive engine
(reference ``applications/dynaclr/src/dynaclr/engine.py:33``).

Triplet-margin or NT-Xent paths over anchor/positive(/negative)
projections from a :class:`ContrastiveEncoder`; predict returns
``{features, projections, index}`` for the EmbeddingWriter.
"""

from __future__ import annotations

import logging
from typing import Literal, Sequence, TypedDict

import jax
import jax.numpy as jnp

from viscy_tpu.models.components.heads import BaseHead
from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder
from viscy_tpu.models.contrastive.loss import (
    NTXentLoss,
    ntxent_loss,
    triplet_margin_loss,
)
from viscy_tpu.training.module import TrainModule

Array = jax.Array
_logger = logging.getLogger("viscy_tpu")


class TripletMarginLoss:
    """Euclidean triplet margin loss (torch ``nn.TripletMarginLoss`` analog)."""

    def __init__(self, margin: float = 0.5) -> None:
        self.margin = margin

    def __call__(self, anchor: Array, positive: Array, negative: Array) -> Array:
        return triplet_margin_loss(anchor, positive, negative, self.margin)


class ContrastiveModule(TrainModule):
    """Contrastive learning engine over triplet batches."""

    rng_keys = ("dropout",)

    def __init__(
        self,
        encoder: ContrastiveEncoder | dict | None = None,
        loss_function=None,
        lr: float = 1e-3,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        log_batches_per_epoch: int = 8,
        log_samples_per_batch: int = 1,
        log_embeddings_every_n_epochs: int | None = 10,
        pca_color_keys=None,
        log_negative_metrics_every_n_epochs: int = 2,
        example_input_array_shape: Sequence[int] | None = None,
        ckpt_path: str | None = None,
        freeze_backbone: bool = False,
        auxiliary_heads: dict | None = None,
    ) -> None:
        if encoder is None:
            encoder = ContrastiveEncoder()
        elif isinstance(encoder, dict):
            encoder = ContrastiveEncoder(**encoder)
        self.model = encoder
        self.loss_function = loss_function if loss_function is not None else TripletMarginLoss(0.5)
        self.lr = lr
        self.schedule = schedule
        if example_input_array_shape is None:
            # the reference defaults to (1, 2, 15, 256, 256) (engine.py:49)
            # where the example only feeds model summaries; here it
            # initializes parameters, so a channel/depth mismatch with the
            # configured encoder would crash in the stem fold — derive the
            # default from the encoder instead (explicit values still win,
            # matching reference configs that set it)
            example_input_array_shape = (
                1,
                getattr(encoder, "in_channels", 2),
                getattr(encoder, "in_stack_depth", 15),
                256,
                256,
            )
        self.example_input_array_shape = tuple(example_input_array_shape)
        self.ckpt_path = ckpt_path
        self.freeze_backbone = freeze_backbone
        self.auxiliary_heads = _build_heads(auxiliary_heads)

    @property
    def _is_ntxent(self) -> bool:
        return isinstance(self.loss_function, NTXentLoss)

    def on_epoch_start(self, epoch: int) -> None:
        if hasattr(self.loss_function, "step"):
            self.loss_function.step(epoch)

    def schedule_state(self, epoch: int) -> dict[str, float]:
        """Per-epoch scalars for the traced step: NT-Xent temperature and
        auxiliary-head loss weights (reference ``engine.py:93-95`` steps
        these schedules in ``on_train_epoch_start``)."""
        sched: dict[str, float] = {}
        if self._is_ntxent:
            lf = self.loss_function
            if getattr(lf, "temperature_schedule", "constant") == "cosine":
                from viscy_tpu.models.schedule import cosine_anneal

                sched["ntxent_temperature"] = cosine_anneal(
                    lf.temperature_start,
                    lf.temperature_end,
                    epoch,
                    lf.temperature_warmup_epochs,
                )
        for name, head in self.auxiliary_heads.items():
            sched[f"aux_weight/{name}"] = head.weight_at(epoch)
        return sched

    # -- init -------------------------------------------------------------------
    def example_input(self) -> dict:
        import numpy as np

        x = np.zeros(self.example_input_array_shape, np.float32)
        return {"anchor": x, "positive": x.copy(), "negative": x.copy()}

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            rngs, jnp.asarray(batch["anchor"]), train=False
        )
        if self.auxiliary_heads:
            variables = dict(variables)
            params = dict(variables["params"])
            head_params = {}
            for name, head in self.auxiliary_heads.items():
                feats = jnp.zeros((2, head.in_dims), jnp.float32)
                if hasattr(head, "target_dims"):
                    y = jnp.zeros((2, head.target_dims), jnp.float32)
                else:
                    y = jnp.zeros((2,), jnp.int32)
                head_params[name] = head.init(rngs["params"], feats, y)["params"]
            params["aux_heads"] = head_params
            variables["params"] = params
        return variables

    # -- forward ------------------------------------------------------------------
    def forward(self, variables: dict, x: Array, train: bool = False, rngs=None):
        if train:
            (emb, proj), updates = self.model.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return emb, proj, updates
        emb, proj = self.model.apply(variables, x, train=False)
        return emb, proj, {}

    # -- steps ------------------------------------------------------------------------
    def _contrastive_loss(
        self, a_proj: Array, p_proj: Array, n_proj: Array | None, sched: dict
    ) -> Array:
        if self._is_ntxent:
            temperature = sched.get("ntxent_temperature", self.loss_function.temperature)
            return ntxent_loss(
                a_proj,
                p_proj,
                temperature=temperature,
                beta=getattr(self.loss_function, "beta", 0.0),
            )
        assert n_proj is not None, "triplet loss requires negatives"
        return self.loss_function(a_proj, p_proj, n_proj)

    def _run_aux_heads(
        self, variables: dict, a_emb: Array, batch: dict, sched: dict, train: bool
    ):
        """Weighted sum of auxiliary head losses on the anchor embedding
        (reference ``engine.py:250``, ``_run_auxiliary_heads``). Heads whose
        batch key is absent are skipped at trace time (batch structure is
        static per run)."""
        aux_loss = 0.0
        metrics: dict = {}
        head_params = variables["params"].get("aux_heads", {})
        for name, head in self.auxiliary_heads.items():
            y = batch.get(head.batch_key)
            if y is None or name not in head_params:
                continue
            loss, head_metrics = head.apply(
                {"params": head_params[name]}, a_emb, y, train=train
            )
            weight = sched.get(f"aux_weight/{name}", head.weight_at(0))
            aux_loss = aux_loss + weight * loss
            metrics[f"loss/aux/{name}"] = loss
            metrics.update(head_metrics)
        return aux_loss, metrics

    def training_loss(self, variables, batch, rng):
        sched = batch.get("_schedule") or {}
        rngs = {"dropout": rng}
        a_emb, a_proj, updates = self.forward(variables, batch["anchor"], train=True, rngs=rngs)
        merged = {**variables, **updates}
        _, p_proj, updates = self.forward(merged, batch["positive"], train=True, rngs=rngs)
        merged = {**merged, **updates}
        n_proj = None
        if not self._is_ntxent:
            _, n_proj, updates = self.forward(merged, batch["negative"], train=True, rngs=rngs)
            merged = {**merged, **updates}
        loss = self._contrastive_loss(a_proj, p_proj, n_proj, sched)
        new_extra = {k: v for k, v in merged.items() if k != "params"}
        metrics = {
            "metrics/positive_cosine": _mean_cosine(a_proj, p_proj),
        }
        if n_proj is not None:
            metrics["metrics/negative_cosine"] = _mean_cosine(a_proj, n_proj)
        if self.auxiliary_heads:
            aux_loss, aux_metrics = self._run_aux_heads(
                variables, a_emb, batch, sched, train=True
            )
            loss = loss + aux_loss
            metrics.update(aux_metrics)
        return loss, (metrics, new_extra)

    def validation_loss(self, variables, batch, rng):
        sched = batch.get("_schedule") or {}
        a_emb, a_proj, _ = self.forward(variables, batch["anchor"])
        _, p_proj, _ = self.forward(variables, batch["positive"])
        n_proj = None
        if not self._is_ntxent:
            _, n_proj, _ = self.forward(variables, batch["negative"])
        loss = self._contrastive_loss(a_proj, p_proj, n_proj, sched)
        metrics = {"metrics/positive_cosine": _mean_cosine(a_proj, p_proj)}
        if self.auxiliary_heads:
            aux_loss, aux_metrics = self._run_aux_heads(
                variables, a_emb, batch, sched, train=False
            )
            loss = loss + aux_loss
            metrics.update(aux_metrics)
        return loss, metrics

    def predict_step(self, variables, batch):
        features, projections, _ = self.forward(variables, batch["anchor"])
        return {"features": features, "projections": projections}

    def configure_optimizers(self, total_steps: int):
        import optax

        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        tx, sched = configure_adamw_scheduler(
            lr=self.lr, schedule=self.schedule, total_steps=total_steps
        )
        if self.freeze_backbone:
            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen"
                    if any(getattr(p, "key", "") in ("stem", "encoder") for p in path)
                    else "trainable",
                    params,
                )

            tx = optax.multi_transform(
                {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
            )
        return tx, sched


def _build_heads(spec: dict | None) -> dict[str, BaseHead]:
    """Normalize ``auxiliary_heads`` config: values may be constructed
    :class:`BaseHead` modules or jsonargparse-style dicts
    ``{"class_path": ..., "init_args": {...}}``."""
    if not spec:
        return {}
    heads: dict[str, BaseHead] = {}
    for name, head in spec.items():
        if isinstance(head, dict):
            from viscy_tpu.training.instantiate import resolve_class

            cls = resolve_class(head["class_path"])
            head = cls(**head.get("init_args", {}))
        heads[name] = head
    return heads


def _mean_cosine(a: Array, b: Array) -> Array:
    an = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-8)
    bn = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-8)
    return (an * bn).sum(axis=1).mean()


class ContrastivePrediction(TypedDict):
    """Output type of the contrastive prediction step (reference
    ``dynaclr/engine.py:25``)."""

    features: Array
    projections: Array
    index: list

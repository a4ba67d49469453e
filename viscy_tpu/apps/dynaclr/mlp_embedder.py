"""Supervised MLP embedder over cell embeddings
(reference ``dynaclr/evaluation/mlp_embedder/{train,apply}_mlp_embedder.py``):
train an MLP classifier on a label column, then use its L2-normalized
penultimate representations as a task-adapted embedding.

JAX/optax training loop (the reference uses torch + wandb); the model is
:class:`viscy_tpu.models.components.heads.MLP` with ``encode=True`` for
the penultimate output. Checkpoints are flax msgpack + a JSON sidecar.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from viscy_tpu.models.components.heads import MLP

__all__ = ["train_mlp_embedder", "apply_mlp_embedder", "load_mlp_embedder"]


def _build(in_dims: int, hidden_dims, num_classes: int) -> MLP:
    return MLP(
        in_dims=in_dims,
        hidden_dims=list(hidden_dims),
        num_classes=num_classes,
        cosine_classifier=False,
        norm="ln",
    )


def train_mlp_embedder(
    features: np.ndarray,
    labels: np.ndarray,
    hidden_dims=(256, 128),
    epochs: int = 30,
    batch_size: int = 256,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    val_fraction: float = 0.2,
    seed: int = 42,
    output_path: str | Path | None = None,
) -> tuple[dict, dict]:
    """Train the classifier; returns (checkpoint dict, metrics)."""
    from sklearn.preprocessing import LabelEncoder

    rng = np.random.default_rng(seed)
    features = np.asarray(features, np.float32)
    encoder = LabelEncoder()
    y = encoder.fit_transform(np.asarray(labels))
    num_classes = len(encoder.classes_)

    perm = rng.permutation(len(features))
    n_val = max(1, int(len(features) * val_fraction))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    model = _build(features.shape[1], hidden_dims, num_classes)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, features.shape[1])))[
        "params"
    ]
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply({"params": p}, xb)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, yb[:, None], axis=-1).mean(), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, -1) == yb).mean()
        return params, opt_state, loss, acc

    @jax.jit
    def evaluate(params, xb, yb):
        logits = model.apply({"params": params}, xb)
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.take_along_axis(logp, yb[:, None], axis=-1).mean()
        return loss, (jnp.argmax(logits, -1) == yb).mean()

    history = []
    for epoch in range(epochs):
        order = rng.permutation(train_idx)
        for i in range(0, len(order), batch_size):
            sel = order[i : i + batch_size]
            if len(sel) < 2:
                continue
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(features[sel]), jnp.asarray(y[sel])
            )
        vloss, vacc = evaluate(
            params, jnp.asarray(features[val_idx]), jnp.asarray(y[val_idx])
        )
        history.append(
            {"epoch": epoch, "val_loss": float(vloss), "val_acc": float(vacc)}
        )

    ckpt = {
        "params_bytes": serialization.to_bytes(params),
        "in_dims": int(features.shape[1]),
        "hidden_dims": list(hidden_dims),
        "classes": [str(c) for c in encoder.classes_],
    }
    metrics = {"val_acc": history[-1]["val_acc"], "history": history}
    if output_path is not None:
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        output_path.with_suffix(".msgpack").write_bytes(ckpt["params_bytes"])
        meta = {k: v for k, v in ckpt.items() if k != "params_bytes"}
        output_path.with_suffix(".json").write_text(json.dumps(meta))
    return ckpt, metrics


def load_mlp_embedder(path: str | Path) -> tuple[MLP, dict]:
    path = Path(path)
    meta = json.loads(path.with_suffix(".json").read_text())
    model = _build(meta["in_dims"], meta["hidden_dims"], len(meta["classes"]))
    empty = model.init(jax.random.PRNGKey(0), jnp.zeros((1, meta["in_dims"])))["params"]
    params = serialization.from_bytes(empty, path.with_suffix(".msgpack").read_bytes())
    return model, {"params": params, **meta}


def apply_mlp_embedder(features: np.ndarray, model_path: str | Path) -> np.ndarray:
    """L2-normalized penultimate representations for all features."""
    model, state = load_mlp_embedder(model_path)
    out = jax.jit(lambda x: model.apply({"params": state["params"]}, x, encode=True))(
        jnp.asarray(np.asarray(features, np.float32))
    )
    return np.asarray(out)

"""``dynaclr`` CLI (reference ``applications/dynaclr/src/dynaclr/cli.py``).

Training subcommands route to the shared ``viscy`` CLI; evaluation
subcommands operate on embedding datasets written by
:class:`~viscy_tpu.training.callbacks.embedding_writer.EmbeddingWriter`:
linear classifiers (train / apply / cross-validate), dimensionality
reduction, temporal smoothness, and MMD.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import click
import numpy as np

_logger = logging.getLogger("viscy_tpu")


@click.group()
def main() -> None:
    """DynaCLR: contrastive representation learning of cell dynamics."""
    logging.basicConfig(level=logging.INFO)


@main.command()
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
@click.option("--ckpt_path", default=None)
def fit(config: str, ckpt_path: str | None) -> None:
    """Train a DynaCLR model (routes to the shared viscy CLI)."""
    from viscy_tpu.training.cli import run_subcommand

    run_subcommand("fit", config, ckpt_path)


@main.command()
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
@click.option("--ckpt_path", default=None)
def predict(config: str, ckpt_path: str | None) -> None:
    """Extract embeddings (routes to the shared viscy CLI)."""
    from viscy_tpu.training.cli import run_subcommand

    run_subcommand("predict", config, ckpt_path)


def _load_embeddings(path: str):
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    return read_embedding_dataset(Path(path))


@main.command("train-classifier")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--label-column", required=True)
@click.option("--output", required=True, type=click.Path())
@click.option("--features-key", default="features")
def train_classifier(embeddings: str, label_column: str, output: str, features_key: str) -> None:
    """Train a linear probe on an embedding dataset."""
    from viscy_tpu.evaluation.linear_classifier import train_linear_classifier

    ds = _load_embeddings(embeddings)
    labels = ds["index"][label_column].to_numpy()
    pipeline, metrics = train_linear_classifier(ds[features_key], labels)
    pipeline.save(output)
    click.echo(json.dumps(metrics, indent=2))


@main.command("apply-classifier")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--classifier", required=True, type=click.Path(exists=True))
@click.option("--output", required=True, type=click.Path())
@click.option("--features-key", default="features")
def apply_classifier(embeddings: str, classifier: str, output: str, features_key: str) -> None:
    """Apply a trained linear probe; writes predictions parquet."""
    from viscy_tpu.evaluation.linear_classifier import LinearClassifierPipeline

    ds = _load_embeddings(embeddings)
    pipeline = LinearClassifierPipeline.load(classifier)
    preds = pipeline.predict(ds[features_key])
    out = ds["index"].copy()
    out["prediction"] = preds
    out.to_parquet(output)
    click.echo(f"Wrote {len(out)} predictions to {output}")


@main.command("cross-validate")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--label-column", required=True)
@click.option("--splits", default=5)
def cross_validate(embeddings: str, label_column: str, splits: int) -> None:
    """Stratified k-fold cross-validated probe accuracy."""
    from viscy_tpu.evaluation.linear_classifier import cross_validate_classifier

    ds = _load_embeddings(embeddings)
    labels = ds["index"][label_column].to_numpy()
    metrics = cross_validate_classifier(ds["features"], labels, n_splits=splits)
    click.echo(json.dumps(metrics, indent=2))


@main.command()
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--method", default="pca", type=click.Choice(["pca"]))
@click.option("--components", default=8)
@click.option("--output", required=True, type=click.Path())
def dimred(embeddings: str, method: str, components: int, output: str) -> None:
    """Dimensionality reduction of embeddings (PCA; UMAP/PHATE where installed)."""
    from sklearn.decomposition import PCA

    ds = _load_embeddings(embeddings)
    feats = ds["features"]
    reduced = PCA(n_components=min(components, min(feats.shape) - 1)).fit_transform(feats)
    np.save(output, reduced)
    click.echo(f"Wrote {reduced.shape} to {output}")


@main.command()
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--distance-metric", default="cosine")
def smoothness(embeddings: str, distance_metric: str) -> None:
    """Temporal smoothness of embedding tracks."""
    from viscy_tpu.evaluation.smoothness import compute_embeddings_smoothness

    ds = _load_embeddings(embeddings)
    index = ds["index"]
    if "fov_name" not in index.columns and "fov" in index.columns:
        index = index.rename(columns={"fov": "fov_name"})
    res = compute_embeddings_smoothness(ds["features"], index, distance_metric)
    click.echo(json.dumps(res, indent=2))


@main.command()
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--group-column", required=True)
@click.option("--group-a", required=True)
@click.option("--group-b", required=True)
@click.option("--permutations", default=500)
def mmd(embeddings: str, group_column: str, group_a: str, group_b: str, permutations: int) -> None:
    """MMD permutation test between two groups of embeddings."""
    from viscy_tpu.evaluation.mmd import mmd_permutation_test

    ds = _load_embeddings(embeddings)
    idx = ds["index"]
    a = ds["features"][(idx[group_column] == group_a).to_numpy()]
    b = ds["features"][(idx[group_column] == group_b).to_numpy()]
    res = mmd_permutation_test(a, b, n_permutations=permutations)
    click.echo(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()

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


@main.command("evaluate-tracking-accuracy")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--spatial-gate", default=50.0, type=float)
def evaluate_tracking_accuracy(embeddings: str, spatial_gate: float) -> None:
    """Embedding-based track linking accuracy vs ground-truth track ids
    (reference ``evaluate-tracking-accuracy``)."""
    from viscy_tpu.apps.dynaclr.tracking import link_by_embedding, tracking_accuracy

    ds = _load_embeddings(embeddings)
    linked = link_by_embedding(ds["features"], ds["index"], spatial_gate=spatial_gate)
    res = tracking_accuracy(linked)
    click.echo(json.dumps(res, indent=2))


@main.command("append-obs")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--csv", "csv_path", required=True, type=click.Path(exists=True))
@click.option("--merge-key", default="id")
@click.option("--columns", default=None, help="comma-separated column subset")
@click.option("--prefix", default="")
def append_obs(embeddings: str, csv_path: str, merge_key: str, columns: str | None, prefix: str) -> None:
    """Merge CSV columns into the embedding index (reference ``append-obs``)."""
    from viscy_tpu.evaluation.zarr_utils import append_to_embedding_dataset, merge_csv_into_obs

    ds = _load_embeddings(embeddings)
    cols = columns.split(",") if columns else None
    ds, stats = merge_csv_into_obs(ds, csv_path, merge_key=merge_key, columns=cols, prefix=prefix)
    append_to_embedding_dataset(embeddings, obs=ds["index"])
    click.echo(json.dumps(stats, indent=2))


@main.command("reduce-dimensionality")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--method", default="pca", type=click.Choice(["pca", "umap", "phate"]))
@click.option("--components", default=8)
def reduce_dimensionality(embeddings: str, method: str, components: int) -> None:
    """Write a reduced embedding array back into the dataset
    (reference ``reduce-dimensionality``)."""
    from viscy_tpu.evaluation.dimensionality_reduction import reduce_features
    from viscy_tpu.evaluation.zarr_utils import append_to_embedding_dataset

    ds = _load_embeddings(embeddings)
    reduced = reduce_features(ds["features"], method=method, n_components=components)
    append_to_embedding_dataset(embeddings, obsm={method.upper(): reduced})
    click.echo(f"Wrote {method.upper()} {reduced.shape} into {embeddings}")


@main.command("split-embeddings")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--column", required=True)
@click.option("--output-dir", required=True, type=click.Path())
def split_embeddings(embeddings: str, column: str, output_dir: str) -> None:
    """Split one embedding dataset into per-group datasets
    (reference ``split-embeddings``)."""
    from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset

    ds = _load_embeddings(embeddings)
    out_dir = Path(output_dir)
    for value, rows in ds["index"].groupby(column).groups.items():
        rows = np.asarray(rows)
        sub_index = ds["index"].loc[rows].reset_index(drop=True)
        write_embedding_dataset(
            out_dir / str(value),
            ds["features"][rows],
            sub_index,
            projections=ds.get("projections")[rows] if "projections" in ds else None,
        )
        click.echo(f"{value}: {len(rows)} rows -> {out_dir / str(value)}")


@main.command("info")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
def info(embeddings: str) -> None:
    """Summarize an embedding dataset (reference ``info``)."""
    ds = _load_embeddings(embeddings)
    idx = ds["index"]
    summary = {
        "n_samples": int(ds["features"].shape[0]),
        "feature_dim": int(ds["features"].shape[1]),
        "arrays": [k for k in ds if k != "index"],
        "index_columns": list(idx.columns),
    }
    for col in ("experiment", "fov_name", "track_id"):
        if col in idx.columns:
            summary[f"n_{col}"] = int(idx[col].nunique())
    click.echo(json.dumps(summary, indent=2))


@main.command("build-cell-index")
@click.option("--collection", "collection_path", required=True, type=click.Path(exists=True))
@click.option("--output", required=True, type=click.Path())
def build_cell_index_cmd(collection_path: str, output: str) -> None:
    """Build a cell-index parquet from a collection YAML
    (reference ``build-cell-index``)."""
    from viscy_tpu.data.collection import Collection

    df = Collection.from_yaml(collection_path).build_cell_index(output)
    click.echo(f"Wrote {len(df)} rows to {output}")


@main.command("preprocess-cell-index")
@click.option("--cell-index", "cell_index_path", required=True, type=click.Path(exists=True))
@click.option("--output", required=True, type=click.Path())
@click.option("--level", default="fov_statistics")
def preprocess_cell_index_cmd(cell_index_path: str, output: str, level: str) -> None:
    """Join normalization stats + focus slices onto a cell index
    (reference ``preprocess-cell-index``)."""
    import pandas as pd

    from viscy_tpu.data.cell_index import preprocess_cell_index, write_cell_index

    df = preprocess_cell_index(pd.read_parquet(cell_index_path), level=level)
    write_cell_index(df, output)
    click.echo(f"Wrote {len(df)} rows to {output}")


@main.command("convert-ops-parquet")
@click.option("--input", "input_path", required=True, type=click.Path(exists=True))
@click.option("--output", required=True, type=click.Path())
@click.option("--store-root", default="")
@click.option("--store-suffix", default="phenotyping.zarr")
def convert_ops_parquet_cmd(input_path: str, output: str, store_root: str, store_suffix: str) -> None:
    """Convert an OPS merged parquet to the flat cell-index schema
    (reference ``convert-ops-parquet``)."""
    from viscy_tpu.data.cell_index import convert_ops_parquet

    df = convert_ops_parquet(input_path, output, store_root=store_root, store_suffix=store_suffix)
    click.echo(f"Wrote {len(df)} rows to {output}")


@main.command("compute-mmd")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--group-column", required=True)
@click.option("--permutations", default=500)
@click.option("--output", default=None, type=click.Path())
def compute_mmd(embeddings: str, group_column: str, permutations: int, output: str | None) -> None:
    """Pairwise MMD matrix across all groups (reference ``compute-mmd``)."""
    from viscy_tpu.evaluation.mmd import mmd_permutation_test

    ds = _load_embeddings(embeddings)
    idx = ds["index"]
    groups = sorted(idx[group_column].astype(str).unique())
    rows = []
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            fa = ds["features"][(idx[group_column].astype(str) == a).to_numpy()]
            fb = ds["features"][(idx[group_column].astype(str) == b).to_numpy()]
            res = mmd_permutation_test(fa, fb, n_permutations=permutations)
            rows.append({"group_a": a, "group_b": b, **res})
    if output:
        import pandas as pd

        pd.DataFrame(rows).to_csv(output, index=False)
    click.echo(json.dumps(rows, indent=2, default=float))


if __name__ == "__main__":
    main()


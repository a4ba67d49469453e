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
import pandas as pd

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
@click.option(
    "--config",
    "-c",
    "config_path",
    default=None,
    type=click.Path(exists=True),
    help="CTC benchmark config YAML (full ILP tracking + CTC metrics)",
)
@click.option(
    "--embeddings",
    default=None,
    type=click.Path(exists=True),
    help="embedding store for the quick greedy-linking accuracy check",
)
@click.option("--spatial-gate", default=50.0, type=float)
def evaluate_tracking_accuracy(
    config_path: str | None, embeddings: str | None, spatial_gate: float
) -> None:
    """CTC tracking-accuracy benchmark (reference ``evaluate-tracking-accuracy``).

    With ``-c``: full candidate-graph + ILP tracking on CTC datasets scored
    by DET/TRA/LNK/BIO/CHOTA. With ``--embeddings``: the quick greedy
    embedding-linking accuracy against ground-truth track ids.
    """
    if (config_path is None) == (embeddings is None):
        raise click.UsageError("pass exactly one of --config or --embeddings")
    if config_path is not None:
        from viscy_tpu.apps.dynaclr.tracking_benchmark import (
            TrackingAccuracyConfig,
            run_tracking_accuracy,
        )
        from viscy_tpu.training.cli_utils import load_config

        cfg = TrackingAccuracyConfig(**load_config(config_path))
        df = run_tracking_accuracy(cfg)
        if df.empty:
            click.echo("No results produced.", err=True)
        else:
            click.echo(df.to_string(index=False))
            click.echo(f"\nResults written to {Path(cfg.output_dir) / 'results.csv'}")
        return

    from viscy_tpu.apps.dynaclr.tracking import link_by_embedding, tracking_accuracy

    ds = _load_embeddings(embeddings)
    linked = link_by_embedding(ds["features"], ds["index"], spatial_gate=spatial_gate)
    res = tracking_accuracy(linked)
    click.echo(json.dumps(res, indent=2))


@main.command("plot-embeddings")
@click.option("--config", "-c", "config_path", required=True, type=click.Path(exists=True))
def plot_embeddings_cmd(config_path: str) -> None:
    """Pairplots (PCA) and scatter plots (PHATE/UMAP) from an AnnData
    store (reference ``plot-embeddings``)."""
    from viscy_tpu.apps.dynaclr.plot_embeddings import (
        PlotEmbeddingsConfig,
        plot_embeddings,
    )
    from viscy_tpu.training.cli_utils import load_config

    cfg = PlotEmbeddingsConfig(**load_config(config_path))
    written = plot_embeddings(cfg)
    for p in written:
        click.echo(f"  Saved {p.name}")
    click.echo(f"Wrote {len(written)} figures to {cfg.output_dir}")


@main.command("visualize-embeddings")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--data-path", default=None, type=click.Path(exists=True))
@click.option("--tracks-path", default=None, type=click.Path(exists=True))
@click.option("--channels", default=None, help="comma-separated channels to display")
@click.option("--fov", "fovs", multiple=True, help="FOV name(s) to include (default: all)")
@click.option("--output-dir", required=True, type=click.Path())
@click.option("--z-range", default="0,1")
@click.option("--patch-size", default=128, type=int)
@click.option("--arrows/--no-arrows", default=True)
def visualize_embeddings(
    embeddings: str,
    data_path: str | None,
    tracks_path: str | None,
    channels: str | None,
    fovs: tuple[str, ...],
    output_dir: str,
    z_range: str,
    patch_size: int,
    arrows: bool,
) -> None:
    """Render embedding-space figures (track-/time-colored scatter, image
    strips when a plate is given) — the headless counterpart of the
    reference's interactive ``EmbeddingVisualizationApp``."""
    from viscy_tpu.evaluation.visualization import EmbeddingVisualizationApp

    ds = _load_embeddings(embeddings)
    index = ds["index"]
    fov_col = "fov_name" if "fov_name" in index.columns else "fov"
    fov_tracks = {f: "all" for f in (fovs or index[fov_col].unique().tolist())}
    zr = tuple(int(v) for v in z_range.split(","))
    app = EmbeddingVisualizationApp(
        features_path=embeddings,
        data_path=data_path,
        tracks_path=tracks_path,
        channels_to_display=channels.split(",") if channels else None,
        fov_tracks=fov_tracks,
        z_range=zr,
        yx_patch_size=(patch_size, patch_size),
        output_dir=output_dir,
    )
    out = app.get_output_dir()
    app.create_track_colored_figure(show_arrows=arrows).savefig(
        out / "embedding_tracks.png", dpi=150
    )
    app.create_time_colored_figure(show_arrows=arrows).savefig(
        out / "embedding_time.png", dpi=150
    )
    if data_path and tracks_path and channels:
        app.preload_images()
        app.trajectory_image_strip(app.filtered_features_df).savefig(
            out / "trajectory_strips.png", dpi=150
        )
    (out / "summary.txt").write_text(app.output_info_summary())
    click.echo(app.output_info_summary())
    click.echo(f"Figures written to {out}")


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
    index = ds["index"]
    values = index[column].to_numpy()
    for value in pd.unique(values):
        rows = np.flatnonzero(values == value)  # positional, index-label agnostic
        sub_index = index.iloc[rows].reset_index(drop=True)
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


@main.command("train-mlp-embedder")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--label-column", required=True)
@click.option("--output", required=True, type=click.Path())
@click.option("--hidden-dims", default="256,128")
@click.option("--epochs", default=30)
@click.option("--lr", default=1e-3)
def train_mlp_embedder_cmd(embeddings, label_column, output, hidden_dims, epochs, lr):
    """Train a supervised MLP embedder on a label column
    (reference ``train-mlp-embedder``)."""
    from viscy_tpu.apps.dynaclr.mlp_embedder import train_mlp_embedder

    ds = _load_embeddings(embeddings)
    labeled = ds["index"][label_column].notna().to_numpy()
    dims = tuple(int(d) for d in hidden_dims.split(","))
    _, metrics = train_mlp_embedder(
        ds["features"][labeled],
        ds["index"].loc[labeled, label_column].to_numpy(),
        hidden_dims=dims,
        epochs=epochs,
        lr=lr,
        output_path=output,
    )
    click.echo(json.dumps({"val_acc": metrics["val_acc"]}, indent=2))


@main.command("apply-mlp-embedder")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--model", "model_path", required=True, type=click.Path())
@click.option("--key", default="MLP")
def apply_mlp_embedder_cmd(embeddings, model_path, key):
    """Write MLP-embedder representations back into the dataset
    (reference ``apply-mlp-embedder``)."""
    from viscy_tpu.apps.dynaclr.mlp_embedder import apply_mlp_embedder
    from viscy_tpu.evaluation.zarr_utils import append_to_embedding_dataset

    ds = _load_embeddings(embeddings)
    reps = apply_mlp_embedder(ds["features"], model_path)
    append_to_embedding_dataset(embeddings, obsm={key: reps})
    click.echo(f"Wrote {key} {reps.shape} into {embeddings}")


@main.command("probe-classifiers")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--label-columns", required=True, help="comma-separated")
@click.option("--splits", default=5)
def probe_classifiers(embeddings, label_columns, splits):
    """Quick cross-validated linear probes over label columns (the
    config-driven orchestrated pipeline is ``run-linear-classifiers``,
    matching the reference name)."""
    from viscy_tpu.evaluation.linear_classifier import cross_validate_classifier

    ds = _load_embeddings(embeddings)
    results = {}
    for col in label_columns.split(","):
        mask = ds["index"][col].notna().to_numpy()
        results[col] = cross_validate_classifier(
            ds["features"][mask], ds["index"].loc[mask, col].to_numpy(), n_splits=splits
        )
    click.echo(json.dumps(results, indent=2, default=float))


@main.command("evaluate-smoothness")
@click.option("--config", "-c", "config_path", required=True, type=click.Path(exists=True))
def evaluate_smoothness_cmd(config_path: str) -> None:
    """Config-driven temporal-smoothness evaluation across models
    (reference ``evaluate-smoothness``): per-group CSVs, plots, combined
    markdown comparison."""
    from viscy_tpu.apps.dynaclr.smoothness_benchmark import (
        SmoothnessEvalConfig,
        evaluate_smoothness,
        format_comparison_summary,
    )
    from viscy_tpu.training.cli_utils import format_markdown_table, load_config

    raw = load_config(config_path)
    cfg = SmoothnessEvalConfig(
        **raw.pop("evaluation", {}), models=raw.get("models", [])
    )
    results = evaluate_smoothness(cfg)
    if not results:
        click.echo("No models were successfully processed.", err=True)
        return
    columns = [
        "smoothness_score",
        "dynamic_range",
        "adjacent_frame_mean",
        "adjacent_frame_peak",
        "random_frame_mean",
        "random_frame_peak",
    ]
    rows = [
        {"model": label, **{c: metrics.get(c) for c in columns}}
        for label, metrics in results.items()
    ]
    click.echo(format_markdown_table(rows, title="Temporal smoothness evaluation"))
    click.echo(format_comparison_summary(results, "smoothness_score", lower_is_better=True))
    click.echo(format_comparison_summary(results, "dynamic_range", lower_is_better=False))
    click.echo(f"Results saved to: {cfg.output_dir}")


@main.command("compare-models")
@click.option("--embeddings", "embedding_dirs", multiple=True, type=click.Path(exists=True))
@click.option(
    "--config",
    "-c",
    "config_path",
    default=None,
    type=click.Path(exists=True),
    help="compare previously saved result CSVs (reference compare-models mode)",
)
@click.option("--distance-metric", default="cosine")
@click.option("--output", default=None, type=click.Path())
def compare_models(embedding_dirs, config_path, distance_metric, output):
    """Model comparison: live smoothness over embedding stores
    (``--embeddings``) or previously saved result files (``-c``,
    reference ``compare-models``)."""
    from viscy_tpu.training.cli_utils import format_markdown_table

    if config_path is not None:
        from viscy_tpu.apps.dynaclr.smoothness_benchmark import (
            CompareModelsConfig,
            compare_result_files,
        )
        from viscy_tpu.training.cli_utils import load_config

        raw = load_config(config_path)
        cfg = CompareModelsConfig(
            result_files=raw.get("result_files", []), **raw.get("comparison", {})
        )
        combined = compare_result_files(cfg)
        if combined.empty:
            click.echo("No valid result files were loaded", err=True)
            return
        click.echo("Model comparison")
        click.echo(combined.to_markdown())
        if cfg.output_path:
            click.echo(f"Results saved to: {cfg.output_path}")
        return

    if not embedding_dirs:
        raise click.UsageError("pass --embeddings stores or a -c results config")
    from viscy_tpu.evaluation.smoothness import compute_embeddings_smoothness

    rows = []
    for d in embedding_dirs:
        ds = _load_embeddings(d)
        index = ds["index"]
        if "fov_name" not in index.columns and "fov" in index.columns:
            index = index.rename(columns={"fov": "fov_name"})
        res = compute_embeddings_smoothness(ds["features"], index, distance_metric)
        rows.append({"model": Path(d).name, **{k: v for k, v in res.items() if isinstance(v, (int, float))}})
    table = format_markdown_table(rows, title="Model comparison")
    if output:
        Path(output).write_text(table)
    click.echo(table)


@main.command("combined-dim-reduction")
@click.option("--embeddings", "embedding_dirs", multiple=True, required=True, type=click.Path(exists=True))
@click.option("--method", default="pca", type=click.Choice(["pca", "umap", "phate"]))
@click.option("--components", default=8)
def combined_dim_reduction(embedding_dirs, method, components):
    """Fit one reduction over the union of datasets, then write each
    dataset's projection back (reference ``combined-dim-reduction``)."""
    from sklearn.decomposition import PCA

    from viscy_tpu.evaluation.zarr_utils import append_to_embedding_dataset

    if method != "pca":
        from viscy_tpu.evaluation.dimensionality_reduction import reduce_features  # noqa: F401

        raise click.ClickException("only pca is installed in this image")
    datasets = [_load_embeddings(d) for d in embedding_dirs]
    combined = np.concatenate([ds["features"] for ds in datasets])
    pca = PCA(n_components=min(components, min(combined.shape) - 1)).fit(combined)
    for d, ds in zip(embedding_dirs, datasets):
        append_to_embedding_dataset(d, obsm={"PCA": pca.transform(ds["features"]).astype(np.float32)})
        click.echo(f"{d}: PCA ({pca.n_components_}) written")


@main.command("plot-mmd-heatmap")
@click.option("--mmd-csv", required=True, type=click.Path(exists=True))
@click.option("--value-column", default="mmd2")
@click.option("--output", required=True, type=click.Path())
def plot_mmd_heatmap(mmd_csv, value_column, output):
    """Render the pairwise MMD matrix (from compute-mmd --output) as a
    heatmap (reference ``plot-mmd-heatmap``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(mmd_csv)
    groups = sorted(set(df["group_a"]) | set(df["group_b"]))
    mat = np.zeros((len(groups), len(groups)))
    pos = {g: i for i, g in enumerate(groups)}
    for _, r in df.iterrows():
        i, j = pos[r["group_a"]], pos[r["group_b"]]
        mat[i, j] = mat[j, i] = r[value_column]
    fig, ax = plt.subplots(figsize=(1 + len(groups), 1 + len(groups)))
    im = ax.imshow(mat, cmap="viridis")
    ax.set_xticks(range(len(groups)), groups, rotation=45, ha="right")
    ax.set_yticks(range(len(groups)), groups)
    fig.colorbar(im, ax=ax, label=value_column)
    fig.tight_layout()
    fig.savefig(output, dpi=120)
    click.echo(f"Wrote heatmap to {output}")


@main.command("inspect-batches")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
@click.option("--num-batches", default=2)
def inspect_batches(config, num_batches):
    """Instantiate the config's datamodule and print batch structure
    (reference ``inspect-batches``)."""
    from viscy_tpu.training.cli_utils import load_config
    from viscy_tpu.training.instantiate import instantiate

    cfg = load_config(config)
    dm = instantiate(cfg["data"])
    dm.prepare_data()
    dm.setup("fit")
    loader = dm.train_dataloader()
    for i, batch in enumerate(loader):
        if i >= num_batches:
            break
        desc = {
            k: (list(np.shape(v)), str(np.asarray(v).dtype))
            for k, v in batch.items()
            if hasattr(v, "shape") or isinstance(v, np.ndarray)
        }
        click.echo(json.dumps({"batch": i, **{k: d for k, d in desc.items()}}, default=str))


@main.command("prepare-eval-configs")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def prepare_eval_configs(config):
    """Generate per-step evaluation configs + JSON manifest
    (reference ``prepare-eval-configs``)."""
    from viscy_tpu.apps.dynaclr.evaluate_pipeline import prepare_configs

    manifest = prepare_configs(config)
    click.echo(json.dumps(manifest, indent=2))


@main.command("check-evals")
@click.option("--output-dir", "output_dirs", multiple=True, required=True, type=click.Path())
def check_evals(output_dirs):
    """Report evaluation completion status per model output dir
    (reference ``check-evals``): which per-step artifacts exist."""
    report = {}
    for d in output_dirs:
        d = Path(d)
        manifest_path = d / "configs" / "manifest.json"
        status = {"manifest": manifest_path.exists()}
        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            emb = Path(manifest.get("embeddings_dir", d / "embeddings"))
            status["embeddings"] = (emb / "index.parquet").exists() or (emb / "obs").exists()
            status["smoothness"] = (d / "smoothness" / "smoothness.json").exists()
            status["mmd"] = (d / "mmd" / "mmd.csv").exists()
            status["linear_classifiers"] = any((d / "linear_classifiers").glob("*")) if (
                d / "linear_classifiers"
            ).exists() else False
        report[str(d)] = status
    click.echo(json.dumps(report, indent=2))


@main.command("append-annotations")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--csv", "csv_path", required=True, type=click.Path(exists=True))
@click.option("--columns", default=None, help="comma-separated task columns; default = all non-key columns")
@click.option("--spatial-tolerance", default=4.0)
def append_annotations_cmd(embeddings, csv_path, columns, spatial_tolerance):
    """Join human-annotation task columns onto the index by
    (fov_name, t, track_id) or (fov_name, id), resolving mitosis-frame
    duplicates spatially (reference ``append-annotations``)."""
    import pandas as pd

    from viscy_tpu.evaluation.annotation import load_annotation
    from viscy_tpu.evaluation.zarr_utils import append_to_embedding_dataset

    ds = _load_embeddings(embeddings)
    join_keys = {"fov_name", "t", "track_id", "id", "y", "x"}
    if columns:
        tasks = columns.split(",")
    else:
        tasks = [c for c in pd.read_csv(csv_path, nrows=1).columns if c not in join_keys]
    counts = {}
    for task in tasks:
        series = load_annotation(ds, csv_path, task, spatial_tolerance=spatial_tolerance)
        counts[task] = int(series.notna().sum())
    append_to_embedding_dataset(embeddings, obs=ds["index"])
    click.echo(json.dumps(counts, indent=2))


@main.command("append-predictions")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--classifier", required=True, type=click.Path(exists=True))
@click.option("--task", default="state")
@click.option("--features-key", default="features")
def append_predictions_cmd(embeddings, classifier, task, features_key):
    """Apply a saved linear classifier to every cell and persist a
    ``predicted_{task}`` column (reference ``append-predictions``)."""
    from viscy_tpu.evaluation.linear_classifier import LinearClassifierPipeline
    from viscy_tpu.evaluation.zarr_utils import append_to_embedding_dataset

    ds = _load_embeddings(embeddings)
    pipeline = LinearClassifierPipeline.load(classifier)
    ds["index"][f"predicted_{task}"] = pipeline.predict(ds[features_key])
    append_to_embedding_dataset(embeddings, obs=ds["index"])
    click.echo(f"Wrote predicted_{task} for {len(ds['index'])} cells")


if __name__ == "__main__":
    main()







@main.command("run-linear-classifiers")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def run_linear_classifiers_cmd(config: str) -> None:
    """Orchestrated per-(task, marker) probe training from a combined
    embedding store (reference ``run-linear-classifiers``)."""
    import yaml

    from viscy_tpu.apps.dynaclr.linear_classifiers.orchestrated import run_linear_classifiers

    with open(config) as f:
        cfg = yaml.safe_load(f)
    results = run_linear_classifiers(
        Path(cfg["embeddings_path"]), cfg, Path(cfg.get("output_dir", "lc_out"))
    )
    click.echo(results.to_string() if not results.empty else "no classifiers trained")


@main.command("cross-validate-datasets")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
@click.option("--task", default=None, help="override the task from the config")
@click.option("--report", is_flag=True, default=False)
def cross_validate_datasets_cmd(config: str, task: str | None, report: bool) -> None:
    """Rotating leave-one-dataset-out CV with impact analysis
    (reference ``cross-validate``)."""
    import yaml

    from viscy_tpu.apps.dynaclr.linear_classifiers.cross_validation import cross_validate

    with open(config) as f:
        cfg = yaml.safe_load(f)
    if task:
        cfg["task"] = task
    if report:
        cfg["report"] = True
    results, summary = cross_validate(cfg)
    if summary.empty:
        click.echo("no cross-validation results")
        return
    click.echo(summary.to_string())


@main.command("mmd-analysis")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
@click.option("--mode", default="per_experiment", type=click.Choice(["per_experiment", "combined", "pooled"]))
def mmd_analysis_cmd(config: str, mode: str) -> None:
    """Full MMD perturbation-effect suite: per-experiment comparisons,
    cross-experiment batch effects, or pooled analysis (reference ``mmd``)."""
    import yaml

    from viscy_tpu.apps.dynaclr.mmd_suite import (
        MMDCombinedConfig,
        MMDEvalConfig,
        MMDPooledConfig,
        run_mmd_analysis,
        run_mmd_combined,
        run_mmd_pooled,
        save_mmd_plots,
    )
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    with open(config) as f:
        raw = yaml.safe_load(f)
    if mode == "per_experiment":
        cfg = MMDEvalConfig(**raw)
        adata = read_embedding_dataset(cfg.input_path)
        df = run_mmd_analysis(adata, cfg)
    elif mode == "combined":
        cfg = MMDCombinedConfig(**raw)
        df = run_mmd_combined(cfg)
    else:
        cfg = MMDPooledConfig(**raw)
        df = run_mmd_pooled(cfg)
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    csv = out_dir / f"mmd_{mode}.csv"
    df.to_csv(csv, index=False)
    if cfg.save_plots and not df.empty:
        save_mmd_plots(df, out_dir, mode=mode)
    click.echo(f"wrote {len(df)} rows to {csv}")


@main.command("build-pseudotime-template")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--tracks-csv", required=True, type=click.Path(exists=True))
@click.option("--output", required=True, type=click.Path())
@click.option("--dataset-id", default="ds")
@click.option("--frame-interval-minutes", default=30.0, type=float)
@click.option("--pca-components", default=20, type=int)
@click.option("--infection-col", default="infection_state")
@click.option("--propagate-columns", default=None, help="comma-separated obs columns")
def build_pseudotime_template_cmd(
    embeddings, tracks_csv, output, dataset_id, frame_interval_minutes, pca_components,
    infection_col, propagate_columns,
) -> None:
    """Build a DTW pseudotime template: lineage-anchor tracks, DBA-average
    their trajectories, persist the template zarr (reference pseudotime)."""
    from viscy_tpu.apps.dynaclr.pseudotime.alignment import align_tracks
    from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import build_template
    from viscy_tpu.apps.dynaclr.pseudotime.io import save_template_zarr

    adata = _load_embeddings(embeddings)
    tracks = pd.read_csv(tracks_csv)
    aligned = align_tracks(tracks, frame_interval_minutes, infection_col=infection_col)
    template = build_template(
        {dataset_id: adata},
        {dataset_id: aligned},
        pca_n_components=pca_components,
        propagate_columns=propagate_columns.split(",") if propagate_columns else None,
    )
    save_template_zarr(output, template)
    click.echo(
        f"template: {template.template.shape} from {template.n_input_tracks} tracks -> {output}"
    )


@main.command("align-pseudotime")
@click.option("--embeddings", required=True, type=click.Path(exists=True))
@click.option("--tracks-csv", required=True, type=click.Path(exists=True))
@click.option("--template", "template_path", required=True, type=click.Path(exists=True))
@click.option("--flavor", default="default")
@click.option("--dataset-id", default="ds")
@click.option("--output", required=True, type=click.Path())
def align_pseudotime_cmd(embeddings, tracks_csv, template_path, flavor, dataset_id, output) -> None:
    """Subsequence-DTW align tracks to a saved template; writes the long-form
    alignment parquet with pseudotime + gating signals."""
    from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import (
        alignment_results_to_dataframe,
        dtw_align_tracks,
    )
    from viscy_tpu.apps.dynaclr.pseudotime.io import load_template_flavor

    adata = _load_embeddings(embeddings)
    tracks = pd.read_csv(tracks_csv)
    template, _ = load_template_flavor(template_path, flavor)
    results = dtw_align_tracks(adata, tracks, template, dataset_id)
    df = alignment_results_to_dataframe(results)
    df.to_parquet(output)
    click.echo(f"aligned {len(results)} tracks -> {output} ({len(df)} rows)")


@main.command("evaluate-pseudotime")
@click.option("--alignment", "alignment_path", required=True, type=click.Path(exists=True))
@click.option("--annotation-col", default="infection_state")
@click.option("--positive-value", default="infected")
def evaluate_pseudotime_cmd(alignment_path, annotation_col, positive_value) -> None:
    """Score pseudotime against annotations (AUC, AP, onset concordance)."""
    from viscy_tpu.apps.dynaclr.pseudotime.evaluation import evaluate_embedding

    df = pd.read_parquet(alignment_path)
    scores = evaluate_embedding(df, annotation_col=annotation_col, positive_value=positive_value)
    click.echo(json.dumps(scores, indent=2))


# exact-name aliases for the reference CLI surface
# (train-classifier/apply-classifier predate the reference naming)
main.add_command(main.commands["train-classifier"], name="train-linear-classifier")
main.add_command(main.commands["apply-classifier"], name="apply-linear-classifier")

"""Dynacell application CLI (reference ``dynacell/__main__.py``).

Routes training subcommands (fit / predict / test / validate) to the
shared viscy CLI and evaluation subcommands to the eval pipeline:

    python -m viscy_tpu.apps.dynacell fit -c unetvit3d/fit.yml
    python -m viscy_tpu.apps.dynacell evaluate -c eval.yml
    python -m viscy_tpu.apps.dynacell evaluate-grouped -c grouped.yml
    python -m viscy_tpu.apps.dynacell cross-condition-probe --eval-dirs d1 d2 --out p.csv
    python -m viscy_tpu.apps.dynacell report -c report.yml

Evaluation configs are plain YAML matching the schema documented in
:mod:`viscy_tpu.apps.dynacell.eval.pipeline`.
"""

from __future__ import annotations

import sys
from pathlib import Path

import click
import yaml


@click.group()
def main() -> None:
    """dynacell: virtual-staining benchmark framework (TPU-native)."""


@main.command()
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def evaluate(config: str) -> None:
    """Run the three-tier evaluation for one leaf config."""
    from viscy_tpu.apps.dynacell.eval.pipeline import evaluate_model

    with open(config) as f:
        cfg = yaml.safe_load(f)
    pixel, mask, feature = evaluate_model(cfg)
    click.echo(f"evaluated: {len(pixel)} pixel rows, {len(mask)} mask rows, {len(feature)} feature rows")


@main.command("evaluate-grouped")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def evaluate_grouped(config: str) -> None:
    """Evaluate every condition of a group, then run the cross-condition probe."""
    from viscy_tpu.apps.dynacell.eval.pipeline import evaluate_predictions_grouped

    with open(config) as f:
        cfg = yaml.safe_load(f)
    results = evaluate_predictions_grouped(cfg)
    click.echo(f"evaluated conditions: {[name for name, _ in results]}")


@main.command("precompute-gt")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def precompute_gt(config: str) -> None:
    """Pre-fill the GT artifact cache so evaluate runs hit it
    (reference ``precompute-gt``)."""
    import json

    from viscy_tpu.apps.dynacell.eval.pipeline import precompute_gt_artifacts

    with open(config) as f:
        cfg = yaml.safe_load(f)
    counts = precompute_gt_artifacts(cfg)
    click.echo(json.dumps(counts, indent=2))


@main.command("cross-condition-probe")
@click.option("--eval-dirs", "-d", multiple=True, required=True, type=click.Path(exists=True))
@click.option("--out", "-o", required=True, type=click.Path())
@click.option("--n-splits", default=5, type=int)
@click.option("--rng-seed", default=2020, type=int)
def cross_condition_probe(eval_dirs, out, n_splits, rng_seed) -> None:
    """Probe condition pairs across finished eval dirs (long-form CSV)."""
    from viscy_tpu.apps.dynacell.eval.cross_condition import run

    path = run([Path(d) for d in eval_dirs], Path(out), n_splits=n_splits, rng_seed=rng_seed)
    click.echo(f"wrote {path}")


@main.command()
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def report(config: str) -> None:
    """Generate model-comparison tables from finished eval dirs.

    Config: ``{results_dirs: {name: path}, metrics: [...], out_dir: ...}``.
    """
    from viscy_tpu.apps.dynacell.eval.tables import (
        comparison_table,
        metric_comparison_barplot,
        to_latex,
        to_markdown,
    )

    with open(config) as f:
        cfg = yaml.safe_load(f)
    model_results = {k: Path(v) for k, v in cfg["results_dirs"].items()}
    table = comparison_table(model_results, metrics=cfg.get("metrics"))
    out_dir = Path(cfg.get("out_dir", "dynacell_report"))
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "comparison.md").write_text(to_markdown(table))
    (out_dir / "comparison.tex").write_text(to_latex(table))
    table.to_csv(out_dir / "comparison.csv")
    fig_fmt = cfg.get("figure_format", "pdf")
    metric_comparison_barplot(
        model_results,
        metrics=cfg.get("metrics"),
        save_path=out_dir / f"comparison_barplot.{fig_fmt}",
    )
    click.echo(to_markdown(table))
    click.echo(f"wrote {out_dir}/comparison.{{md,tex,csv}} + comparison_barplot.{fig_fmt}")


@main.command("spectral-eval")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
@click.option("--mode", default="all", type=click.Choice(["compute", "plot", "all"]))
def spectral_eval(config: str, mode: str) -> None:
    """Per-position time-series spectral metric evaluation
    (reference ``evaluation/spectral_pcc/evaluate.py``)."""
    from viscy_tpu.apps.dynacell.eval.spectral_eval import main as spectral_main

    with open(config) as f:
        cfg = yaml.safe_load(f)
    cfg["mode"] = mode
    spectral_main(cfg)
    click.echo(f"spectral-eval done -> {cfg['output_dir']}")


@main.command("simulate-beads")
@click.option("--config", "-c", type=click.Path(exists=True), default=None)
@click.option("--stage", default="all", type=click.Choice(["simulate", "evaluate", "plot", "all"]))
def simulate_beads(config: str | None, stage: str) -> None:
    """Bead-phantom metric validation under known bleaching
    (reference ``evaluation/spectral_pcc/simulate_beads.py``)."""
    from viscy_tpu.apps.dynacell.eval.simulate_beads import main as sim_main

    cfg = {}
    if config:
        with open(config) as f:
            cfg = yaml.safe_load(f) or {}
    cfg["stage"] = stage
    sim_main(cfg)
    click.echo(f"simulate-beads done -> {cfg.get('output_dir', 'output_simulation')}")


@main.command("spectral-diagnostic")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def spectral_diagnostic(config: str) -> None:
    """Real-timelapse diagnostic: PCC variants + DCR-A0 for one position
    (reference ``evaluation/spectral_pcc/diagnostic_real.py``)."""
    from viscy_tpu.apps.dynacell.eval.diagnostics import diagnostic_real

    with open(config) as f:
        cfg = yaml.safe_load(f)
    df = diagnostic_real(cfg)
    click.echo(f"spectral-diagnostic: {len(df)} timepoints -> {cfg['output_dir']}")


@main.command("spectral-plot-combined")
@click.option("--output-dir", "-o", required=True, type=click.Path(exists=True))
def spectral_plot_combined(output_dir: str) -> None:
    """Median+MAD combined metrics and PCC-variant panels across positions
    (reference ``evaluation/spectral_pcc/plot_combined.py``)."""
    from viscy_tpu.apps.dynacell.eval.diagnostics import (
        plot_combined_metrics,
        plot_pcc_variant_comparison,
        weighted_summary,
    )

    p1 = plot_combined_metrics(Path(output_dir))
    p2 = plot_pcc_variant_comparison(Path(output_dir))
    summary = weighted_summary(Path(output_dir))
    if not summary.empty:
        click.echo(summary.to_string(index=False))
    click.echo(f"wrote {p1} and {p2}")


@main.command("shading-analysis")
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def shading_analysis(config: str) -> None:
    """2x2 shading-artifact comparison from four bead-sim conditions
    (reference ``evaluation/spectral_pcc/plot_shading_analysis.py``).
    Config: ``{csvs: {noshade_nofix: ..., shade_nofix: ..., noshade_fix:
    ..., shade_fix: ...}, output_path: ...}``."""
    from viscy_tpu.apps.dynacell.eval.diagnostics import plot_shading_analysis

    with open(config) as f:
        cfg = yaml.safe_load(f)
    path = plot_shading_analysis(cfg["csvs"], Path(cfg["output_path"]), title=cfg.get("title"))
    click.echo(f"wrote {path}")


def _route_training(argv: list[str]) -> None:
    from viscy_tpu.training.cli import main as viscy_main

    sys.argv = ["viscy"] + argv
    viscy_main()


for _sub in ("fit", "predict", "test", "validate"):

    @main.command(
        name=_sub,
        context_settings={"ignore_unknown_options": True},
        help=f"Route `{_sub}` to the shared viscy CLI.",
    )
    @click.argument("args", nargs=-1, type=click.UNPROCESSED)
    def _train(args, _sub=_sub) -> None:
        _route_training([_sub, *args])


if __name__ == "__main__":
    main()

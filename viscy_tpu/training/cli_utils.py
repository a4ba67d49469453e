"""CLI formatting + config-section loading
(reference ``viscy_utils/cli_utils.py``)."""

from __future__ import annotations

from pathlib import Path

from viscy_tpu.training.compose import load_composed_config

__all__ = ["format_markdown_table", "load_config", "load_config_section", "to_numpy"]


def _fmt(value) -> str:
    return f"{value:.3f}" if isinstance(value, float) else str(value)


def format_markdown_table(
    data: dict | list[dict], title: str | None = None, headers: list[str] | None = None
) -> str:
    """Render a dict (two-column key/value) or list of dicts (one row each)
    as a markdown table (reference ``cli_utils.py:8``)."""
    lines: list[str] = []
    if title:
        lines += [f"## {title}", ""]
    if isinstance(data, dict):
        headers = headers or ["Metric", "Value"]
        lines.append(f"| {' | '.join(headers)} |")
        lines.append("|" + "|".join("---" + "-" * len(h) for h in headers) + "|")
        for key, value in data.items():
            lines.append(f"| {str(key).replace('_', ' ').title()} | {_fmt(value)} |")
    elif isinstance(data, list) and data and isinstance(data[0], dict):
        headers = headers or list(data[0].keys())
        titles = [str(h).replace("_", " ").title() for h in headers]
        lines.append(f"| {' | '.join(titles)} |")
        lines.append("|" + "|".join("---" + "-" * len(t) for t in titles) + "|")
        for row in data:
            lines.append("| " + " | ".join(_fmt(row.get(k, "")) for k in headers) + " |")
    lines.append("")
    return "\n".join(lines)


def load_config(config_path: str | Path) -> dict:
    """YAML load with ``base:`` recipe composition
    (reference ``cli_utils.py:71``)."""
    return load_composed_config(Path(config_path))


def load_config_section(
    config_path: str | Path, section: str | None, default_section: str | None = None
) -> dict:
    """Select ``config[section]``, merging in shared root keys not already
    present in the section (reference ``cli_utils.py:100``) — lets one YAML
    serve several CLI steps."""
    cfg = load_config(config_path)
    if section is None:
        if default_section is None or default_section not in cfg:
            return cfg
        section = default_section
    if section not in cfg:
        raise KeyError(f"Config section not found: {section}")
    section_cfg = cfg[section] or {}
    if not isinstance(section_cfg, dict):
        raise TypeError(f"Config section must be a mapping: {section}")
    merged = dict(section_cfg)
    for k, v in cfg.items():
        if k != section:
            merged.setdefault(k, v)
    return merged


def to_numpy(x):
    """Any array-like (jax, torch, numpy) -> numpy
    (reference ``tensor_utils.py``)."""
    import numpy as np

    if hasattr(x, "detach"):  # torch
        x = x.detach().cpu()
    return np.asarray(x)

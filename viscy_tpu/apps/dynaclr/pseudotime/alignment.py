"""Lineage-aware track alignment to a perturbation event.

Rebuild of reference ``dynaclr/pseudotime/alignment.py``: build lineages
from (fov_name, track_id, parent_track_id), find each lineage's earliest
infected frame, and anchor every member track's clock there
(``t_perturb`` / ``t_relative_minutes``).
"""

from __future__ import annotations

import logging
from typing import Literal

import numpy as np
import pandas as pd

_logger = logging.getLogger("viscy_tpu")

__all__ = ["identify_lineages", "filter_tracks", "assign_t_perturb", "align_tracks"]


def identify_lineages(
    tracking_df: pd.DataFrame, return_both_branches: bool = False
) -> list[tuple[str, list[int]]]:
    """(fov_name, [track_ids]) per lineage branch from parent-child links
    (reference ``identify_lineages``). ``return_both_branches`` yields
    every post-division branch; otherwise the first branch per root."""
    all_lineages: list[tuple[str, list[int]]] = []
    for fov_id, fov_df in tracking_df.groupby("fov_name"):
        first = fov_df.groupby("track_id")["parent_track_id"].first()
        all_tracks = set(first.index)
        child_to_parent = {t: p for t, p in first.items() if p != -1}
        root_tracks = {t for t in all_tracks if first[t] == -1 or first[t] not in all_tracks}
        parent_to_children: dict[int, list[int]] = {}
        for child, parent in child_to_parent.items():
            parent_to_children.setdefault(parent, []).append(child)

        def branches(track_id: int) -> list[list[int]]:
            out = []
            if track_id in parent_to_children:
                for child in parent_to_children[track_id]:
                    for br in branches(child):
                        out.append([track_id] + br)
            else:
                out.append([track_id])
            return out

        for root in root_tracks:
            lineage = branches(root)
            if return_both_branches:
                all_lineages.extend((fov_id, br) for br in lineage)
            else:
                all_lineages.append((fov_id, lineage[0]))
    return all_lineages


def filter_tracks(
    df: pd.DataFrame,
    fov_pattern: str | list[str] | None = None,
    min_timepoints: int = 1,
) -> pd.DataFrame:
    """Filter by FOV substring pattern(s) (OR) and minimum track length."""
    result = df.copy()
    if fov_pattern is not None:
        patterns = [fov_pattern] if isinstance(fov_pattern, str) else list(fov_pattern)
        mask = pd.Series(False, index=result.index)
        for pattern in patterns:
            mask |= result["fov_name"].astype(str).str.contains(pattern, regex=False)
        result = result[mask].copy()
        if result.empty:
            _logger.warning("No FOVs matched pattern(s): %s", patterns)
            return result
    if min_timepoints > 1:
        lengths = result.groupby(["fov_name", "track_id"]).size()
        valid = lengths[lengths >= min_timepoints].index
        result = result.set_index(["fov_name", "track_id"]).loc[valid].reset_index()
    return result


def assign_t_perturb(
    df: pd.DataFrame,
    frame_interval_minutes: float,
    source: Literal["annotation", "prediction"] = "annotation",
    infection_col: str = "infection_state",
    infected_value: str = "infected",
    min_track_timepoints: int = 3,
) -> pd.DataFrame:
    """Anchor every track's clock at its lineage's earliest infected frame.

    Adds ``t_perturb`` (int) + ``t_relative_minutes``; drops tracks whose
    lineage never shows infection and tracks shorter than
    ``min_track_timepoints`` after alignment (reference
    ``assign_t_perturb``). Orphan tracks anchor on their own first
    infected frame.
    """
    df = df.copy()
    if "parent_track_id" not in df.columns:
        df["parent_track_id"] = -1
    col = f"predicted_{infection_col}" if source == "prediction" else infection_col
    if col not in df.columns:
        raise KeyError(f"Column {col!r} not found. Available: {list(df.columns)}")

    lineages = identify_lineages(df, return_both_branches=True)
    track_to_tp: dict[tuple[str, int], int] = {}
    in_lineage: set[tuple[str, int]] = set()
    for fov_name, track_ids in lineages:
        rows = df[(df["fov_name"] == fov_name) & (df["track_id"].isin(track_ids))]
        infected = rows[rows[col] == infected_value]
        if infected.empty:
            continue
        tp = int(infected["t"].min())
        for tid in track_ids:
            track_to_tp[(fov_name, tid)] = tp
            in_lineage.add((fov_name, tid))
    n_lineage = len(in_lineage)
    n_orphan = 0
    for (fov_name, tid), group in df.groupby(["fov_name", "track_id"]):
        if (fov_name, tid) in in_lineage:
            continue
        infected = group[group[col] == infected_value]
        if not infected.empty:
            track_to_tp[(fov_name, tid)] = int(infected["t"].min())
            n_orphan += 1

    keys = list(zip(df["fov_name"], df["track_id"]))
    df["t_perturb"] = [track_to_tp.get(k) for k in keys]
    df = df.dropna(subset=["t_perturb"])
    if min_track_timepoints > 1:
        lengths = df.groupby(["fov_name", "track_id"]).size()
        valid = lengths[lengths >= min_track_timepoints].index
        df = df.set_index(["fov_name", "track_id"]).loc[valid].reset_index()
    df["t_perturb"] = df["t_perturb"].astype(int)
    df["t_relative_minutes"] = (df["t"] - df["t_perturb"]) * frame_interval_minutes
    _logger.info(
        "Tracks with infection: %d (lineage: %d, orphan: %d)", len(track_to_tp), n_lineage, n_orphan
    )
    return df


def align_tracks(
    df: pd.DataFrame,
    frame_interval_minutes: float,
    source: Literal["annotation", "prediction"] = "annotation",
    infection_col: str = "infection_state",
    infected_value: str = "infected",
    min_track_timepoints: int = 3,
    fov_pattern: str | list[str] | None = None,
) -> pd.DataFrame:
    """``filter_tracks`` + ``assign_t_perturb`` in one call."""
    filtered = filter_tracks(df, fov_pattern=fov_pattern, min_timepoints=1)
    return assign_t_perturb(
        filtered,
        frame_interval_minutes=frame_interval_minutes,
        source=source,
        infection_col=infection_col,
        infected_value=infected_value,
        min_track_timepoints=min_track_timepoints,
    )

"""EmbeddingVisualizationApp full-surface tests.

Mirrors the reference Dash app's non-server behavior
(``/root/reference/packages/viscy-utils/src/viscy_utils/evaluation/
visualization.py``): image preloading via the triplet predict pipeline,
validated disk cache, track-/time-colored figures, polygon (lasso)
selection, trajectory image strips, cluster galleries, and outputs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.evaluation.visualization import EmbeddingVisualizationApp
from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset
from viscy_tpu.zarr_io.store import open_ome_zarr
from viscy_tpu.zarr_io.synthetic import build_hcs_plate

CHANNELS = ["Phase3D", "GFP"]


def _inject_norm_meta(plate_path):
    plate = open_ome_zarr(str(plate_path), mode="r+")
    for _, pos in plate.positions():
        d = pos.zattrs.asdict()
        d["normalization"] = {
            ch: {"fov_statistics": {"mean": 0.5, "std": 0.25, "median": 0.5, "iqr": 0.3}}
            for ch in CHANNELS
        }
        pos.zattrs._replace(d)


@pytest.fixture(scope="module")
def viz_dataset(tmp_path_factory):
    """Plate + tracks + embedding store for two FOVs."""
    root = tmp_path_factory.mktemp("vizapp")
    plate_path = build_hcs_plate(
        root / "plate.zarr",
        CHANNELS,
        zyx_shape=(4, 96, 96),
        rows=("A",),
        cols=("1",),
        fovs=("0", "1"),
        num_timepoints=3,
        seed=0,
    )
    _inject_norm_meta(plate_path)
    rng = np.random.default_rng(0)
    plate = open_ome_zarr(str(plate_path))
    index_rows = []
    for name, _ in plate.positions():
        rows = []
        for track_id in range(2):
            y, x = rng.integers(35, 60, 2)
            for t in range(3):
                rows.append(
                    {
                        "track_id": track_id,
                        "t": t,
                        "y": int(y),
                        "x": int(x),
                        "id": track_id * 10 + t,
                        "parent_track_id": -1,
                        "parent_id": -1,
                    }
                )
                index_rows.append({"fov_name": name, "track_id": track_id, "t": t})
        pd.DataFrame(rows).to_csv(plate_path / name / "tracks.csv", index=False)

    index = pd.DataFrame(index_rows)
    feats = rng.normal(size=(len(index), 8)).astype(np.float32)
    emb_path = root / "embeddings"
    write_embedding_dataset(emb_path, feats, index)
    return plate_path, emb_path, root


@pytest.fixture(scope="module")
def app(viz_dataset):
    plate_path, emb_path, root = viz_dataset
    fovs = sorted({p for p, _ in open_ome_zarr(str(plate_path)).positions()})
    app = EmbeddingVisualizationApp(
        features_path=str(emb_path),
        data_path=str(plate_path),
        tracks_path=str(plate_path),
        channels_to_display=CHANNELS,
        fov_tracks={fovs[0]: "all", fovs[1]: [0]},
        z_range=(0, 4),
        yx_patch_size=(32, 32),
        cache_path=str(root / "image_cache.pkl"),
        num_loading_workers=0,
        output_dir=str(root / "out"),
    )
    app.preload_images()
    return app


class TestImagePipeline:
    def test_preload_populates_cache(self, app):
        # fov0: 2 tracks x 3 t; fov1: 1 track x 3 t
        assert len(app.image_cache) == 9
        entry = next(iter(app.image_cache.values()))
        assert set(entry) == set(CHANNELS)
        for ch, img in entry.items():
            assert img.dtype == np.uint8
            assert img.shape == (32, 32)

    def test_cache_roundtrip_and_invalidation(self, app, viz_dataset):
        _, _, root = viz_dataset
        assert Path(app.cache_path).exists()  # saved by preload
        saved = dict(app.image_cache)
        app.image_cache = {}
        assert app.load_cache()
        assert app.image_cache.keys() == saved.keys()
        # config change invalidates
        app.yx_patch_size = (64, 64)
        assert not app.load_cache()
        app.yx_patch_size = (32, 32)
        assert app.load_cache()

    def test_normalize_and_base64(self):
        img = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
        norm = EmbeddingVisualizationApp._normalize_image(img)
        assert norm.dtype == np.uint8
        assert norm.min() == 0 and norm.max() == 255
        flat = EmbeddingVisualizationApp._normalize_image(np.ones((4, 4)))
        assert flat.max() == 0
        uri = EmbeddingVisualizationApp._numpy_to_base64(norm)
        assert uri.startswith("data:image/jpeg;base64,")


class TestFigures:
    def test_track_colored_figure(self, app):
        fig = app.create_track_colored_figure(show_arrows=True)
        assert fig.axes, "figure should have axes"
        ax = fig.axes[0]
        # equal aspect enforced
        assert ax.get_aspect() == 1.0

    def test_time_colored_figure(self, app):
        fig = app.create_time_colored_figure(show_arrows=True)
        assert len(fig.axes) >= 2  # scatter + colorbar


class TestSelection:
    def test_polygon_and_box_selection(self, app):
        df = app.filtered_features_df
        x, y = app.default_x, app.default_y
        # box covering everything selects everything
        sel = app.select_points(
            x_range=(df[x].min() - 1, df[x].max() + 1),
            y_range=(df[y].min() - 1, df[y].max() + 1),
        )
        assert len(sel) == len(df)
        # polygon around one point selects it
        px, py = df[x].iloc[0], df[y].iloc[0]
        eps = 1e-3
        poly = [
            (px - eps, py - eps),
            (px + eps, py - eps),
            (px + eps, py + eps),
            (px - eps, py + eps),
        ]
        sel = app.select_points(polygon=poly)
        assert len(sel) >= 1
        with pytest.raises(ValueError):
            app.select_points()

    def test_trajectory_strip_and_cluster_gallery(self, app):
        sel = app.filtered_features_df
        fig = app.trajectory_image_strip(sel, channel="Phase3D")
        # one image row per (fov, track): 3 groups
        assert len(fig.axes) >= 3
        app.clusters.clear()
        app.cluster_names.clear()
        app.add_cluster(sel.head(3), name="early")
        gallery = app.cluster_image_gallery(channel="GFP")
        assert gallery.axes

    def test_empty_cluster_gallery(self, viz_dataset):
        _, emb_path, root = viz_dataset
        app2 = EmbeddingVisualizationApp(features_path=str(emb_path))
        fig = app2.cluster_image_gallery()
        assert fig.axes


class TestOutputs:
    def test_output_summary_and_dir(self, app):
        summary = app.output_info_summary()
        assert "cached images: 9" in summary
        assert "clusters:" in summary
        out = app.get_output_dir()
        assert out.exists()

    def test_export_html_self_contained(self, app):
        """run()/export_html writes a single-file interactive viewer with
        embedded data, patch images, and the JS controls (VERDICT r2 item 7;
        reference Dash app ``visualization.py:180-1040``)."""
        import json
        import re

        app.add_cluster(app.filtered_features_df.head(2), name="demo")
        path = app.run()
        html = open(path).read()
        # one self-contained file: payload JSON, base64 JPEG images, JS hooks
        m = re.search(
            r'<script id="payload" type="application/json">(.*?)</script>',
            html,
            re.DOTALL,
        )
        assert m, "payload script block missing"
        payload = json.loads(m.group(1))
        assert payload["points"] and payload["dims"]
        assert any(
            uri.startswith("data:image/jpeg;base64,")
            for entry in payload["images"].values()
            for uri in entry.values()
        ), "no embedded patch images"
        assert any(c["name"] == "demo" for c in payload["clusters"])
        for hook in ("id=\"scatter\"", "Download clusters CSV", "shift-drag"):
            assert hook in html, hook
        # no external resources: fully offline
        assert "http://" not in html and "https://" not in html

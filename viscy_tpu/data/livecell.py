"""LiveCell COCO datamodule (reference ``viscy_data/livecell.py:35,89,170``).

COCO-annotation-driven dataset of single-channel TIFF crops. COCO JSON is
parsed natively (no pycocotools dependency); TIFF reading requires
``tifffile`` or PIL.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from viscy_tpu.data.hcs import DataModule
from viscy_tpu.data.loader import DataLoader


def _read_image(path: Path) -> np.ndarray:
    try:
        import tifffile

        return tifffile.imread(path).astype(np.float32)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path), np.float32)


class LiveCellDataset:
    """Images + instance annotations from a COCO JSON."""

    def __init__(self, images_dir: str | Path, annotations_json: str | Path) -> None:
        self.images_dir = Path(images_dir)
        with open(annotations_json) as f:
            coco = json.load(f)
        self.images = {img["id"]: img for img in coco["images"]}
        self.annotations_by_image: dict[int, list] = {}
        for ann in coco.get("annotations", []):
            self.annotations_by_image.setdefault(ann["image_id"], []).append(ann)
        self.image_ids = sorted(self.images)

    def __len__(self) -> int:
        return len(self.image_ids)

    def __getitem__(self, idx: int) -> dict:
        image_id = self.image_ids[idx]
        info = self.images[image_id]
        img = _read_image(self.images_dir / info["file_name"])
        anns = self.annotations_by_image.get(image_id, [])
        boxes = np.asarray([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
        return {
            "source": img[None, None],  # (C=1, Z=1, Y, X)
            "boxes": boxes,
            "image_id": image_id,
        }


def _rasterize_polygons(polys: list, shape: tuple[int, int]) -> np.ndarray:
    """Instance label image from COCO polygon segmentations (native fill)."""
    labels = np.zeros(shape, np.int32)
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    pts = np.stack([xx.ravel() + 0.5, yy.ravel() + 0.5], axis=1)
    from matplotlib.path import Path as MplPath

    for i, segs in enumerate(polys, start=1):
        for seg in segs:
            poly = np.asarray(seg, np.float64).reshape(-1, 2)
            if len(poly) < 3:
                continue
            # bounding-box crop keeps contains_points cheap
            x0, y0 = np.floor(poly.min(0)).astype(int).clip(0)
            x1 = int(min(np.ceil(poly[:, 0].max()) + 1, w))
            y1 = int(min(np.ceil(poly[:, 1].max()) + 1, h))
            if x1 <= x0 or y1 <= y0:
                continue
            sub = pts.reshape(h, w, 2)[y0:y1, x0:x1].reshape(-1, 2)
            inside = MplPath(poly).contains_points(sub).reshape(y1 - y0, x1 - x0)
            labels[y0:y1, x0:x1][inside] = i
    return labels


class LiveCellTestDataset(LiveCellDataset):
    """Test-stage LiveCell dataset (reference ``livecell.py:89``): returns
    the image plus, optionally, duplicated target channel and instance
    label masks rasterized natively from the COCO polygon annotations."""

    def __init__(
        self,
        image_dir: str | Path,
        annotations: str | Path,
        transform=None,
        load_target: bool = False,
        load_labels: bool = False,
    ) -> None:
        super().__init__(image_dir, annotations)
        self.transform = transform
        self.load_target = load_target
        self.load_labels = load_labels

    def __getitem__(self, idx: int) -> dict:
        sample = super().__getitem__(idx)
        if self.load_target:
            sample["target"] = sample["source"].copy()
        if self.load_labels:
            image_id = sample["image_id"]
            info = self.images[image_id]
            anns = self.annotations_by_image.get(image_id, [])
            polys = [a.get("segmentation", []) for a in anns]
            sample["labels"] = _rasterize_polygons(
                polys, (info["height"], info["width"])
            )[None, None]
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class LiveCellDataModule(DataModule):
    """Train/val/test over LiveCell splits."""

    def __init__(
        self,
        images_dir: str | Path,
        train_annotations: str | Path | None = None,
        val_annotations: str | Path | None = None,
        test_annotations: str | Path | None = None,
        batch_size: int = 8,
        num_workers: int = 4,
    ) -> None:
        self.images_dir = Path(images_dir)
        self.train_annotations = train_annotations
        self.val_annotations = val_annotations
        self.test_annotations = test_annotations
        self.batch_size = batch_size
        self.num_workers = num_workers

    def setup(self, stage: str) -> None:
        if stage in ("fit", "validate"):
            self.train_dataset = LiveCellDataset(self.images_dir, self.train_annotations)
            self.val_dataset = LiveCellDataset(self.images_dir, self.val_annotations)
        elif stage == "test":
            self.test_dataset = LiveCellDataset(self.images_dir, self.test_annotations)

    def _collate(self, samples: list) -> dict:
        return {
            "source": np.stack([s["source"] for s in samples]),
            "boxes": [s["boxes"] for s in samples],
            "image_id": [s["image_id"] for s in samples],
        }

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self.train_dataset,
            batch_size=self.batch_size,
            shuffle=True,
            num_workers=self.num_workers,
            collate_fn=self._collate,
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.val_dataset,
            batch_size=self.batch_size,
            num_workers=self.num_workers,
            collate_fn=self._collate,
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(
            self.test_dataset,
            batch_size=self.batch_size,
            num_workers=self.num_workers,
            collate_fn=self._collate,
        )

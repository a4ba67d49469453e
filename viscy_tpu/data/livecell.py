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

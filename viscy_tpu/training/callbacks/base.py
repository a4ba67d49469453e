"""Callback protocol (Lightning-hook analog)."""

from __future__ import annotations

from typing import Any


class Callback:
    """Base callback; hooks mirror the subset of Lightning hooks the
    reference uses (prediction/embedding writers, online eval, logging)."""

    def on_fit_start(self, trainer, module) -> None: ...

    def on_fit_end(self, trainer, module) -> None: ...

    def on_train_epoch_start(self, trainer, module, epoch: int) -> None: ...

    def on_train_batch_end(
        self, trainer, module, outputs: dict, batch: dict, batch_idx: int
    ) -> None: ...

    def on_train_epoch_end(self, trainer, module, epoch: int) -> None: ...

    def on_validation_epoch_start(self, trainer, module) -> None: ...

    def on_validation_batch_end(
        self, trainer, module, outputs: dict, batch: dict, batch_idx: int
    ) -> None: ...

    def on_validation_epoch_end(self, trainer, module, metrics: dict) -> None: ...

    def on_predict_start(self, trainer, module) -> None: ...

    def write_on_batch_end(
        self, trainer, module, prediction: Any, batch: dict, batch_idx: int
    ) -> None: ...

    def on_predict_end(self, trainer, module) -> None: ...

    def on_test_batch_end(
        self, trainer, module, outputs: dict, batch: dict, batch_idx: int
    ) -> None: ...

    def on_test_end(self, trainer, module, metrics: dict) -> None: ...

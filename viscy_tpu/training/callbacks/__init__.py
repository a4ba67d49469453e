"""Trainer callbacks (prediction writer, embedding writer, online eval)."""

from viscy_tpu.training.callbacks.base import Callback

__all__ = ["Callback"]

"""Callback event registry — the framework's extension seam.

Same event model as the reference (`utils/callbacks/base.py:144-218`):
named hooks fired at train/val/predict lifecycle points; integrations
(TensorBoard, CSV, user hooks) register plain functions.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Dict, List

EVENTS = [
    "on_pretrain_routine_start",
    "on_pretrain_routine_end",
    "on_train_start",
    "on_train_epoch_start",
    "on_train_batch_start",
    "on_train_batch_end",
    "on_train_epoch_end",
    "on_fit_epoch_end",
    "on_model_save",
    "on_train_end",
    "on_val_start",
    "on_val_batch_start",
    "on_val_batch_end",
    "on_val_end",
    "on_predict_start",
    "on_predict_batch_start",
    "on_predict_batch_end",
    "on_predict_end",
    "teardown",
]


class Callbacks:
    def __init__(self) -> None:
        self._hooks: Dict[str, List[Callable]] = defaultdict(list)

    def add(self, event: str, fn: Callable) -> None:
        assert event in EVENTS, f"unknown event {event!r}; valid: {EVENTS}"
        self._hooks[event].append(fn)

    def fire(self, event: str, *args: Any, **kwargs: Any) -> None:
        for fn in self._hooks.get(event, []):
            fn(*args, **kwargs)


def add_tensorboard(callbacks: "Callbacks", log_dir: str) -> bool:
    """TensorBoard integration (reference `callbacks/tensorboard.py`)."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        return False
    writer = SummaryWriter(log_dir)

    def on_fit_epoch_end(engine, epoch, metrics):
        for k, v in metrics.items():
            try:
                writer.add_scalar(k, float(v), epoch)
            except (TypeError, ValueError):
                pass

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    callbacks.add("teardown", lambda *a, **k: writer.close())
    return True

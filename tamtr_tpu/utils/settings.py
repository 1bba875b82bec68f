"""Persistent user settings (reference `utils/__init__.py:827-931`
SettingsManager -> `~/.config/Ultralytics/settings.yaml`).

A version-keyed YAML settings file holding machine-level defaults that
should survive across runs: dataset/weights/runs directories and per-
integration enable flags (the reference gates its 9 logger callbacks on
these). `SETTINGS` is the process-wide instance; `yolo settings`
(`cli.py`) prints/updates/resets it (reference `cfg/__init__.py:239-260`
handle_yolo_settings).
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path
from typing import Any, Dict

import yaml

SETTINGS_VERSION = "0.1.0"


def _config_dir() -> Path:
    base = os.environ.get("TAMTR_CONFIG_DIR") or os.environ.get(
        "XDG_CONFIG_HOME", str(Path.home() / ".config")
    )
    return Path(base) / "tamtr_tpu"


class SettingsManager(dict):
    """Dict-backed settings with YAML persistence and version-keyed reset."""

    def __init__(self, file: Path | str | None = None) -> None:
        self.file = Path(file) if file else _config_dir() / "settings.yaml"
        root = Path.cwd()
        self.defaults: Dict[str, Any] = {
            "settings_version": SETTINGS_VERSION,
            "datasets_dir": str(root / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "uuid": "",  # filled on first save (anonymous install id)
            "sync": False,  # crash/usage telemetry master switch (off: zero egress)
            # integration toggles (reference settings.yaml keys)
            "hub": False,
            "tensorboard": True,
            "wandb": True,
            "mlflow": True,
            "comet": True,
            "clearml": True,
            "neptune": True,
            "dvc": True,
            "raytune": True,
        }
        super().__init__(self.defaults)
        try:
            if self.file.exists():
                loaded = yaml.safe_load(self.file.read_text()) or {}
                if (
                    loaded.get("settings_version") == SETTINGS_VERSION
                    and set(loaded) == set(self.defaults)
                ):
                    self.update(loaded)
                # version/key mismatch: keep defaults (reference resets)
        except Exception:
            pass  # unreadable settings never block the run

    def save(self) -> None:
        if not self["uuid"]:
            self["uuid"] = uuid.uuid4().hex
        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(yaml.safe_dump(dict(self), sort_keys=False))

    def update(self, *args, **kwargs) -> None:  # type: ignore[override]
        new = dict(*args, **kwargs)
        unknown = set(new) - set(self.defaults)
        if unknown:
            raise KeyError(
                f"unknown settings key(s) {sorted(unknown)}; valid: {sorted(self.defaults)}"
            )
        super().update(new)

    def reset(self) -> None:
        self.clear()
        super().update(self.defaults)
        self.save()


SETTINGS = SettingsManager()

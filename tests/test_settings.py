"""Persistent SettingsManager + SETTINGS-gated integrations (reference
`utils/__init__.py:827-931`, `cfg/__init__.py:239-260`)."""

from pathlib import Path

import pytest
import yaml


def test_settings_roundtrip(tmp_path):
    from tamtr_tpu.utils.settings import SettingsManager

    f = tmp_path / "settings.yaml"
    s = SettingsManager(f)
    assert s["tensorboard"] is True and s["sync"] is False
    s.update({"wandb": False, "runs_dir": str(tmp_path / "runs")})
    s.save()
    assert f.exists() and s["uuid"]

    s2 = SettingsManager(f)  # reload: persisted values survive
    assert s2["wandb"] is False
    assert s2["runs_dir"] == str(tmp_path / "runs")
    assert s2["uuid"] == s["uuid"]

    with pytest.raises(KeyError):
        s2.update({"not_a_key": 1})

    s2.reset()
    assert s2["wandb"] is True
    assert yaml.safe_load(f.read_text())["wandb"] is True


def test_settings_version_mismatch_resets(tmp_path):
    from tamtr_tpu.utils.settings import SettingsManager

    f = tmp_path / "settings.yaml"
    f.write_text(yaml.safe_dump({"settings_version": "0.0.0", "wandb": False}))
    s = SettingsManager(f)  # old version: fall back to defaults
    assert s["wandb"] is True


def test_attach_integrations_gated(tmp_path):
    from tamtr_tpu.utils.callbacks import Callbacks, attach_integrations
    from tamtr_tpu.utils.settings import SettingsManager

    s = SettingsManager(tmp_path / "s.yaml")
    cb = Callbacks()
    # everything disabled => nothing attaches, regardless of installs
    off = {**s, **{k: False for k in ("tensorboard", "wandb", "mlflow", "comet",
                                      "clearml", "neptune", "dvc", "raytune")}}
    assert attach_integrations(cb, tmp_path, settings=off) == []
    # tensorboard enabled (torch TB is installed in this image) => attaches
    on_tb = {**off, "tensorboard": True}
    assert attach_integrations(Callbacks(), tmp_path, settings=on_tb) == ["tensorboard"]


def test_cli_settings(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("TAMTR_CONFIG_DIR", str(tmp_path))
    import importlib

    import tamtr_tpu.utils.settings as settings_mod

    importlib.reload(settings_mod)  # pick up the env-var config dir
    from tamtr_tpu.cli import main

    main(["settings", "mlflow=False"])
    out = capsys.readouterr().out
    assert "mlflow: false" in out
    assert (tmp_path / "tamtr_tpu" / "settings.yaml").exists()
    main(["settings", "reset"])
    out = capsys.readouterr().out
    assert "mlflow: true" in out


def test_crash_report_file(tmp_path, monkeypatch):
    """Unhandled-exception hook writes a local crash report (the zero-egress
    set_sentry counterpart): gated on sync, skips KeyboardInterrupt/FNF/OOM."""
    import sys

    from tamtr_tpu.utils import crash

    monkeypatch.setattr(crash, "_crash_dir", lambda: tmp_path / "reports")
    # direct writer
    try:
        raise RuntimeError("boom for test")
    except RuntimeError:
        p = crash.write_crash_report(*sys.exc_info())
    assert p is not None and p.exists()
    text = p.read_text()
    assert "boom for test" in text and "jax:" in text

    # hook filters: KeyboardInterrupt and OOM produce no report
    calls = []
    monkeypatch.setattr(crash, "_PREV_HOOK", lambda *a: calls.append(a))
    n0 = len(list((tmp_path / "reports").glob("*.txt")))
    crash._hook(KeyboardInterrupt, KeyboardInterrupt(), None)
    crash._hook(RuntimeError, RuntimeError("RESOURCE_EXHAUSTED: out of memory"), None)
    assert len(list((tmp_path / "reports").glob("*.txt"))) == n0
    assert len(calls) == 2  # chains to the previous hook regardless

    # a real error is reported
    try:
        raise ValueError("real crash")
    except ValueError:
        crash._hook(*sys.exc_info())
    reports = list((tmp_path / "reports").glob("*.txt"))
    assert len(reports) == n0 + 1

    # set_crash_reporting is gated off under pytest
    assert crash.set_crash_reporting() is False

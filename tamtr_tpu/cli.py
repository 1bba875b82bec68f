"""CLI entrypoint: `python -m tamtr_tpu <task> <mode> k=v ...`

Mirrors the reference `yolo` CLI (`cfg/__init__.py:entrypoint`, lines
313-449): positional task/mode plus `key=value` overrides.

    python -m tamtr_tpu detect train data=visdrone.yaml epochs=300 batch=6
    python -m tamtr_tpu detect val model=runs/train/exp/weights/best data=visdrone.yaml
    python -m tamtr_tpu detect predict model=... source=images/ save=true
    python -m tamtr_tpu detect track model=... source=video.mp4 tracker=botsort
    python -m tamtr_tpu segment train data=... model=yolo-seg-gelan.yaml
    python -m tamtr_tpu classify train data=imagefolder/
    python -m tamtr_tpu detect export model=... format=savedmodel
    python -m tamtr_tpu detect benchmark model=...
"""

from __future__ import annotations

import sys
from typing import Any, Dict, List

TASKS = ("detect", "segment", "pose", "classify")
MODES = ("train", "val", "predict", "track", "export", "benchmark", "tune", "serve")

# default model yaml per task (detect is the flagship TAM-TR)
TASK_MODELS = {
    "detect": "tamtr.yaml",
    "segment": "yolo-seg-gelan.yaml",
    "pose": "yolo-pose-gelan.yaml",
    "classify": "classify-gelan.yaml",
}


def _parse_value(v: str) -> Any:
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() in ("none", "null"):
        return None
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def parse_args(argv: List[str]):
    task, mode = "detect", None
    overrides: Dict[str, Any] = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _parse_value(v)
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a in ("-h", "--help", "help"):
            print(__doc__)
            raise SystemExit(0)
        elif a == "version":
            from tamtr_tpu import __version__

            print(__version__)
            raise SystemExit(0)
        else:
            close = [m for m in MODES + TASKS if a in m]
            raise SystemExit(
                f"unknown argument {a!r}" + (f" (did you mean {close[0]!r}?)" if close else "")
            )
    if mode is None:
        raise SystemExit(f"specify a mode: {MODES}")
    return task, mode, overrides


def main(argv: List[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    # local crash-report file on unhandled exceptions (the zero-egress
    # counterpart of the reference's set_sentry; gated on SETTINGS["sync"])
    from tamtr_tpu.utils.crash import set_crash_reporting

    set_crash_reporting()
    if argv and argv[0] == "settings":
        # `yolo settings [reset] [k=v ...]` (reference handle_yolo_settings,
        # `cfg/__init__.py:239-260`)
        import yaml as _yaml

        from tamtr_tpu.utils.settings import SETTINGS

        rest = argv[1:]
        if rest and rest[0] == "reset":
            SETTINGS.reset()
            print("settings reset to defaults")
        elif rest:
            SETTINGS.update({k: _parse_value(v) for k, v in (a.split("=", 1) for a in rest)})
            SETTINGS.save()
        print(_yaml.safe_dump(dict(SETTINGS), sort_keys=False))
        return
    task, mode, ov = parse_args(argv)
    if mode == "serve":
        # `yolo serve model=<ckpt> port=8000` — HTTP inference server
        # (tamtr_tpu.serve; the reference's Triton-serving analogue)
        from tamtr_tpu.serve import serve_checkpoint

        if "model" not in ov:
            raise SystemExit(
                "yolo serve requires model=<checkpoint>, e.g. "
                "`yolo serve model=runs/detect/train/weights/best port=8000`"
            )
        srv = serve_checkpoint(
            str(ov.pop("model")),
            endpoint=str(ov.pop("endpoint", "tamtr")),
            host=str(ov.pop("host", "127.0.0.1")),
            port=int(ov.pop("port", 8000)),
            nc=ov.pop("nc", None),
            imgsz=int(ov.pop("imgsz", 640)),
        )
        print(f"serving at {srv.url}")
        srv.serve_forever()
        return
    from tamtr_tpu import TAMTR

    model_arg = ov.pop("model", TASK_MODELS[task])
    is_yaml = str(model_arg).endswith((".yaml", ".yml"))
    model = TAMTR(str(model_arg) if is_yaml else TASK_MODELS[task], task=task)
    if not is_yaml:
        # nc=/names= help load checkpoints that predate metadata
        nc = ov.pop("nc", None)
        names = ov.pop("names", None)
        if isinstance(names, str):
            names = names.split(",")
        model.load(str(model_arg), nc=nc, names=names)
    if mode == "train":
        print(model.train(**ov))
    elif mode == "val":
        print(model.val(**ov))
    elif mode == "predict":
        source = ov.pop("source", None)
        save = ov.pop("save", False)
        results = model.predict(source, **ov)
        for r in results:
            n = len(r.boxes) if hasattr(r, "boxes") else len(r.get("scores", []))
            print(f"{getattr(r, 'path', r.get('path') if isinstance(r, dict) else '?')}: {n} detections")
            if save and hasattr(r, "save"):
                from pathlib import Path

                out = Path(ov.get("project", "runs")) / "predict"
                out.mkdir(parents=True, exist_ok=True)
                r.save(out / Path(r.path).name)
    elif mode == "track":
        source = ov.pop("source", None)
        tracker = ov.pop("tracker", "bytetrack")
        results = model.track(source, tracker=tracker, **ov)
        for r in results:
            print(f"{r.path}: {len(r.track_ids)} tracks {sorted(set(r.track_ids.tolist()))}")
    elif mode == "export":
        fmt = ov.pop("format", "savedmodel")
        print(model.export(fmt, **ov))
    elif mode == "benchmark":
        from tamtr_tpu.utils.benchmarks import benchmark

        for row in benchmark(model._lazy_engine(), **ov):
            print(row)
    elif mode == "tune":
        iters = int(ov.pop("iterations", 10))
        print(model.tune(iters, **ov))


if __name__ == "__main__":
    main()

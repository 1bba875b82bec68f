#!/usr/bin/env python
"""Long-run durability rehearsal (VERDICT r4 #7): the 300-epoch stand-in.

Runs a >= N-step real-chip training on synthetic data through the FULL
recipe machinery and proves the run *survives*: warmup -> steady LR,
close_mosaic transition, periodic checkpointing, a mid-run SIGTERM with a
preemption checkpoint, resume across the seam, EarlyStopping armed,
results.csv + plots, and a final EMA-vs-raw val comparison. Writes one
artifact: bench_artifacts/r05/soak.json with the loss curve, the resume
seam, and finiteness flags.

Reference anchor: `engine/trainer.py:285-421` (the training loop whose
durability this rehearses).

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/soak_train.py \
      --root /tmp/tamtr_soak --epochs 130 --sigterm-after 420
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_phase(label, yml, root, args, resume, budget_s):
    """One training phase in a subprocess; optionally SIGTERM it mid-run."""
    code = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from tamtr_tpu.api import TAMTR
m = TAMTR({args.model!r})
m.train(
    data={str(yml)!r}, epochs={args.epochs}, batch={args.batch},
    imgsz={args.imgsz}, max_gt={args.max_gt}, warmup_epochs=100,
    close_mosaic={args.close_mosaic}, patience={args.patience},
    val_interval={args.val_interval}, save_interval={args.save_interval},
    conf=0.05, nbs={args.batch}, name="soak", project={str(root / "runs")!r},
    exist_ok=True, workers=2, plots=True, resume={resume},
    bf16={args.bf16},
)
print("PHASE-DONE")
"""
    env = dict(os.environ)
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    sigterm_at = None
    if args.sigterm_after and not resume:
        # let it train, then deliver the preemption signal mid-run
        while proc.poll() is None and time.time() - t0 < args.sigterm_after:
            time.sleep(5)
        if proc.poll() is None:
            sigterm_at = time.time() - t0
            proc.send_signal(signal.SIGTERM)
            print(f"[{label}] SIGTERM sent at {sigterm_at:.0f}s", flush=True)
    try:
        out, _ = proc.communicate(timeout=budget_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        out += "\n<phase killed at budget>"
    print(f"[{label}] rc={proc.returncode} elapsed={time.time() - t0:.0f}s")
    tail = out[-2500:]
    print(tail, flush=True)
    return {
        "rc": proc.returncode,
        "elapsed_s": round(time.time() - t0, 1),
        "sigterm_at_s": round(sigterm_at, 1) if sigterm_at else None,
        "saw_preemption_msg": "preemption checkpoint saved" in out,
        "done": "PHASE-DONE" in out,
        "tail": tail[-800:],
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/tamtr_soak")
    ap.add_argument("--model", default="tamtr.yaml")
    ap.add_argument("--epochs", type=int, default=130)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--max-gt", type=int, default=32)
    ap.add_argument("--close-mosaic", type=int, default=20)
    ap.add_argument("--patience", type=int, default=200)
    ap.add_argument("--val-interval", type=int, default=25)
    ap.add_argument("--save-interval", type=int, default=25)
    ap.add_argument("--sigterm-after", type=int, default=420,
                    help="seconds into phase A to deliver SIGTERM (0 = off)")
    ap.add_argument("--phase-budget", type=int, default=4800)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--out", default=str(REPO / "bench_artifacts/r05/soak.json"))
    args = ap.parse_args(argv)

    root = Path(args.root)
    from tools.smoke_train import make_dataset

    yml = make_dataset(root, args.n_train, args.n_val, args.imgsz)

    report = {"config": {k: getattr(args, k) for k in vars(args)}}
    report["phase_a"] = run_phase("A", yml, root, args, False, args.phase_budget)
    report["phase_b"] = run_phase("B", yml, root, args, True, args.phase_budget)

    csv_path = root / "runs" / "soak" / "results.csv"
    rows = []
    if csv_path.exists():
        with open(csv_path) as f:
            for r in csv.DictReader(f):
                rows.append({k.strip(): v for k, v in r.items() if k})
    losses = [float(r.get("loss", "nan")) for r in rows if r.get("loss")]
    epochs = [int(r["epoch"]) for r in rows if r.get("epoch")]
    steps_per_epoch = max(args.n_train // args.batch, 1)
    # the resume seam: epoch numbering must continue without a gap/restart
    seam_ok = epochs == sorted(epochs) and len(set(epochs)) == len(epochs)
    import math

    report["curve"] = {
        "epochs_recorded": len(rows),
        "total_steps": len(rows) * steps_per_epoch,
        "first_epochs": epochs[:3],
        "last_epochs": epochs[-3:],
        "resume_seam_monotonic": seam_ok,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_min": min(losses) if losses else None,
        "all_finite": all(math.isfinite(v) for v in losses) if losses else False,
        "loss_curve_every5": losses[::5],
        "mAP50_last": rows[-1].get("mAP50") if rows else None,
    }
    report["plots_written"] = (root / "runs" / "soak" / "results.png").exists()

    # EMA vs raw weights val (reference validates EMA; both must work)
    try:
        from tamtr_tpu.config import get_cfg, load_data_yaml
        from tamtr_tpu.engine.model import Engine

        eng = Engine(args.model)
        eng.load(str(root / "runs" / "soak" / "weights" / "best"))
        cfg = get_cfg(eng.cfg, overrides={"data": str(yml), "imgsz": args.imgsz,
                                          "conf": 0.05, "batch": args.batch})
        data = load_data_yaml(str(yml))
        res_ema = eng._validate(eng.model, eng.state, data, cfg, use_ema=True)
        res_raw = eng._validate(eng.model, eng.state, data, cfg, use_ema=False)
    except Exception as e:
        report["ema_vs_raw"] = f"skipped: {type(e).__name__}: {e}"
    else:
        report["ema_vs_raw"] = {
            "ema_mAP50": round(float(res_ema["mAP50"]), 4),
            "raw_mAP50": round(float(res_raw["mAP50"]), 4),
        }

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report["curve"], indent=1))
    ok = (
        report["phase_a"]["saw_preemption_msg"]
        and report["phase_b"]["done"]
        and report["curve"]["all_finite"]
        and report["curve"]["resume_seam_monotonic"]
        and report["curve"]["total_steps"] >= 2000
    )
    print("SOAK " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Engine: orchestrates train/val/predict for the TAMTR facade.

The reference splits this across `engine/{model,trainer,validator,predictor}.py`
plus the rtdetrworld task overrides; here one Engine wires the TPU-native
pieces: data loaders (host), jit train/eval steps (device), metrics (host),
orbax checkpoints, and the precomputed text-embedding table.
"""

from __future__ import annotations

import csv
import functools
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from tamtr_tpu.utils.jax_setup import setup_jax

setup_jax()
import numpy as np

from tamtr_tpu.config import Config, get_cfg, load_data_yaml
from tamtr_tpu.data.dataset import AugConfig, DetectionDataset, build_loader
from tamtr_tpu.data.text import class_text_embeddings
from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.ops.nms import postprocess_predictions
from tamtr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    train_state_shardings,
)
from tamtr_tpu.train.trainer import TrainConfig, create_train_state, make_train_step
from tamtr_tpu.utils.log import LOGGER
from tamtr_tpu.utils.metrics import DetMetrics, match_predictions


def _rasterize_poly(poly_px, shape_hw, scale):
    """Fill one pixel-space polygon into a (H, W) float mask."""
    import cv2

    m = np.zeros(shape_hw, np.float32)
    cv2.fillPoly(m, [(np.asarray(poly_px) * scale).astype(np.int32)], 1.0)
    return m


class EarlyStopping:
    """Stop after `patience` epochs without fitness improvement
    (reference `utils/torch_utils.py:527`); patience<=0 disables."""

    def __init__(self, patience: int = 0):
        self.patience = patience or float("inf")
        self.best_fitness = 0.0
        self.best_epoch = 0

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_fitness = fitness
            self.best_epoch = epoch
        return (epoch - self.best_epoch) >= self.patience


class Engine:
    def __init__(self, model_cfg: str = "tamtr.yaml") -> None:
        from tamtr_tpu.utils.callbacks import Callbacks

        self.model_cfg = model_cfg
        self.model: Optional[TAMTRModel] = None
        self.state = None
        self.names: List[str] = []
        self.txt_feats: Optional[np.ndarray] = None
        self.cfg: Optional[Config] = None
        self.callbacks = Callbacks()

    # ------------------------------------------------------------------ train
    def train(self, **overrides: Any) -> Dict[str, float]:
        cfg = get_cfg(overrides=overrides)
        self.cfg = cfg
        assert cfg.data, "train requires data=..."
        # graceful-preemption save (SURVEY §5.3): SIGTERM/SIGINT set a flag,
        # the epoch loop checkpoints `last` and exits cleanly so resume=True
        # continues from the interrupted epoch. Registered before the first
        # (minutes-long) compile so preemption during compile also lands here.
        import signal

        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True
            LOGGER.warning(f"signal {signum}: will checkpoint and stop at the next epoch boundary")

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread (tests)
                pass
        self._preempted = preempted
        if TAMTRModel.from_yaml(self.model_cfg).head_type == "Classify":
            try:
                return self._train_classify(cfg)
            finally:
                for sig, h in old_handlers.items():
                    try:
                        signal.signal(sig, h)
                    except ValueError:
                        pass
        data = load_data_yaml(cfg.data)
        nc = data["nc"]
        self.names = data["names"]
        self.txt_feats = class_text_embeddings(self.names, npz_path=cfg.text_embeddings)
        from tamtr_tpu.utils.checks import check_imgsz

        cfg.imgsz = check_imgsz(cfg.imgsz, stride=32)

        if cfg.batch == -1:
            # reference `autobatch` semantics (batch=-1 => fit to memory);
            # exact via XLA compile-time memory analysis of the REAL jitted
            # train step (fwd+bwd+optimizer, remat as configured) — probing
            # only the eval forward under-estimates train peak several-fold
            from tamtr_tpu.utils.autobatch import autobatch_train

            probe = TAMTRModel.from_yaml(
                self.model_cfg, nc=nc, max_gt=cfg.max_gt,
                scan_chunk=cfg.scan_chunk, remat=cfg.remat,
                remat_min_elems=cfg.remat_min_elems,
            )
            probe_tc = TrainConfig(batch_size=4, nbs=cfg.nbs)
            cfg.batch = autobatch_train(
                probe,
                self._loss_callable_for(probe, cfg, nc),
                probe_tc, nc, cfg.imgsz, cfg.max_gt, default=4,
            )
        n_avail = len(jax.devices())
        zero = int(cfg.fsdp or 1) > 1  # fsdp>1: ZeRO-1 over the data axis
        sp = max(int(cfg.sp or 1), 1)  # sp>1: 2-D (data, sp) mesh
        candidates = [
            d for d in range(1, n_avail + 1)
            if d % sp == 0 and cfg.batch % (d // sp) == 0
        ]
        if cfg.n_devices:
            n_dev = cfg.n_devices
        elif candidates:
            n_dev = max(candidates)
        else:
            raise ValueError(
                f"no device count in 1..{n_avail} divides batch {cfg.batch} "
                f"(with sp={sp}); set batch to a multiple of the data-parallel "
                f"device count or pass n_devices="
            )
        mesh = make_mesh(n_dev, sp=sp)
        n_data = n_dev // sp
        if cfg.batch % n_data:
            raise ValueError(
                f"batch {cfg.batch} must divide over {n_data} data-parallel devices"
            )

        aug = AugConfig(
            mosaic=cfg.mosaic, mixup=cfg.mixup, copy_paste=cfg.copy_paste,
            degrees=cfg.degrees,
            translate=cfg.translate, scale=cfg.scale, shear=cfg.shear,
            perspective=cfg.perspective, hsv_h=cfg.hsv_h, hsv_s=cfg.hsv_s,
            hsv_v=cfg.hsv_v, fliplr=cfg.fliplr, flipud=cfg.flipud,
        )
        probe_model = TAMTRModel.from_yaml(self.model_cfg, nc=nc)
        model_head = probe_model.head_type
        task = {"Segment": "segment", "Pose": "pose"}.get(model_head, "detect")
        # RandomLoadText (reference `rtdetrworld/val.py:38-40`): per-image
        # pos/neg text sampling + class-id remap for text-conditioned heads
        train_ds = DetectionDataset(
            data["train"], imgsz=cfg.imgsz, augment=True, aug=aug, seed=cfg.seed,
            task=task,
            class_texts=[str(n).split("/") for n in self.names],
            random_text=probe_model.uses_text,
            cache=cfg.cache,
            classes=cfg.classes, single_cls=cfg.single_cls,
        )
        loader = build_loader(
            train_ds, cfg.batch, max_gt=cfg.max_gt, seed=cfg.seed, workers=cfg.workers,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        steps_per_epoch = len(loader)

        model = TAMTRModel.from_yaml(
            self.model_cfg, nc=nc, max_gt=cfg.max_gt, scan_chunk=cfg.scan_chunk,
            dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32, remat=cfg.remat,
            remat_min_elems=cfg.remat_min_elems,
        )
        self.model = model
        tc = TrainConfig(
            lr0=cfg.lr0, lrf=cfg.lrf, momentum=cfg.momentum,
            weight_decay=cfg.weight_decay, warmup_iters=int(cfg.warmup_epochs),
            warmup_bias_lr=cfg.warmup_bias_lr, epochs=cfg.epochs,
            warmup_momentum=cfg.warmup_momentum,
            batch_size=cfg.batch, nbs=cfg.nbs, match_method=cfg.match_method,
        )
        state, tx = create_train_state(
            model, jax.random.PRNGKey(cfg.seed), tc,
            (cfg.batch, cfg.imgsz, cfg.imgsz, 3), nc,
            steps_per_epoch=steps_per_epoch, max_gt=cfg.max_gt,
        )
        step_fn = make_train_step(
            model, tx, None, tc,
            loss_callable=self._loss_callable_for(model, cfg, nc), mesh=mesh,
            zero=zero,
        )
        if sp > 1:
            # route SS2D scans sequence-parallel over mesh['sp'] when the
            # step traces (trace-time context; stays active for this train)
            from tamtr_tpu.nn.ssm import sequence_parallel

            self._sp_ctx = sequence_parallel(mesh)
            self._sp_ctx.__enter__()

        repl, bsh = replicated(mesh), batch_sharding(mesh)
        ssh = train_state_shardings(mesh, state, zero=zero)  # ZeRO flat vectors
        state = jax.device_put(state, ssh)
        jit_step = jax.jit(
            step_fn, in_shardings=(ssh, bsh, None), out_shardings=(ssh, repl),
            donate_argnums=(0,),
        )

        run_dir = Path(cfg.project or "runs/detect") / (cfg.name or "train")
        if not cfg.resume and not cfg.exist_ok:
            from tamtr_tpu.utils.files import increment_path

            run_dir = increment_path(run_dir)  # reference get_save_dir behavior
        run_dir.mkdir(parents=True, exist_ok=True)
        self._last_run_dir = run_dir
        if cfg.plots:
            from tamtr_tpu.utils.callbacks import add_tensorboard

            add_tensorboard(self.callbacks, str(run_dir / "tb"))
        # SETTINGS-gated logger integrations (reference attaches every
        # installed+enabled callback suite, `utils/callbacks/base.py:144-218`);
        # tensorboard is handled above (plots-gated), so mask it here
        from tamtr_tpu.utils.callbacks import attach_integrations
        from tamtr_tpu.utils.settings import SETTINGS

        attach_integrations(
            self.callbacks, run_dir, settings={**SETTINGS, "tensorboard": False}
        )
        csv_path = run_dir / "results.csv"
        start_epoch = 0
        if cfg.resume and (run_dir / "weights" / "last").exists():
            from tamtr_tpu.engine.checkpoint import load_checkpoint

            state, meta = load_checkpoint(run_dir / "weights" / "last", state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            LOGGER.info(f"resumed from epoch {start_epoch}")
        stopper = EarlyStopping(cfg.patience)
        txt = np.tile(self.txt_feats[None], (cfg.batch, 1, 1)).astype(np.float32)
        from tamtr_tpu.data.text import TextEmbedder

        text_embedder = TextEmbedder(npz_path=cfg.text_embeddings)
        best_fitness = 0.0
        rng = jax.random.PRNGKey(cfg.seed + 1)

        LOGGER.info(
            f"training {self.model_cfg}: nc={nc} imgsz={cfg.imgsz} batch={cfg.batch} "
            f"devices={n_dev} steps/epoch={steps_per_epoch}"
        )
        self.callbacks.fire("on_train_start", self)
        metrics_out: Dict[str, float] = {}
        for epoch in range(start_epoch, cfg.epochs):
            self._cur_epoch = epoch  # val callbacks key their logs by this
            self.callbacks.fire("on_train_epoch_start", self, epoch)
            if cfg.close_mosaic and epoch == cfg.epochs - cfg.close_mosaic:
                train_ds.close_mosaic()
            loader.set_epoch(epoch)
            t0 = time.time()
            n_steps = 0
            for batch in loader:
                host_batch = {
                    # uint8 straight to device (the step normalizes on-chip:
                    # 4x less host CPU + host->device bytes than f32/255 here)
                    "img": batch["img"],
                    # per-image sampled texts (RandomLoadText) when present,
                    # else the static class table
                    "txt_feats": (
                        text_embedder(batch["texts"]) if "texts" in batch else txt
                    ),
                    "cls": batch["cls"],
                    "bboxes": batch["bboxes"],
                    "mask": batch["mask"],
                }
                for extra in ("masks", "keypoints"):
                    if extra in batch:
                        host_batch[extra] = batch[extra]
                if cfg.plots and epoch == start_epoch and n_steps < 3 and jax.process_index() == 0:
                    try:
                        from tamtr_tpu.utils.plotting import plot_images

                        bi = np.repeat(np.arange(len(batch["img"])), batch["cls"].shape[1])
                        valid = batch["mask"].reshape(-1)
                        plot_images(
                            host_batch["img"], bi[valid],
                            batch["cls"].reshape(-1)[valid],
                            batch["bboxes"].reshape(-1, 4)[valid],
                            names=self.names,
                            save_path=run_dir / f"train_batch{n_steps}.jpg",
                        )
                    except Exception:
                        pass
                dev_batch = shard_batch(host_batch, mesh)
                state, m = jit_step(state, dev_batch, rng)
                n_steps += 1
                self.callbacks.fire("on_train_batch_end", self, n_steps)
            dt = time.time() - t0
            ips = n_steps * cfg.batch / max(dt, 1e-9)
            comp = {k: float(v) for k, v in m.items() if k not in ("loss", "grad_norm")}
            comp_str = " ".join(f"{k}={v:.3f}" for k, v in comp.items())
            LOGGER.info(
                f"epoch {epoch + 1}/{cfg.epochs}: loss={float(m['loss']):.3f} "
                f"{comp_str} {ips:.1f} img/s"
            )
            # validation + checkpointing (host 0)
            row = {"epoch": epoch + 1, "loss": float(m["loss"]), **comp, "img_per_sec": ips}
            run_val = (epoch + 1) % max(cfg.val_interval, 1) == 0 or epoch == cfg.epochs - 1
            fitness = None
            if cfg.val and data.get("val") and run_val:
                self.state = state
                metrics_out = self._validate(
                    model, state, data, cfg, use_ema=True
                )
                row.update(metrics_out)
                fitness = metrics_out.get("fitness", 0.0)
            # save `last` every epoch (reference saves regardless of val);
            # `best` only when a fitness was measured this epoch
            if jax.process_index() == 0 and cfg.save:
                from tamtr_tpu.engine.checkpoint import save_checkpoint

                meta = {
                    "epoch": epoch,
                    "nc": nc,
                    "names": self.names,
                    "model_cfg": str(self.model_cfg),
                    "imgsz": cfg.imgsz,
                    "max_gt": cfg.max_gt,
                }
                run_save = (
                    (epoch + 1) % max(cfg.save_interval, 1) == 0
                    or epoch == cfg.epochs - 1
                )
                if run_save:
                    save_checkpoint(run_dir / "weights" / "last", state, meta)
                is_best = fitness is not None and fitness >= best_fitness
                if is_best:
                    best_fitness = fitness
                    save_checkpoint(run_dir / "weights" / "best", state, meta)
                if run_save or is_best:
                    self.callbacks.fire(
                        "on_model_save", self, epoch, run_dir / "weights" / "last", is_best
                    )
            if fitness is not None and stopper(epoch, fitness):
                LOGGER.info(f"early stopping at epoch {epoch + 1}")
                self._append_csv(csv_path, row)
                break
            self._append_csv(csv_path, row)
            self.callbacks.fire("on_fit_epoch_end", self, epoch, row)
            if preempted["flag"]:
                if jax.process_index() == 0 and cfg.save:
                    from tamtr_tpu.engine.checkpoint import save_checkpoint

                    save_checkpoint(
                        run_dir / "weights" / "last", state,
                        {"epoch": epoch, "nc": nc, "names": self.names,
                         "model_cfg": str(self.model_cfg), "imgsz": cfg.imgsz,
                         "max_gt": cfg.max_gt},
                    )
                    LOGGER.info("preemption checkpoint saved; resume with resume=True")
                break
        for sig, h in old_handlers.items():
            try:
                signal.signal(sig, h)
            except ValueError:
                pass
        if getattr(self, "_sp_ctx", None) is not None:
            self._sp_ctx.__exit__(None, None, None)
            self._sp_ctx = None
        self.state = state
        if cfg.plots and jax.process_index() == 0:
            try:
                from tamtr_tpu.utils.plotting import plot_results

                plot_results(csv_path)
            except Exception:
                pass
        self.callbacks.fire("on_train_end", self, metrics_out, run_dir)
        self.callbacks.fire("teardown", self)
        return metrics_out

    @staticmethod
    def _loss_callable_for(model, cfg: Config, nc: int):
        """Task-appropriate loss callable (outputs, targets) -> (loss, items)."""
        if model.head_type == "Detect":
            from tamtr_tpu.losses.v8_loss import V8LossConfig, v8_detection_loss

            v8cfg = V8LossConfig(nc=nc, box=cfg.box, cls=cfg.cls, dfl=cfg.dfl, imgsz=cfg.imgsz)
            return lambda o, t: v8_detection_loss(o, t, v8cfg)
        if model.head_type == "Segment":
            from tamtr_tpu.losses.v8_seg_loss import V8SegLossConfig, v8_segmentation_loss

            scfg = V8SegLossConfig(nc=nc, box=cfg.box, cls=cfg.cls, dfl=cfg.dfl, imgsz=cfg.imgsz)
            return lambda o, t: v8_segmentation_loss(o, t, scfg)
        if model.head_type == "Pose":
            from tamtr_tpu.losses.v8_pose_loss import V8PoseLossConfig, v8_pose_loss

            pcfg = V8PoseLossConfig(
                nc=nc, box=cfg.box, cls=cfg.cls, dfl=cfg.dfl, imgsz=cfg.imgsz,
                pose=cfg.pose, kobj=cfg.kobj,
            )
            return lambda o, t: v8_pose_loss(o, t, pcfg)
        loss_cfg = DETRLossConfig(nc=nc, match_method=cfg.match_method)
        return lambda o, t: rtdetr_detection_loss(o, t, loss_cfg)

    # -------------------------------------------------------------- classify
    def _train_classify(self, cfg: Config) -> Dict[str, float]:
        """Classification training (reference `models/yolo/classify/train.py`):
        ImageFolder data dir (train/ + val|test/), cross-entropy loss,
        top-1/top-5 validation, fitness = top-1."""
        import optax

        from tamtr_tpu.data.dataset import ClassificationDataset, ClassificationLoader

        root = Path(cfg.data)
        imgsz = cfg.imgsz if cfg.imgsz != 640 else 224  # classify default
        train_ds = ClassificationDataset(root / "train", imgsz=imgsz, augment=True, seed=cfg.seed)
        val_dir = next((root / s for s in ("val", "test") if (root / s).is_dir()), None)
        nc = len(train_ds.names)
        self.names = train_ds.names
        self.txt_feats = np.zeros((1, 512), np.float32)

        zero = int(cfg.fsdp or 1) > 1  # fsdp>1: ZeRO-1 over the data axis
        candidates = [
            d for d in range(1, len(jax.devices()) + 1) if cfg.batch % d == 0
        ]
        if cfg.n_devices:
            n_dev = cfg.n_devices
        elif candidates:
            n_dev = max(candidates)
        else:
            raise ValueError(
                f"no device count in 1..{len(jax.devices())} divides batch "
                f"{cfg.batch}; set batch to a multiple of the device count "
                f"or pass n_devices="
            )
        mesh = make_mesh(n_dev)
        loader = ClassificationLoader(
            train_ds, cfg.batch, seed=cfg.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        steps_per_epoch = max(len(loader), 1)
        model = TAMTRModel.from_yaml(self.model_cfg, nc=nc, max_gt=1)
        self.model = model
        tc = TrainConfig(
            lr0=cfg.lr0, lrf=cfg.lrf, momentum=cfg.momentum,
            weight_decay=cfg.weight_decay, warmup_iters=int(cfg.warmup_epochs),
            warmup_bias_lr=cfg.warmup_bias_lr, epochs=cfg.epochs,
            warmup_momentum=cfg.warmup_momentum,
            batch_size=cfg.batch, nbs=cfg.nbs,
        )
        state, tx = create_train_state(
            model, jax.random.PRNGKey(cfg.seed), tc,
            (cfg.batch, imgsz, imgsz, 3), nc, n_text=1,
            steps_per_epoch=steps_per_epoch, max_gt=1,
        )

        def ce_loss(outputs, targets):
            labels = targets["cls"][:, 0]
            loss = optax.softmax_cross_entropy_with_integer_labels(
                outputs["logits"], labels
            ).mean()
            acc = (outputs["logits"].argmax(-1) == labels).mean()
            return loss, {"cls": loss, "top1": acc}

        step_fn = make_train_step(
            model, tx, None, tc, loss_callable=ce_loss, mesh=mesh, zero=zero
        )
        repl, bsh = replicated(mesh), batch_sharding(mesh)
        ssh = train_state_shardings(mesh, state, zero=zero)
        state = jax.device_put(state, ssh)
        jit_step = jax.jit(
            step_fn, in_shardings=(ssh, bsh, None), out_shardings=(ssh, repl),
            donate_argnums=(0,),
        )
        run_dir = Path(cfg.project or "runs/classify") / (cfg.name or "train")
        run_dir.mkdir(parents=True, exist_ok=True)
        csv_path = run_dir / "results.csv"
        rng = jax.random.PRNGKey(cfg.seed + 1)
        stopper = EarlyStopping(cfg.patience)
        txt = np.zeros((cfg.batch, 1, 512), np.float32)
        best_fitness = 0.0
        metrics_out: Dict[str, float] = {}
        LOGGER.info(f"classify train: nc={nc} imgsz={imgsz} batch={cfg.batch}")
        self.callbacks.fire("on_train_start", self)
        for epoch in range(cfg.epochs):
            self._cur_epoch = epoch
            loader.set_epoch(epoch)
            t0 = time.time()
            n_steps = 0
            m = {"loss": jnp.zeros(())}
            for batch in loader:
                host_batch = {
                    "img": batch["img"],
                    "txt_feats": txt,
                    "cls": batch["cls"],
                    "bboxes": np.zeros((cfg.batch, 1, 4), np.float32),
                    "mask": np.zeros((cfg.batch, 1), bool),
                }
                state, m = jit_step(state, shard_batch(host_batch, mesh), rng)
                n_steps += 1
            ips = n_steps * cfg.batch / max(time.time() - t0, 1e-9)
            row = {"epoch": epoch + 1, "loss": float(m["loss"]), "img_per_sec": ips}
            LOGGER.info(f"epoch {epoch + 1}/{cfg.epochs}: loss={float(m['loss']):.3f} {ips:.1f} img/s")
            if cfg.val and val_dir is not None:
                self.state = state
                metrics_out = self._validate_classify(model, state, val_dir, cfg, imgsz)
                row.update(metrics_out)
                fitness = metrics_out.get("top1", 0.0)
                if jax.process_index() == 0 and cfg.save:
                    from tamtr_tpu.engine.checkpoint import save_checkpoint

                    meta = {"epoch": epoch, "nc": nc, "names": self.names,
                            "model_cfg": str(self.model_cfg), "imgsz": imgsz, "max_gt": 1}
                    save_checkpoint(run_dir / "weights" / "last", state, meta)
                    if fitness >= best_fitness:
                        best_fitness = fitness
                        save_checkpoint(run_dir / "weights" / "best", state, meta)
                if stopper(epoch, fitness):
                    break
            self._append_csv(csv_path, row)
            self.callbacks.fire("on_fit_epoch_end", self, epoch, row)
            # graceful preemption (same contract as the detect loop): save
            # `last` and stop at the epoch boundary
            if getattr(self, "_preempted", {}).get("flag"):
                if jax.process_index() == 0 and cfg.save:
                    from tamtr_tpu.engine.checkpoint import save_checkpoint

                    save_checkpoint(
                        run_dir / "weights" / "last", state,
                        {"epoch": epoch, "nc": nc, "names": self.names,
                         "model_cfg": str(self.model_cfg), "imgsz": imgsz,
                         "max_gt": 1},
                    )
                    LOGGER.info("preemption checkpoint saved; resume with resume=True")
                break
        self.state = state
        self.callbacks.fire("on_train_end", self)
        return metrics_out

    def _validate_classify(self, model, state, val_dir, cfg: Config, imgsz: int) -> Dict[str, float]:
        """Top-1 / top-5 accuracy (reference `classify/val.py`)."""
        from tamtr_tpu.data.dataset import ClassificationDataset

        ds = ClassificationDataset(val_dir, imgsz=imgsz, augment=False)
        variables = self._variables_from(state)
        bs = max(cfg.batch, 1)

        @jax.jit
        def eval_step(v, img, txt):
            return model.apply(v, img, txt, None, False)["logits"]

        txt = jnp.zeros((bs, 1, 512), jnp.float32)
        top1 = top5 = total = 0
        for s in range(0, len(ds), bs):
            idxs = list(range(s, min(s + bs, len(ds))))
            imgs, labels = zip(*(ds.get(i) for i in idxs))
            imgs = list(imgs)
            while len(imgs) < bs:
                imgs.append(np.zeros_like(imgs[0]))
            logits = np.asarray(eval_step(variables, jnp.asarray(np.stack(imgs)), txt))
            k = min(5, logits.shape[-1])
            for j, lab in enumerate(labels):
                order = np.argsort(-logits[j])
                top1 += int(order[0] == lab)
                top5 += int(lab in order[:k])
                total += 1
        res = {"top1": top1 / max(total, 1), "top5": top5 / max(total, 1)}
        LOGGER.info(f"classify val: top1={res['top1']:.4f} top5={res['top5']:.4f} ({total} imgs)")
        return res

    def _predict_classify(self, source: Any, cfg: Config) -> List[Dict[str, Any]]:
        """Classification predict: per-image class probabilities + top-5."""
        from tamtr_tpu.data.loaders import load_inference_source

        imgsz = cfg.imgsz if cfg.imgsz != 640 else 224
        variables = self._variables_from(self.state)
        model = self.model

        @jax.jit
        def eval_step(v, img, txt):
            return model.apply(v, img, txt, None, False)["pred"]

        txt = jnp.zeros((1, 1, 512), jnp.float32)
        out = []
        import cv2

        for name, frame in load_inference_source(source):
            h, w = frame.shape[:2]
            r = imgsz / min(h, w)
            img = cv2.resize(frame, (max(imgsz, round(w * r)), max(imgsz, round(h * r))))
            hh, ww = img.shape[:2]
            y0, x0 = (hh - imgsz) // 2, (ww - imgsz) // 2
            img = img[y0 : y0 + imgsz, x0 : x0 + imgsz][..., ::-1].astype(np.float32) / 255.0
            probs = np.asarray(eval_step(variables, jnp.asarray(img[None]), txt))[0]
            top5 = np.argsort(-probs)[:5]
            out.append(
                {
                    "path": name,
                    "probs": probs,
                    "top5": top5,
                    "top5_conf": probs[top5],
                    "names": [self.names[i] if i < len(self.names) else str(i) for i in top5],
                }
            )
        return out

    def export(self, fmt: str = "orbax", out_dir: str = "runs/export", imgsz: int = 640,
               half: bool = False, int8: bool = False, calib=None):
        """Export trained (EMA) weights (reference `Exporter`; half/int8 are
        the reference format-matrix quantization flags)."""
        from tamtr_tpu.engine.exporter import export_model

        assert self.model is not None and self.state is not None
        variables = self._variables_from(self.state)
        return export_model(
            self.model, variables, imgsz, len(self.names) or self.model.nc, out_dir, fmt,
            half=half, int8=int8, calib=calib,
        )

    # -------------------------------------------------------------------- val
    def val(self, **overrides: Any) -> Dict[str, float]:
        cfg = get_cfg(self.cfg, overrides=overrides)
        assert cfg.data, "val requires data=..."
        if self.model is not None and self.model.head_type == "Classify":
            root = Path(cfg.data)
            val_dir = next(
                (root / s for s in ("val", "test") if (root / s).is_dir()), root
            )
            imgsz = cfg.imgsz if cfg.imgsz != 640 else 224
            return self._validate_classify(self.model, self.state, val_dir, cfg, imgsz)
        data = load_data_yaml(cfg.data)
        if self.model is None:
            self.names = data["names"]
            self.txt_feats = class_text_embeddings(self.names, npz_path=cfg.text_embeddings)
            self.model = TAMTRModel.from_yaml(
                self.model_cfg, nc=data["nc"], max_gt=cfg.max_gt, scan_chunk=cfg.scan_chunk
            )
            if self.state is None:
                raise RuntimeError("no weights loaded; train first or load a checkpoint")
        return self._validate(self.model, self.state, data, cfg, use_ema=True)

    @staticmethod
    def _variables_from(state, use_ema: bool = True) -> Dict[str, Any]:
        """Model variables from a train/inference state; unravels flat
        parameter vectors (TrainState stores params flat, see trainer.py)."""
        p = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        if p is None and use_ema:  # inference states without EMA copy
            p, bs = state.params, state.batch_stats
        unr = getattr(state, "unravel", None)
        if unr is not None and hasattr(p, "ndim") and p.ndim == 1:
            p = unr(p)
        return {"params": p, "batch_stats": bs if bs is not None else {}}

    def _resolve_eval_model(self, model, variables, cfg):
        """Apply eval-time model transforms: RepConvN fusion (cfg.fuse) and
        bf16 compute (cfg.half — the reference's `half` flag; BN stats, the
        scan, and box decode stay fp32 via the model's internal casts)."""
        if cfg.fuse:
            model, variables = self._deploy_model_and_vars(model, variables)
        if cfg.half and model.dtype != jnp.bfloat16:
            key = ("half", id(model))
            cache = getattr(self, "_half_cache", None)
            if cache is None or cache[0] != key:
                self._half_cache = (key, model.clone(dtype=jnp.bfloat16))
            model = self._half_cache[1]
        return model, variables

    def _deploy_model_and_vars(self, model, variables):
        """RepConvN-fused (deploy) twin of `model` + transformed variables.

        Cached per (state, cfg) so the jitted eval step (keyed on id(model))
        is not retraced every call.
        """
        key = (id(self.state), self.model_cfg, id(model))
        cached = getattr(self, "_fused_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1], cached[2]
        from tamtr_tpu.nn.fuse import fuse_repconv_variables

        deploy = model.clone(deploy=True)
        fused = fuse_repconv_variables(jax.device_get(variables))
        self._fused_cache = (key, deploy, fused)
        return deploy, fused

    def _get_eval_step(self, model, conf, iou, max_det, imgsz, sharded=False,
                       legacy_val_mask=False, classes=None, single_cls=False):
        """Jitted eval step, cached per (conf, iou, max_det, imgsz) — a fresh
        closure per val call would retrace every epoch.

        sharded=True runs data-parallel over the device mesh (params
        replicated, batch axis over ICI) — the validator pads its batch to a
        device-count multiple; predict paths (batch 1) stay unsharded.

        legacy_val_mask replicates the reference val protocol's
        mask-after-sort conf-filter quirk (see ops/nms.py) — the validator
        sets it so mAP numbers are protocol-identical; predict stays clean."""
        classes = tuple(classes) if classes is not None else None
        key = (id(model), conf, iou, max_det, imgsz, sharded, legacy_val_mask,
               classes, single_cls)
        cache = getattr(self, "_eval_steps", None)
        if cache is None:
            cache = self._eval_steps = {}
        if key not in cache:
            pixel_head = model.head_type in ("Detect", "Segment", "Pose")
            # data-parallel val over the device mesh: params replicated,
            # batch axis sharded over ICI (no-op on a single chip); the
            # caller pads batches to a multiple of the device count
            n_dev = jax.device_count()
            jit_kw = {}
            if sharded and n_dev > 1:
                from tamtr_tpu.parallel.mesh import (
                    batch_sharding, make_mesh, replicated,
                )

                mesh = make_mesh(n_dev)
                bsh = batch_sharding(mesh)
                jit_kw = dict(
                    in_shardings=(replicated(mesh), bsh, bsh), out_shardings=bsh
                )

            @functools.partial(jax.jit, **jit_kw)
            def eval_step(variables, img, txt):
                full = model.apply(variables, img, txt, None, False)
                out = full["pred"]
                if pixel_head:
                    # imgsz may be (h, w) for rect val batches
                    hh, ww = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
                    scale = jnp.array(
                        [1.0 / ww, 1.0 / hh, 1.0 / ww, 1.0 / hh]
                        + [1.0] * (out.shape[-1] - 4)
                    )
                    out = out * scale
                boxes, scores, labels, valid, kept = postprocess_predictions(
                    out, conf, iou, max_det, legacy_val_mask=legacy_val_mask,
                    classes=classes, single_cls=single_cls,
                )
                res = (boxes, scores, labels, valid)
                if model.head_type == "Segment":
                    coefs = jnp.take_along_axis(full["mask_coefs"], kept[..., None], axis=1)
                    masks = jax.nn.sigmoid(
                        jnp.einsum("bkn,bhwn->bkhw", coefs.astype(jnp.float32),
                                   full["protos"].astype(jnp.float32))
                    )
                    res = res + (masks,)
                elif model.head_type == "Pose":
                    kpts = jnp.take_along_axis(
                        full["keypoints"], kept[:, :, None, None], axis=1
                    )  # (B, max_det, nk, 3) in imgsz pixels
                    res = res + (kpts,)
                return res

            cache[key] = eval_step
        return cache[key]

    def _validate(self, model, state, data, cfg: Config, use_ema: bool = True) -> Dict[str, float]:
        self.callbacks.fire("on_val_start", self)
        split_dir = data.get(cfg.split) or data.get("val")
        task = {"Segment": "segment", "Pose": "pose"}.get(model.head_type, "detect")
        # classes/single_cls filter GT too (reference BaseDataset.update_labels,
        # base.py:125-141) — predictions are filtered in postprocess; without
        # the GT side, val mAP collapses (ADVICE r4 medium#1)
        ds = DetectionDataset(
            split_dir, imgsz=cfg.imgsz, augment=False, task=task,
            classes=cfg.classes, single_cls=cfg.single_cls,
        )
        variables = self._variables_from(state, use_ema=use_ema)
        model, variables = self._resolve_eval_model(model, variables, cfg)
        conf = cfg.conf if cfg.conf is not None else 0.4

        n_dev = jax.device_count()
        # rect val (reference `base.py:221-244` + rect flag): aspect-ratio
        # binned letterboxed batches — YOLO-family (pixel heads) only; the
        # TAM-TR protocol stretches square (`rtdetrworld/val.py` rect=False)
        rect = bool(cfg.rect) and model.head_type == "Detect" and n_dev == 1
        eval_step = self._get_eval_step(
            model, conf, cfg.iou, cfg.max_det, cfg.imgsz, sharded=n_dev > 1,
            legacy_val_mask=True,  # reference val protocol quirk (ops/nms.py)
            classes=cfg.classes, single_cls=cfg.single_cls,
        )

        metrics = DetMetrics()
        mask_metrics = DetMetrics() if task == "segment" else None
        pose_metrics = DetMetrics() if task == "pose" else None
        confusion = None
        if cfg.plots:
            from tamtr_tpu.utils.metrics import ConfusionMatrix

            confusion = ConfusionMatrix(len(self.names) or model.nc, conf=conf)
        bs = max(cfg.batch, 1)
        if n_dev > 1:  # sharded eval needs the batch axis divisible
            bs = ((bs + n_dev - 1) // n_dev) * n_dev
        txt_all = jnp.asarray(self.txt_feats[None])
        n = len(ds)
        coco_records = [] if cfg.save_json else None
        t0 = time.time()

        # prefetch val batches with a thread pool (IO/resize overlap compute)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=max(cfg.workers, 1))
        if rect:
            ds.set_rectangle(bs)  # reorders by aspect ratio; chunks align
        batches = [list(range(s, min(s + bs, n))) for s in range(0, n, bs)]

        def fetch(idxs):
            return [ds.get_val(i) for i in idxs]

        futures = {bi: pool.submit(fetch, batches[bi]) for bi in range(min(4, len(batches)))}
        for bi, idxs in enumerate(batches):
            nxt = bi + 4
            if nxt < len(batches):
                futures[nxt] = pool.submit(fetch, batches[nxt])
            items = futures.pop(bi).result()
            raws = [it[1] for it in items]
            shapes_hw = [it[2] for it in items]
            lbs = [it[3] for it in items]
            imgs = [it[0] for it in items]
            while len(imgs) < bs:  # pad to a single compiled shape
                imgs.append(np.zeros_like(imgs[0]))
            img = jnp.asarray(np.stack(imgs))
            txt = jnp.broadcast_to(txt_all, (bs,) + txt_all.shape[1:])
            step = eval_step
            if rect:
                bh, bw = imgs[0].shape[:2]
                step = self._get_eval_step(
                    model, conf, cfg.iou, cfg.max_det, (bh, bw),
                    legacy_val_mask=True,
                    classes=cfg.classes, single_cls=cfg.single_cls,
                )
            boxes, scores, labels, valid, *_extra = jax.device_get(
                step(variables, img, txt)
            )
            for k, i in enumerate(idxs):
                r = raws[k]
                oh, ow = shapes_hw[k]
                sel = valid[k] & (scores[k] > 0)
                if lbs[k] is not None:  # rect: undo letterbox (ratio, pads)
                    ratio, left, top = lbs[k]
                    bh, bw = imgs[k].shape[:2]
                    pb = boxes[k][sel] * np.array([bw, bh, bw, bh], np.float32)
                    pb = (pb - np.array([left, top, left, top], np.float32)) / ratio
                    pb = pb.clip(0, [ow, oh, ow, oh])
                else:
                    pb = boxes[k][sel] * np.array([ow, oh, ow, oh], np.float32)
                pc = labels[k][sel].astype(np.float32)
                ps = scores[k][sel]
                tp = match_predictions(pb, pc, r.boxes, r.cls.astype(np.float32))
                metrics.update(tp, ps, pc, r.cls.astype(np.float32))
                if confusion is not None:
                    confusion.process_batch(pb, ps, pc.astype(np.int64), r.boxes, r.cls)
                if pose_metrics is not None and _extra:
                    from tamtr_tpu.utils.metrics import oks_np

                    from tamtr_tpu.losses.v8_pose_loss import OKS_SIGMA

                    pk = _extra[0][k][sel]  # (n, nk, 3) at imgsz scale
                    # scale to native pixels (stretch)
                    pk = pk.copy()
                    pk[..., 0] *= ow / cfg.imgsz
                    pk[..., 1] *= oh / cfg.imgsz
                    gk = r.keypoints if r.keypoints is not None else np.zeros((0, 17, 3), np.float32)
                    areas = np.clip(
                        (r.boxes[:, 2] - r.boxes[:, 0]) * (r.boxes[:, 3] - r.boxes[:, 1]), 1, None
                    )
                    nk = gk.shape[1] if len(gk) else 17
                    sig = np.asarray(OKS_SIGMA)[:nk] if nk == 17 else np.full(nk, 1.0 / nk)
                    oks = oks_np(gk, pk, areas, sig) if len(gk) and len(pk) else None
                    tp_k = match_predictions(
                        pb, pc, r.boxes, r.cls.astype(np.float32), iou=oks
                    ) if oks is not None else np.zeros((len(pc), 10), bool)
                    pose_metrics.update(tp_k, ps, pc, r.cls.astype(np.float32))
                if mask_metrics is not None and _extra:
                    import cv2

                    from tamtr_tpu.utils.metrics import mask_iou_np

                    pm = (_extra[0][k][sel] > 0.5)
                    hm, wm = pm.shape[-2:] if len(pm) else (2, 2)
                    gm = np.stack([
                        cv2.resize(
                            _rasterize_poly(seg, r.img.shape[:2], 1.0), (wm, hm)
                        ) > 0.5
                        for seg in (r.segments or [])
                    ]) if r.segments else np.zeros((0, hm, wm), bool)
                    miou = mask_iou_np(gm, pm) if len(gm) and len(pm) else None
                    tp_m = match_predictions(
                        pb, pc, r.boxes, r.cls.astype(np.float32),
                        iou=miou if miou is not None else None,
                    ) if miou is not None else np.zeros((len(pc), 10), bool)
                    mask_metrics.update(tp_m, ps, pc, r.cls.astype(np.float32))
                if coco_records is not None:
                    rec = {
                        "image_id": int(Path(ds.im_files[i]).stem)
                        if Path(ds.im_files[i]).stem.isnumeric()
                        else i,
                        "boxes": pb,
                        "scores": ps,
                        "labels": labels[k][sel],
                    }
                    if task == "segment" and _extra:
                        # RLE masks at native resolution (reference
                        # `segment/val.py:195-219` pred_to_json)
                        import cv2

                        pm = _extra[0][k][sel] > 0.5
                        rec["masks"] = np.stack([
                            cv2.resize(
                                m.astype(np.uint8), (ow, oh),
                                interpolation=cv2.INTER_LINEAR,
                            ) > 0.5
                            for m in pm
                        ]) if len(pm) else np.zeros((0, oh, ow), bool)
                    coco_records.append(rec)
        pool.shutdown(wait=False, cancel_futures=True)
        if coco_records is not None:
            from tamtr_tpu.utils.coco import predictions_to_coco

            predictions_to_coco(coco_records, Path(cfg.project or "runs") / "predictions.json")
        res = metrics.compute()
        if mask_metrics is not None:
            mres = mask_metrics.compute()
            res["mask_mAP50"] = mres["mAP50"]
            res["mask_mAP50-95"] = mres["mAP50-95"]
        if pose_metrics is not None:
            pres = pose_metrics.compute()
            res["pose_mAP50"] = pres["mAP50"]
            res["pose_mAP50-95"] = pres["mAP50-95"]
        if confusion is not None:
            out_dir = getattr(self, "_last_run_dir", None) or Path(cfg.project or "runs")
            Path(out_dir).mkdir(parents=True, exist_ok=True)
            confusion.plot(Path(out_dir) / "confusion_matrix.png", names=self.names)
        res["images_per_sec"] = n / max(time.time() - t0, 1e-9)
        LOGGER.info(
            f"val: mAP50={res['mAP50']:.4f} mAP50-95={res['mAP50-95']:.4f} "
            f"P={res['precision']:.4f} R={res['recall']:.4f} ({res['images_per_sec']:.1f} img/s)"
        )
        self.callbacks.fire("on_val_end", self, res)
        return res

    # ---------------------------------------------------------------- predict
    def predict(self, source: Any, **overrides: Any) -> List[Dict[str, np.ndarray]]:
        cfg = get_cfg(self.cfg, overrides=overrides)
        # Python-API predict has NO disk side effects unless asked: the
        # reference sets save=is_cli (engine/model.py:230), and Config.save's
        # True default is the train-checkpoint flag — only an explicit
        # save= override writes annotated output here (ADVICE r4 medium#2)
        cfg.save = bool(overrides.get("save", False))
        import cv2

        assert self.model is not None and self.state is not None, "load/train a model first"
        if self.model.head_type == "Classify":
            return self._predict_classify(source, cfg)
        # video / stream sources run the frame loop (annotated mp4 if save=True)
        from tamtr_tpu.data.loaders import VID_EXTS

        if isinstance(source, int) or (
            isinstance(source, str)
            and (source.isdigit() or Path(source).suffix.lower() in VID_EXTS)
        ):
            return self._predict_frames(source, cfg)
        paths: List[str]
        if isinstance(source, (str, Path)):
            p = Path(source)
            paths = (
                sorted(str(f) for f in p.rglob("*") if f.suffix.lower() in
                       {".jpg", ".jpeg", ".png", ".bmp", ".webp"})
                if p.is_dir() else [str(p)]
            )
        else:
            paths = list(source)
        variables = self._variables_from(self.state)
        pred_model, variables = self._resolve_eval_model(self.model, variables, cfg)
        conf = cfg.conf if cfg.conf is not None else 0.25
        eval_step = self._get_eval_step(
            pred_model, conf, cfg.iou, cfg.max_det, cfg.imgsz,
            classes=cfg.classes, single_cls=cfg.single_cls,
        )

        from tamtr_tpu.engine.results import Results

        txt = jnp.asarray(self.txt_feats[None])
        # TTA (reference `_predict_augment`, `tasks.py:272-307`): scales
        # 1 / 0.83 / 0.67 (snapped to the stride grid) with a horizontal flip
        # on the middle scale; merged detections get a final NMS.
        if cfg.augment:
            passes = [
                (cfg.imgsz, False),
                (max(round(cfg.imgsz * 0.83 / 32) * 32, 32), True),
                (max(round(cfg.imgsz * 0.67 / 32) * 32, 32), False),
            ]
        else:
            passes = [(cfg.imgsz, False)]

        results = []
        for path in paths:
            im0 = cv2.imread(path)
            oh, ow = im0.shape[:2]
            all_b, all_s, all_l = [], [], []
            for sz, flip in passes:
                img = cv2.resize(im0, (sz, sz))[..., ::-1].astype(np.float32) / 255.0
                if flip:
                    img = img[:, ::-1]
                step = self._get_eval_step(
                    pred_model, conf, cfg.iou, cfg.max_det, sz,
                    classes=cfg.classes, single_cls=cfg.single_cls,
                )
                boxes, scores, labels, valid, *extra = jax.device_get(
                    step(variables, jnp.asarray(np.ascontiguousarray(img)[None]), txt)
                )
                sel = valid[0] & (scores[0] > 0)
                b = boxes[0][sel]
                det_masks = extra[0][0][sel] if extra else None
                if flip:  # un-flip normalized xyxy
                    b = np.stack([1 - b[:, 2], b[:, 1], 1 - b[:, 0], b[:, 3]], -1)
                all_b.append(b)
                all_s.append(scores[0][sel])
                all_l.append(labels[0][sel])
            b = np.concatenate(all_b)
            s = np.concatenate(all_s)
            l = np.concatenate(all_l)
            if len(passes) > 1 and len(b):
                from tamtr_tpu.ops.nms import multiclass_nms

                pad = cfg.max_det * len(passes) - len(b)
                bp = np.pad(b, ((0, pad), (0, 0)))
                sp = np.pad(s, (0, pad))
                lp = np.pad(l, (0, pad))
                keep, valid_k = jax.device_get(
                    multiclass_nms(jnp.asarray(bp), jnp.asarray(sp), jnp.asarray(lp),
                                   cfg.iou, cfg.max_det)
                )
                idx = keep[valid_k]
                b, s, l = b[idx[idx < len(b)]], s[idx[idx < len(s)]], l[idx[idx < len(l)]]
            r = Results(
                path,
                b * np.array([ow, oh, ow, oh], np.float32),
                s,
                l,
                self.names,
                orig_shape=(oh, ow),
                masks=det_masks if not cfg.augment else None,
            )
            if cfg.save:  # annotated image output (reference save=True)
                out_dir = Path(cfg.project or "runs/detect") / (cfg.name or "predict")
                r.save(out_dir / Path(path).name)
            results.append(r)
        return results

    def _predict_frames(self, source, cfg: Config) -> List[Any]:
        """Predict over a video/stream source frame by frame; save=True
        writes the annotated mp4 (reference `predictor.py:151-185`)."""
        import cv2

        from tamtr_tpu.data.loaders import VID_EXTS, load_inference_source
        from tamtr_tpu.engine.results import AnnotatedVideoWriter, Results

        variables = self._variables_from(self.state)
        pred_model, variables = self._resolve_eval_model(self.model, variables, cfg)
        conf = cfg.conf if cfg.conf is not None else 0.25
        eval_step = self._get_eval_step(
            pred_model, conf, cfg.iou, cfg.max_det, cfg.imgsz,
            classes=cfg.classes, single_cls=cfg.single_cls,
        )
        txt = jnp.asarray(self.txt_feats[None])
        writer = None
        if cfg.save:
            src_p = Path(str(source))
            is_stream = isinstance(source, int) or (
                isinstance(source, str) and source.isdigit()
            )
            fps = 30.0
            if not is_stream and src_p.exists():
                cap = cv2.VideoCapture(str(src_p))
                fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                cap.release()
            out = (
                Path(cfg.project or "runs/detect")
                / (cfg.name or "predict")
                / (src_p.stem if not is_stream else f"stream{source}")
            ).with_suffix(".mp4")
            writer = AnnotatedVideoWriter(out, fps / max(cfg.vid_stride, 1))
        results = []
        for name, frame in load_inference_source(source, cfg.vid_stride, cfg.stream_buffer):
            oh, ow = frame.shape[:2]
            img = cv2.resize(frame, (cfg.imgsz, cfg.imgsz))[..., ::-1].astype(np.float32) / 255.0
            boxes, scores, labels, valid, *_ = jax.device_get(
                eval_step(variables, jnp.asarray(np.ascontiguousarray(img)[None]), txt)
            )
            sel = valid[0] & (scores[0] > 0)
            r = Results(
                name,
                boxes[0][sel] * np.array([ow, oh, ow, oh], np.float32),
                scores[0][sel],
                labels[0][sel],
                self.names,
                orig_shape=(oh, ow),
                orig_img=frame,
            )
            if writer is not None:
                writer.write(r)
            results.append(r)
        if writer is not None:
            writer.close()
        return results

    # ------------------------------------------------------------------ track
    def track(
        self,
        source: Any,
        tracker: str = "bytetrack",
        persist: bool = False,
        **overrides: Any,
    ) -> List[Any]:
        """Multi-object tracking over a stream (reference `Model.track` +
        `trackers/track.py`): per-frame detection -> BYTETracker/BoT-SORT
        association; each Results gains `track_ids`."""
        import cv2

        from tamtr_tpu.data.loaders import load_inference_source
        from tamtr_tpu.engine.results import Results
        from tamtr_tpu.trackers.track import make_tracker, update_result_with_tracks

        # BOTSORT knobs ride the overrides (reference botsort.yaml keys);
        # popped before get_cfg so Config never sees them
        tracker_args = {
            k: overrides.pop(k)
            for k in ("gmc_method", "with_reid", "proximity_thresh",
                      "appearance_thresh", "track_buffer", "match_thresh")
            if k in overrides
        }
        cfg = get_cfg(self.cfg, overrides=overrides)
        # same no-side-effect default as predict (save=is_cli in the reference)
        cfg.save = bool(overrides.get("save", False))
        assert self.model is not None and self.state is not None, "load/train a model first"
        if not persist or getattr(self, "_tracker", None) is None:
            self._tracker = make_tracker(tracker, **tracker_args)
        variables = self._variables_from(self.state)
        conf = cfg.conf if cfg.conf is not None else 0.25
        eval_step = self._get_eval_step(self.model, conf, cfg.iou, cfg.max_det, cfg.imgsz)
        txt = jnp.asarray(self.txt_feats[None])
        # annotated-video output (reference `predictor.py:151-185`): save=True
        # on a video/stream source writes the plotted frames to an mp4
        writer = None
        if cfg.save:
            from tamtr_tpu.data.loaders import VID_EXTS
            from tamtr_tpu.engine.results import AnnotatedVideoWriter

            src_p = Path(str(source))
            is_stream = isinstance(source, int) or (
                isinstance(source, str) and source.isdigit()
            )
            if is_stream or src_p.suffix.lower() in VID_EXTS:
                fps = 30.0
                if not is_stream and src_p.exists():
                    cap = cv2.VideoCapture(str(src_p))
                    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                    cap.release()
                out = (
                    Path(cfg.project or "runs/track")
                    / (cfg.name or "predict")
                    / (src_p.stem if not is_stream else f"stream{source}")
                ).with_suffix(".mp4")
                writer = AnnotatedVideoWriter(out, fps / max(cfg.vid_stride, 1))
        results = []
        for name, frame in load_inference_source(source, cfg.vid_stride, cfg.stream_buffer):
            oh, ow = frame.shape[:2]
            img = cv2.resize(frame, (cfg.imgsz, cfg.imgsz))[..., ::-1].astype(np.float32) / 255.0
            boxes, scores, labels, valid, *_ = jax.device_get(
                eval_step(variables, jnp.asarray(np.ascontiguousarray(img)[None]), txt)
            )
            sel = valid[0] & (scores[0] > 0)
            r = Results(
                name,
                boxes[0][sel] * np.array([ow, oh, ow, oh], np.float32),
                scores[0][sel],
                labels[0][sel],
                self.names,
                orig_shape=(oh, ow),
                orig_img=frame,
            )
            update_result_with_tracks(r, self._tracker, frame=frame)
            if writer is not None:
                writer.write(r)
            results.append(r)
        if writer is not None:
            writer.close()
        return results

    def tune(
        self,
        iterations: int = 10,
        isolate: bool = False,
        use_ray: bool = False,
        **overrides: Any,
    ) -> Dict[str, float]:
        """Hyperparameter evolution (reference `Model.tune`): mutate hypers,
        run short trainings, keep the fitness-best (engine/tuner.py).

        isolate=True runs each trial in its own python subprocess like the
        reference's per-iteration `subprocess.run` (`engine/tuner.py:32-224`)
        so a hard-crashed trial (OOM kill, runtime wedge) cannot take down
        the evolution loop; crashed trials score fitness 0.

        use_ray=True routes to Ray Tune with an ASHA scheduler instead of
        the evolution loop (reference `Model.tune(use_ray=True)` ->
        `utils/tuner.py:run_ray_tune`); requires ray[tune]."""
        from tamtr_tpu.engine.tuner import Tuner, run_ray_tune

        base_cfg = get_cfg(overrides=overrides)
        if use_ray:
            return run_ray_tune(
                lambda hyp: Engine(self.model_cfg).train(
                    **{**overrides, **hyp, "save": False, "plots": False}
                ),
                max_samples=iterations,
                max_t=base_cfg.epochs,
                storage_path=str(Path(base_cfg.project or "runs") / "tune"),
            )
        tuner = Tuner(save_dir=Path(base_cfg.project or "runs") / "tune", seed=base_cfg.seed)

        def train_fn(hyp: Dict[str, float]) -> Dict[str, float]:
            ov = {**overrides, **hyp, "save": False, "plots": False}
            if not isolate:
                eng = Engine(self.model_cfg)
                return eng.train(**ov)
            import json
            import subprocess
            import sys
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                out_path = tf.name
            payload = json.dumps(
                {"model_cfg": str(self.model_cfg), "overrides": ov, "out": out_path},
                default=str,
            )
            code = (
                "import json,sys\n"
                "cfg = json.loads(sys.argv[1])\n"
                "from tamtr_tpu.engine.model import Engine\n"
                "m = Engine(cfg['model_cfg']).train(**cfg['overrides'])\n"
                "json.dump({k: float(v) for k, v in m.items()"
                " if isinstance(v, (int, float))}, open(cfg['out'], 'w'))\n"
            )
            r = subprocess.run(
                [sys.executable, "-c", code, payload], capture_output=True, text=True
            )
            try:
                with open(out_path) as f:
                    return json.load(f)
            except Exception:
                from tamtr_tpu.utils.log import LOGGER

                LOGGER.warning(
                    f"isolated tune trial crashed (rc={r.returncode}); fitness=0\n"
                    f"{r.stderr[-500:]}"
                )
                return {"fitness": 0.0}

        base_hyp = {
            k: getattr(base_cfg, k)
            for k in ("lr0", "lrf", "momentum", "weight_decay", "warmup_epochs",
                      "warmup_bias_lr", "hsv_h", "hsv_s", "hsv_v", "translate",
                      "scale", "fliplr", "mosaic", "mixup")
        }
        return tuner(train_fn, base_hyp=base_hyp, iterations=iterations)

    def load(self, ckpt_path: str, nc: Optional[int] = None, names: Optional[List[str]] = None) -> "Engine":
        """Load weights from an orbax checkpoint (metadata supplies nc/names).

        Bare known asset names (e.g. 'TAM_TR.pt') resolve through
        `utils/downloads.attempt_download_asset`; an unreachable asset
        raises HUBModelError (reference `errors.py` semantics)."""
        from tamtr_tpu.engine.checkpoint import load_checkpoint_raw

        p = Path(ckpt_path)
        if not p.exists() and p.name == str(ckpt_path):  # bare asset name
            from tamtr_tpu.utils.downloads import ASSETS_NAMES, attempt_download_asset
            from tamtr_tpu.utils.errors import HUBModelError

            if p.name in ASSETS_NAMES:
                try:
                    ckpt_path = attempt_download_asset(ckpt_path)
                except ConnectionError as e:
                    raise HUBModelError(
                        f"could not fetch asset {p.name!r}: {e}"
                    ) from e
        if str(ckpt_path).endswith(".pt"):
            # reference assets are torch pickles orbax cannot parse — convert
            # through the weight porter (tools/port_torch_weights) when
            # available, else fail with an actionable message instead of an
            # opaque orbax error (ADVICE r4 low#3)
            ported = Path(ckpt_path).with_suffix("")
            ported = ported.parent / (ported.name + "_orbax")
            if not ported.exists():
                try:
                    import sys as _sys

                    _sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
                    from tools.port_torch_weights import port as _port

                    _port(str(ckpt_path), str(ported), model_yaml=self.model_cfg)
                except Exception as e:
                    raise ValueError(
                        f"{ckpt_path!r} is a torch .pt checkpoint; automatic "
                        f"conversion failed ({type(e).__name__}: {e}). Convert "
                        "it explicitly with "
                        "`python tools/port_torch_weights.py <file>.pt <out_dir>` "
                        "and load the resulting orbax directory."
                    ) from e
            ckpt_path = str(ported)
        state, meta = load_checkpoint_raw(ckpt_path)
        self.state = state
        nc = nc or meta.get("nc")
        assert nc, "checkpoint has no nc metadata; pass nc=..."
        self.names = names or meta.get("names") or [str(i) for i in range(nc)]
        if self.txt_feats is None:
            self.txt_feats = class_text_embeddings(self.names)
        if meta.get("model_cfg"):
            self.model_cfg = meta["model_cfg"]
        self.model = TAMTRModel.from_yaml(
            self.model_cfg, nc=nc, max_gt=meta.get("max_gt", 128)
        )
        # flat checkpoints (TrainState stores params as one vector): rebuild
        # the unravel from the model structure so eval can restore the tree
        p = getattr(state, "params", None)
        if hasattr(p, "ndim") and p.ndim == 1 and getattr(state, "unravel", None) is None:
            from tamtr_tpu.train.trainer import unravel_for_model

            state.unravel = unravel_for_model(self.model, nc)
        return self

    def set_classes(self, classes: List[str], embeddings: Optional[np.ndarray] = None) -> None:
        """Open-vocabulary retarget (reference `RTDETRWorld.set_classes`)."""
        self.names = list(classes)
        self.txt_feats = (
            np.asarray(embeddings, np.float32)
            if embeddings is not None
            else class_text_embeddings(self.names)
        )

    @staticmethod
    def _append_csv(path: Path, row: Dict[str, Any]) -> None:
        """Append a row, rewriting the file when new columns appear.

        Val metrics only exist on val epochs, so the column set can grow
        mid-run (val_interval > 1); a fixed first-row header would shift
        those fields into unnamed columns."""
        rows: List[Dict[str, Any]] = []
        fields: List[str] = []
        if path.exists():
            with open(path, newline="") as f:
                r = csv.DictReader(f)
                fields = list(r.fieldnames or [])
                rows = list(r)
        new_fields = fields + [k for k in row if k not in fields]
        if new_fields == fields and fields and list(row) == fields:
            with open(path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=fields).writerow(row)
            return
        rows.append({k: row.get(k, "") for k in new_fields})
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=new_fields, restval="")
            w.writeheader()
            for rr in rows:
                rr.pop(None, None)
                w.writerow(rr)

"""AutoBackend parity across jax / SavedModel / TFLite (reference
`nn/autobackend.py` — the unified multi-backend inference wrapper)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ab")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(root / "images" / f"{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), np.uint8))
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: 1\nnames: [a]\n"
    )
    from tamtr_tpu import YOLO

    m = YOLO("yolo-gelan.yaml")
    m.train(data=str(root / "data.yaml"), epochs=1, batch=2, imgsz=64, workers=0,
            project=str(root / "runs"), max_gt=4, warmup_epochs=0, plots=False,
            val=False)
    return m, root


def test_autobackend_all_formats(trained):
    m, root = trained
    eng = m._lazy_engine()
    img = np.random.default_rng(1).random((1, 64, 64, 3), dtype=np.float32)
    txt = np.zeros((1, 1, 512), np.float32)

    from tamtr_tpu.nn.autobackend import AutoBackend

    # native jax from the orbax run checkpoint
    ckpt = root / "runs" / "train" / "weights" / "last"
    ab = AutoBackend(ckpt, imgsz=64)
    ab.warmup(1, 1)
    ref = ab(img, txt)
    assert ref.ndim == 3 and np.isfinite(ref).all()

    # stablehlo: portable PJRT artifact, no TF required
    shlo = eng.export("stablehlo", out_dir=str(root / "exp_shlo"), imgsz=64)
    ab_shlo = AutoBackend(shlo, imgsz=64)
    out_shlo = ab_shlo(img, txt)
    np.testing.assert_allclose(ref, out_shlo, atol=2e-5)

    # npz flat archive reload
    npz = eng.export("npz", out_dir=str(root / "exp_npz"), imgsz=64)
    ab_npz = AutoBackend(npz, model_cfg="yolo-gelan.yaml", nc=1, imgsz=64)
    out_npz = ab_npz(img, txt)
    np.testing.assert_allclose(ref, out_npz, atol=2e-5)

    try:
        import tensorflow  # noqa: F401
    except ImportError:
        pytest.skip("tensorflow not installed")
    sm = eng.export("savedmodel", out_dir=str(root / "exp_sm"), imgsz=64)
    ab_sm = AutoBackend(sm, imgsz=64)
    out_sm = ab_sm(img, txt)
    np.testing.assert_allclose(ref, out_sm, atol=2e-4)

    tfl = eng.export("tflite", out_dir=str(root / "exp_tfl"), imgsz=64)
    ab_tfl = AutoBackend(tfl, imgsz=64)
    out_tfl = ab_tfl(img, txt)
    # tflite kernels differ more (fp32 reference path)
    np.testing.assert_allclose(ref, out_tfl, atol=5e-3, rtol=1e-2)

    # frozen GraphDef (reference 'pb' format row)
    pb = eng.export("pb", out_dir=str(root / "exp_pb"), imgsz=64)
    ab_pb = AutoBackend(pb, imgsz=64)
    out_pb = ab_pb(img, txt)
    np.testing.assert_allclose(ref, out_pb, atol=2e-4)


def test_benchmark_validates_export_accuracy(trained):
    """benchmark() rows must carry real prediction-parity evidence, not just
    export success (the reference vals every exported format and asserts an
    mAP floor, `utils/benchmarks.py:45-152`)."""
    m, root = trained
    eng = m._lazy_engine()
    from tamtr_tpu.utils.benchmarks import benchmark

    formats = ["orbax", "npz", "stablehlo"]
    try:
        import tensorflow  # noqa: F401

        formats += ["savedmodel", "pb"]
    except ImportError:
        pass
    rows = benchmark(
        eng, imgsz=64, batch=1, formats=formats,
        out_dir=str(root / "bench"), n_iter=2,
    )
    by_fmt = {r["format"]: r for r in rows}
    assert by_fmt["jax"]["parity_ok"]
    for fmt in formats:
        row = by_fmt[fmt]
        assert row["ok"], row
        assert row.get("parity_ok"), row
        assert row["parity_maxdiff"] < 5e-3, row
        assert row.get("img_per_sec", 0) > 0, row


def test_quantized_exports(trained):
    """half/int8 export flags (reference format-matrix quantization columns):
    tflite fp16 + full-int8 PTQ artifacts load through AutoBackend and stay
    close to the native path; npz half halves the archive."""
    m, root = trained
    eng = m._lazy_engine()
    img = np.random.default_rng(1).random((1, 64, 64, 3), dtype=np.float32)
    txt = np.zeros((1, 1, 512), np.float32)

    from tamtr_tpu.nn.autobackend import AutoBackend

    ckpt = root / "runs" / "train" / "weights" / "last"
    ref = AutoBackend(ckpt, imgsz=64)(img, txt)

    # npz half: bf16 leaves, smaller archive, loadable, loose parity
    npz32 = eng.export("npz", out_dir=str(root / "q_npz32"), imgsz=64)
    npz16 = eng.export("npz", out_dir=str(root / "q_npz16"), imgsz=64, half=True)
    assert npz16.stat().st_size < 0.75 * npz32.stat().st_size
    out16 = AutoBackend(npz16, model_cfg="yolo-gelan.yaml", nc=1, imgsz=64)(img, txt)
    np.testing.assert_allclose(ref, out16, atol=0.05, rtol=0.05)

    # int8 is a tflite-only flag
    with pytest.raises(ValueError):
        eng.export("npz", out_dir=str(root / "q_bad"), imgsz=64, int8=True)

    try:
        import tensorflow  # noqa: F401
    except ImportError:
        pytest.skip("tensorflow not installed")

    tfl16 = eng.export("tflite", out_dir=str(root / "q_tfl16"), imgsz=64, half=True)
    out_tfl16 = AutoBackend(tfl16, imgsz=64)(img, txt)
    np.testing.assert_allclose(ref, out_tfl16, atol=0.05, rtol=0.05)

    calib = [(img, txt)]
    tfl8 = eng.export("tflite", out_dir=str(root / "q_tfl8"), imgsz=64, int8=True,
                      calib=calib)
    out_tfl8 = AutoBackend(tfl8, imgsz=64)(img, txt)
    assert out_tfl8.shape == ref.shape and np.isfinite(out_tfl8).all()
    # int8 grids are coarse and the fixture model is barely trained, so no
    # elementwise bar — assert the artifact actually computes (non-constant
    # output) on the same scale as the fp32 path
    assert out_tfl8.std() > 0
    assert np.abs(out_tfl8).max() < 10 * max(np.abs(ref).max(), 1.0)

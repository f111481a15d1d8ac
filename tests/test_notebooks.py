"""Execute the documented user journeys: the three notebooks' code cells run
end-to-end (reference notebook/*.ipynb).

Each notebook's cells are executed verbatim except for an explicit,
asserted substitution table that downsizes the heavy inputs for a 1-core CI
host (tiny synthetic weights/images, 1 epoch, float32).  If a notebook cell
is edited such that a substitution no longer matches, the test fails loudly
rather than silently skipping the cell.
"""

import json
import os
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _cells(name):
    nb = json.load(open(REPO / "notebook" / name))
    return ["".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"]


def _run(cells, substitutions, cwd):
    """Exec code cells in one shared namespace after applying the
    substitution table; every substitution must hit exactly once overall."""
    import matplotlib
    matplotlib.use("Agg")
    src = "\n\n".join(cells)
    for old, new in substitutions:
        assert old in src, f"notebook drifted; substitution not found: {old!r}"
        src = src.replace(old, new)
    here = os.getcwd()
    os.chdir(cwd)
    try:
        ns = {}
        exec(compile(src, "<notebook>", "exec"), ns)  # noqa: S102
        return ns
    finally:
        os.chdir(here)


@pytest.fixture(scope="module")
def nb_dir(tmp_path_factory):
    """A working directory shaped like the repo root the notebooks expect:
    class_names/, img/street.jpeg, synthetic yolov4.weights, and a tiny
    3-class training dataset (anno.txt + imgs/)."""
    import cv2

    from yolov4tpu import weights as w

    d = tmp_path_factory.mktemp("nb")
    (d / "class_names").mkdir()
    coco = open(REPO / "class_names" / "coco_classes.txt").read()
    (d / "class_names" / "coco_classes.txt").write_text(coco)
    (d / "class_names" / "bccd_classes.txt").write_text("WBC\nPlatelets\nRBC\n")

    (d / "img").mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(d / "img" / "street.jpeg"),
                rng.integers(0, 255, (96, 128, 3)).astype(np.uint8))

    with open(d / "yolov4.weights", "wb") as f:
        f.write(w.random_darknet_bytes(80, seed=5))

    (d / "imgs").mkdir()
    lines = []
    for i in range(6):
        name = f"t{i}.jpg"
        cv2.imwrite(str(d / "imgs" / name),
                    rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
        lines.append(f"{name} 8,8,40,40,0 20,22,60,60,{i % 3}")
    (d / "anno.txt").write_text("\n".join(lines) + "\n")
    (d / "anno-test.txt").write_text("\n".join(lines[:2]) + "\n")
    for sub in ("json", "ground_truth", "pred_result", "result"):
        (d / "eval" / sub).mkdir(parents=True)
    return d


@pytest.mark.slow
def test_inference_notebook(nb_dir):
    ns = _run(_cells("Inference.ipynb"), [
        # bf16 matmuls are pathologically slow on CPU CI; math identical path
        ("compute_dtype='bfloat16'", "compute_dtype='float32'"),
    ], nb_dir)
    assert list(ns["detections"].columns) == [
        "x1", "y1", "x2", "y2", "class_name", "score", "w", "h"]
    assert [tuple(g.shape[1:]) for g in ns["raw_grids"]] == [
        (52, 52, 255), (26, 26, 255), (13, 13, 255)]


@pytest.mark.slow
def test_inference_colab_notebook(nb_dir):
    ns = _run(_cells("Inference-colab.ipynb"), [
        ("compute_dtype='bfloat16'", "compute_dtype='float32'"),
        # 8 fake CPU devices x 8 images each is ~10 min of CPU conv; one
        # image per device exercises the same sharded program.
        ("(len(jax.devices()) * 8, 416, 416, 3)",
         "(len(jax.devices()), 416, 416, 3)"),
    ], nb_dir)
    assert ns["valid"].shape[0] == len(ns["jax"].devices())


@pytest.mark.slow
def test_train_notebook(nb_dir):
    ns = _run(_cells("train.ipynb"), [
        # Full-depth 416^2 COCO training is a TPU job; the CI journey runs
        # the same code on a 64^2 shallow variant for one epoch.
        ("cfg = YoloConfig(batch_size=8, compute_dtype='bfloat16',\n"
         "                 use_mosaic=True, label_smoothing=0.1)",
         "cfg = YoloConfig(batch_size=2, img_size=(64, 64, 3),\n"
         "                 csp_repeats=(1, 1, 1, 1, 1),\n"
         "                 use_mosaic=True, label_smoothing=0.1)"),
        ("epochs=100", "epochs=1"),
    ], nb_dir)
    assert os.path.exists(nb_dir / "ckpts" / "latest.npz")
    out = open(nb_dir / "eval" / "result" / "output.txt").read()
    assert "mAP" in out
    assert ns["model"].num_classes == 3

"""Checkpoint round-trips: .npz (single-file) and orbax (directory,
async-capable) — SURVEY §5 checkpoint/resume, which the reference lacked
entirely (its .h5 restore branch was dead code, reference models.py:75-81).
"""

import numpy as np
import pytest

from yolov4tpu import checkpoint as ckpt


def _tiny_tree():
    rng = np.random.default_rng(0)
    params = {"convs": [
        {"w": rng.normal(size=(3, 3, 2, 4)).astype(np.float32),
         "gamma": np.ones(4, np.float32), "beta": np.zeros(4, np.float32)},
        {"w": rng.normal(size=(1, 1, 4, 6)).astype(np.float32),
         "b": np.zeros(6, np.float32)},
    ]}
    state = {"bn": [
        {"mean": np.zeros(4, np.float32), "var": np.ones(4, np.float32)},
        None,  # bias conv carries no BN state (head convs)
    ]}
    return params, state


def _assert_tree_equal(a, b):
    import jax
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip_with_metadata(tmp_path):
    params, state = _tiny_tree()
    path = str(tmp_path / "nested" / "dir" / "ck.npz")  # dirs auto-created
    ckpt.save_npz(path, params, state, step=7, extra={"epoch": 3})
    p2, s2, step, extra = ckpt.load_npz(path)
    assert step == 7
    assert extra["epoch"] == 3
    _assert_tree_equal(params, p2)
    _assert_tree_equal(state, s2)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params, state = _tiny_tree()
    # Orbax's StandardCheckpointer can't represent None leaves; drop them
    # the way a caller would (state dict without the None placeholders).
    state = {"bn": [s for s in state["bn"] if s is not None]}
    d = str(tmp_path / "orbax")
    ckpt.save_orbax(d, params, state, step=5)
    assert ckpt.latest_orbax_step(d) == 5
    p2, s2 = ckpt.load_orbax(d, 5)
    _assert_tree_equal(params, p2)
    _assert_tree_equal(state, s2)


def test_latest_orbax_step_empty(tmp_path):
    assert ckpt.latest_orbax_step(str(tmp_path / "missing")) is None
    (tmp_path / "empty").mkdir()
    assert ckpt.latest_orbax_step(str(tmp_path / "empty")) is None

"""Golden parity: our JAX network vs the actual tf.keras reference model.

The strongest parity check available (SURVEY §4 'golden' tier): load the SAME
darknet ``.weights`` byte stream into (a) the reference implementation
imported straight from /root/reference (read-only, imported at test time, no
code copied) and (b) our functional JAX network, and compare the three raw
output grids.  This pins the full 110-conv topology, the darknet byte layout,
BN semantics (eps 1e-3), activation choices and the downsampling padding in
one shot.

Skipped automatically when TF or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_modules():
    tf = pytest.importorskip("tensorflow")
    # The reference's loader calls np.product, removed in numpy 2.0; shim it
    # so the unmodified reference code runs in this environment.
    if not hasattr(np, "product"):
        np.product = np.prod
    sys.path.insert(0, REF)
    try:
        import custom_layers as ref_layers
        import utils as ref_utils
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    return tf, ref_layers, ref_utils


@pytest.mark.slow
def test_raw_grids_match_reference(ref_modules, tmp_path):
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w
    from yolov4tpu.models import network

    num_classes = 3
    img = 96  # divisible by 32; small enough for CPU

    wpath = str(tmp_path / "synthetic.weights")
    with open(wpath, "wb") as f:
        f.write(w.random_darknet_bytes(num_classes, seed=11))

    # --- reference model (tf.keras) -----------------------------------
    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((img, img, 3))
    outs = ref_layers.yolov4_neck(inp, num_classes)
    ref_model = tf.keras.Model(inp, outs)
    ref_utils.load_weights(ref_model, wpath)

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (2, img, img, 3)).astype(np.float32)
    # Eager call (not .predict): grappler's remapper attempts a
    # FusedBatchNorm+Mish fusion that is unimplemented on this TF build.
    ref_out = [o.numpy() for o in ref_model(x, training=False)]

    # --- our network (JAX) --------------------------------------------
    params, state = w.load_darknet_weights(wpath, num_classes)
    got_out, _ = network.apply(params, state, x, num_classes)

    assert len(ref_out) == len(got_out) == 3
    for i, (r, g) in enumerate(zip(ref_out, got_out)):
        g = np.asarray(g)
        assert r.shape == g.shape, f"scale {i}: {r.shape} vs {g.shape}"
        # Raw-grid tolerance 2e-3: f32 accumulation-order drift across the
        # 110-conv depth between TF-CPU and XLA-CPU.  The <=1e-3 per-box
        # fidelity target (BASELINE.json) applies to decoded boxes, where
        # sigmoid/normalisation compress this logit-level noise.
        np.testing.assert_allclose(g, r, rtol=2e-3, atol=2e-3,
                                   err_msg=f"scale {i}")


@pytest.mark.slow
def test_folded_inference_matches_reference(ref_modules, tmp_path):
    """BN folding (our inference fast path) stays within fidelity budget of
    the reference's un-folded computation."""
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w
    from yolov4tpu.models import network

    num_classes = 3
    img = 96
    wpath = str(tmp_path / "synthetic.weights")
    with open(wpath, "wb") as f:
        f.write(w.random_darknet_bytes(num_classes, seed=12))

    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((img, img, 3))
    ref_model = tf.keras.Model(inp, ref_layers.yolov4_neck(inp, num_classes))
    ref_utils.load_weights(ref_model, wpath)

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (1, img, img, 3)).astype(np.float32)
    ref_out = [o.numpy() for o in ref_model(x, training=False)]

    params, state = w.load_darknet_weights(wpath, num_classes)
    folded = network.fold_bn(params, state)
    got_out = network.apply_folded(folded, x, num_classes)

    for i, (r, g) in enumerate(zip(ref_out, got_out)):
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-3, atol=2e-3,
                                   err_msg=f"scale {i}")


@pytest.mark.slow
def test_keras_h5_reader_matches_darknet_loader(ref_modules, tmp_path):
    """A reference-model .h5 save loads into the same pytree the darknet
    byte parser produces (the .h5 migration path, dead code in the
    reference at models.py:75-81)."""
    tf, ref_layers, ref_utils = ref_modules
    from yolov4tpu import weights as w

    num_classes = 3
    wpath = str(tmp_path / "synthetic.weights")
    with open(wpath, "wb") as f:
        f.write(w.random_darknet_bytes(num_classes, seed=13))

    tf.keras.backend.clear_session()
    inp = tf.keras.layers.Input((96, 96, 3))
    ref_model = tf.keras.Model(inp, ref_layers.yolov4_neck(inp, num_classes))
    ref_utils.load_weights(ref_model, wpath)
    h5path = str(tmp_path / "ref.h5")
    ref_model.save_weights(h5path)

    p_dark, s_dark = w.load_darknet_weights(wpath, num_classes)
    p_h5, s_h5 = w.load_keras_h5(h5path, num_classes)

    for i, (a, b) in enumerate(zip(p_dark["convs"], p_h5["convs"])):
        for key in a:
            np.testing.assert_array_equal(b[key], a[key],
                                          err_msg=f"conv {i} {key}")
    for i, (a, b) in enumerate(zip(s_dark["bn"], s_h5["bn"])):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(b["mean"], a["mean"])
            np.testing.assert_array_equal(b["var"], a["var"])

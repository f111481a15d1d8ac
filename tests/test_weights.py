"""Darknet .weights importer tests: byte layout, BN reorder, transpose,
EOF integrity, save/load roundtrip (SURVEY hard part #1)."""

import io

import numpy as np
import pytest

from yolov4tpu import weights
from yolov4tpu.models.network import conv_specs


def test_roundtrip_save_load(tmp_path):
    C = 3
    data = weights.random_darknet_bytes(C, seed=42)
    params, state = weights.load_darknet_weights(io.BytesIO(data), C)

    path = tmp_path / "rt.weights"
    weights.save_darknet_weights(params, state, path)
    assert path.read_bytes() == data

    params2, state2 = weights.load_darknet_weights(str(path), C)
    for p1, p2 in zip(params["convs"], params2["convs"]):
        for k in p1:
            np.testing.assert_array_equal(p1[k], p2[k])


def test_byte_layout_first_conv():
    """Hand-build the stream for conv 0 (32 filters, 3x3x3) and verify the BN
    reorder [beta,gamma,mean,var]->[gamma,beta,...] and kernel transpose
    (out,in,h,w)->(h,w,in,out) (reference utils.py:29-42)."""
    C = 3
    specs = conv_specs(C)
    out = io.BytesIO()
    out.write(np.asarray([0, 2, 5, 123, 0], np.int32).tobytes())

    f0 = specs[0].filters
    beta = np.arange(f0, dtype=np.float32)
    gamma = np.arange(f0, dtype=np.float32) + 100
    mean = np.arange(f0, dtype=np.float32) + 200
    var = np.arange(f0, dtype=np.float32) + 300
    out.write(np.concatenate([beta, gamma, mean, var]).tobytes())
    w0 = np.arange(f0 * 3 * 3 * 3, dtype=np.float32).reshape(f0, 3, 3, 3)
    out.write(w0.tobytes())

    # Fill the rest with zeros of the right sizes.
    for spec in specs[1:]:
        n = (4 * spec.filters if spec.batch_norm else spec.filters)
        out.write(np.zeros(n, np.float32).tobytes())
        out.write(np.zeros(spec.filters * spec.in_ch * spec.kernel_size ** 2,
                           np.float32).tobytes())

    params, state = weights.load_darknet_weights(io.BytesIO(out.getvalue()), C)
    np.testing.assert_array_equal(params["convs"][0]["gamma"], gamma)
    np.testing.assert_array_equal(params["convs"][0]["beta"], beta)
    np.testing.assert_array_equal(state["bn"][0]["mean"], mean)
    np.testing.assert_array_equal(state["bn"][0]["var"], var)
    # kernel: darknet (out,in,h,w) -> ours (h,w,in,out)
    np.testing.assert_array_equal(params["convs"][0]["w"],
                                  w0.transpose(2, 3, 1, 0))
    assert params["convs"][0]["w"].shape == (3, 3, 3, f0)


def test_head_convs_have_bias_not_bn():
    C = 2
    data = weights.random_darknet_bytes(C, seed=0)
    params, state = weights.load_darknet_weights(io.BytesIO(data), C)
    for i, (p, bn) in enumerate(zip(params["convs"], state["bn"])):
        if i in (93, 101, 109):
            assert "b" in p and bn is None
            assert p["b"].shape == (3 * (C + 5),)
        else:
            assert "gamma" in p and bn is not None


def test_eof_integrity_check():
    """Trailing bytes (wrong class count) must raise (reference utils.py:50-53
    only printed a warning; we fail loudly)."""
    data = weights.random_darknet_bytes(3, seed=1)
    with pytest.raises(ValueError, match="not fully consumed"):
        weights.load_darknet_weights(io.BytesIO(data + b"\x00" * 16), 3)
    with pytest.raises(ValueError, match="truncated"):
        weights.load_darknet_weights(io.BytesIO(data[:-16]), 3)


def test_loaded_weights_drive_forward(tmp_path):
    """End-to-end: synthetic .weights -> forward pass runs and is finite."""
    import jax.numpy as jnp
    from yolov4tpu.models import network

    C = 3
    data = weights.random_darknet_bytes(C, seed=7)
    params, state = weights.load_darknet_weights(io.BytesIO(data), C)
    # Make BN variances positive-sane for numerics.
    for bn in state["bn"]:
        if bn is not None:
            bn["var"] = np.abs(bn["var"]) + 0.5
    x = jnp.full((1, 64, 64, 3), 0.5)
    outs, _ = network.apply(params, state, x, num_classes=C)
    assert [o.shape for o in outs] == [(1, 8, 8, 24), (1, 4, 4, 24),
                                       (1, 2, 2, 24)]
    for o in outs:
        assert bool(jnp.isfinite(o).all())


def test_calibrate_density_spread_transform_is_exact(rng):
    """spread rescales the obj/class logit families EXACTLY: re-forwarding
    with the transformed head weights reproduces k*(l-mean)+mean+delta, and
    the calibrated density is hit on the transformed logits."""
    import jax.numpy as jnp
    from yolov4tpu.models import network

    C, reps = 3, (1, 1, 1, 1, 1)
    params, state, _ = network.init(C, img_size=32, seed=0, csp_repeats=reps)
    # He-scale: reference N(0,0.01) init vanishes at depth, leaving the obj
    # logits with ~zero variance — nothing to spread.  O(1) activations put
    # the test in the regime the bench's 416^2 calibration runs in.
    for p in params["convs"]:
        k, _, cin, _ = p["w"].shape
        p["w"] = rng.normal(0, np.sqrt(2.0 / (k * k * cin)),
                            p["w"].shape).astype(np.float32)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    folded = network.fold_bn(params, state)
    raws = [np.asarray(r, np.float32) for r in network.apply_folded(
        folded, imgs, C, jnp.float32, reps, s2d_stem=False)]

    target = 6.0
    busy, delta = weights.calibrate_detection_density(
        params, raws, C, 0.3, target_per_image=target, spread=1.0)

    raws_b = [np.asarray(r, np.float32) for r in network.apply_folded(
        network.fold_bn(busy, state), imgs, C, jnp.float32, reps,
        s2d_stem=False)]

    def flat(rs):
        return np.concatenate([r.reshape(r.shape[0], -1, 5 + C)
                               for r in rs], axis=1)
    old, new = flat(raws), flat(raws_b)

    # box logits untouched
    np.testing.assert_allclose(new[..., :4], old[..., :4], atol=1e-5)
    # obj/class: affine with the SAME (k, shift) for every position — and
    # std(new obj logits) == spread
    o_old, o_new = old[..., 4].ravel(), new[..., 4].ravel()
    k = (o_new.std() / o_old.std())
    shift = (o_new - k * o_old).mean()
    np.testing.assert_allclose(o_new, k * o_old + shift, atol=1e-4)
    assert o_new.std() == pytest.approx(1.0, rel=1e-3)

    # density on the re-forwarded logits ~ target (the whole point: it
    # survives re-forwarding, not just the bisection's in-memory logits)
    s = (1 / (1 + np.exp(-new[..., 4]))) * \
        (1 / (1 + np.exp(-new[..., 5:].max(-1))))
    per_img = (s > 0.3).sum() / len(imgs)
    assert 0.5 * target <= per_img <= 1.5 * target


def test_force_busy_heads_density_survives_bf16(rng):
    """The forced busy scene is precision-proof: the hot channels clear the
    score threshold at EVERY cell of their grid in bf16 compute, and nothing
    else fires — unlike quantile calibration, which collapses when the
    logits have no variance (reference init at depth)."""
    import jax.numpy as jnp
    from yolov4tpu.models import network

    C, reps = 3, (1, 1, 1, 1, 1)
    params, state, _ = network.init(C, img_size=32, seed=0, csp_repeats=reps)
    busy = weights.force_busy_heads(params, C, hot=((2, 0, 0), (2, 1, 1)))
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    raws = [np.asarray(r, np.float32) for r in network.apply_folded(
        network.fold_bn(busy, state), imgs, C, jnp.bfloat16, reps)]

    per_img = 0.0
    for r in raws:
        flat = r.reshape(r.shape[0], -1, 3, 5 + C)
        s = (1 / (1 + np.exp(-flat[..., 4]))) * \
            (1 / (1 + np.exp(-flat[..., 5:].max(-1))))
        per_img += (s > 0.3).sum() / len(imgs)
    # hot: two channels of the 13^2-equivalent head (here 2x2 at 32px input,
    # hence 2*4 cells); sigmoid(2)^2 = 0.77 >> 0.3 with margin bf16 keeps
    g = raws[2].shape[1]
    assert per_img == 2 * g * g

    # original params untouched (deep-copied head convs)
    b0 = np.asarray(params["convs"][-1]["b"]).reshape(3, 5 + C)
    assert not np.any(b0[:, 4] == -6.0)


def test_force_busy_heads_multiclass_all_heads(rng):
    """4-tuple hot entries: per-channel logits spread candidates across all
    three heads and many classes with controlled score ordering — the
    bench's trained-density scene (bench.py HOT_MULTICLASS)."""
    import jax.numpy as jnp
    from yolov4tpu.models import network

    C, reps = 24, (1, 1, 1, 1, 1)
    hot = ([(2, 0, c, 3.0) for c in range(10)]
           + [(1, 0, c, 2.0) for c in range(10, 20)]
           + [(0, 0, 20, 0.8)])
    params, state, _ = network.init(C, img_size=64, seed=0, csp_repeats=reps)
    busy = weights.force_busy_heads(params, C, hot=hot)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    raws = [np.asarray(r, np.float32) for r in network.apply_folded(
        network.fold_bn(busy, state), imgs, C, jnp.bfloat16, reps)]

    def scores(r):
        flat = r.reshape(r.shape[0], -1, 3, 5 + C)
        return (1 / (1 + np.exp(-flat[..., 4:5]))) * \
            (1 / (1 + np.exp(-flat[..., 5:])))  # (B, cells, 3, C)

    s0, s1, s2 = (scores(r) for r in raws)
    g0, g1, g2 = (r.shape[1] for r in raws)
    # every cell of each hot channel clears 0.3 in exactly its hot classes
    assert (s2[..., 0, :10] > 0.3).all() and not (s2[..., 0, 10:] > 0.3).any()
    assert (s2[..., 1:, :] > 0.3).sum() == 0
    assert (s1[..., 0, 10:20] > 0.3).all() and \
        not (s1[..., 0, :10] > 0.3).any()
    assert (s0[..., 0, 20] > 0.3).all()
    # score ordering: head2 boxes outrank head1 outrank head0 (so the fused
    # path's global top-k keeps the small grids first)
    assert s2[..., 0, 0].min() > s1[..., 0, 10].max() > s0[..., 0, 20].max()
    assert s0[..., 0, 20].min() > 0.3

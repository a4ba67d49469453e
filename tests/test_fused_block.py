"""Fused ConvNeXt MLP+GRN Pallas kernel (ops/pallas/fused_block.py):
value parity with the op-for-op jnp oracle and hand-derived VJP parity
with autodiff, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.ops.pallas.fused_block import (
    fused_mlp_grn,
    pick_s_tile,
    reference_mlp_grn,
)

ARG_NAMES = (
    "x",
    "shortcut",
    "ln_scale",
    "ln_bias",
    "w1",
    "b1",
    "grn_gamma",
    "grn_beta",
    "w2",
    "b2",
)


def _make_args(b=2, s=96, c=16, m=48, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(0, 1, (b, s, c)).astype(dtype)),
        jnp.asarray(rng.normal(0, 1, (b, s, c)).astype(dtype)),
        jnp.asarray(rng.normal(1, 0.1, (c,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (c, m)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.02, (m,)).astype(np.float32)),
        jnp.asarray(rng.normal(0.5, 0.2, (m,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (m,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (m, c)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.02, (c,)).astype(np.float32)),
    )


def test_erf_polynomial_matches_lax_erf():
    """Pin the kernel's erf expansion directly against jax.lax.erf.

    reference_mlp_grn shares _gelu_exact with the kernel, so the
    kernel-vs-oracle parity tests cannot catch a coefficient typo in the
    polynomial — this op-level test can (max |diff| 4.2e-7 measured over
    [-6, 6], plus the clamp-bound tails)."""
    from viscy_tpu.ops.pallas.fused_block import _ERF_CLAMP, _erf_f32

    x = jnp.concatenate(
        [
            jnp.linspace(-6.0, 6.0, 20001, dtype=jnp.float32),
            jnp.asarray(
                [-_ERF_CLAMP, _ERF_CLAMP, -10.0, 10.0, -1e30, 1e30, 0.0],
                dtype=jnp.float32,
            ),
        ]
    )
    got = np.asarray(_erf_f32(x))
    want = np.asarray(jax.lax.erf(x))
    np.testing.assert_allclose(got, want, atol=5e-7, rtol=0)
    # the tails overshoot 1 by at most one ULP (documented in fused_block.py)
    assert np.max(np.abs(got)) <= np.float32(1.0 + 2.0**-23)


def test_pick_s_tile():
    assert pick_s_tile(9216, 512) == 512
    assert pick_s_tile(2304, 512) == 384
    assert pick_s_tile(576, 512) == 288
    assert pick_s_tile(576, 256) == 192
    assert pick_s_tile(96, 512) == 96
    assert pick_s_tile(36, 512) is None


def test_forward_matches_reference_f32():
    args = _make_args()
    out = fused_mlp_grn(*args, interpret=True)
    ref = reference_mlp_grn(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_forward_multi_tile():
    # S = 96 with a tile cap of 32 -> 3 tiles; the GRN statistics must
    # accumulate across tiles identically to the single-pass oracle
    args = _make_args(s=96)
    out = fused_mlp_grn(*args, fwd_tile_cap=32, bwd_tile_cap=32, interpret=True)
    ref = reference_mlp_grn(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_forward_bf16_close():
    args = _make_args()
    argsb = tuple(
        a.astype(jnp.bfloat16) if a.ndim == 3 else a for a in args
    )
    out = fused_mlp_grn(*argsb, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_mlp_grn(*argsb)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )


def test_gradients_match_autodiff():
    """Hand-derived VJP == jax.grad of the oracle (f32, to roundoff)."""
    args = _make_args(b=2, s=64, c=16, m=48)
    cot = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, args[0].shape).astype(np.float32)
    )

    def loss_fused(*a):
        return jnp.sum(fused_mlp_grn(*a, fwd_tile_cap=32, bwd_tile_cap=32, interpret=True) * cot)

    def loss_ref(*a):
        return jnp.sum(reference_mlp_grn(*a) * cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for name, a, b in zip(ARG_NAMES, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_masked_forward_and_grads():
    """FCMAE masked semantics: GRN stats over mask-zeroed activations,
    branch zeroed before the residual; fwd and VJP vs the masked oracle."""
    args = _make_args(b=2, s=64, c=16, m=48)
    rng = np.random.default_rng(3)
    mask = jnp.asarray((rng.random((2, 64)) > 0.4).astype(np.float32))
    out = fused_mlp_grn(
        *args, mask=mask, fwd_tile_cap=32, bwd_tile_cap=32, interpret=True
    )
    ref = reference_mlp_grn(*args, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    cot = jnp.asarray(rng.normal(0, 1, args[0].shape).astype(np.float32))

    def loss_fused(*a):
        return jnp.sum(
            fused_mlp_grn(*a, mask=mask, fwd_tile_cap=32, bwd_tile_cap=32, interpret=True)
            * cot
        )

    def loss_ref(*a):
        return jnp.sum(reference_mlp_grn(*a, mask=mask) * cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for name, a, b in zip(ARG_NAMES, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_fcmae_pretraining_fused_equivalence():
    """Masked pretraining (mask_ratio > 0) through the fused kernel equals
    the unfused model with the same mask rng."""
    from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
    from viscy_tpu.ops.pallas import fused_block as fb

    cfg = dict(
        in_channels=1,
        out_channels=1,
        encoder_blocks=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        stem_kernel_size=(5, 4, 4),
        in_stack_depth=5,
        pretraining=True,
    )
    m0 = FullyConvolutionalMAE(**cfg)
    m1 = FullyConvolutionalMAE(**cfg, fused_mlp=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 1, 5, 32, 32)).astype(np.float32)
    )
    fb.FORCE_INTERPRET = True
    try:
        v = m0.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            x,
            mask_ratio=0.5,
        )
        rngs = {"mask": jax.random.PRNGKey(2)}
        y0, k0 = m0.apply(v, x, mask_ratio=0.5, rngs=rngs)
        y1, k1 = m1.apply(v, x, mask_ratio=0.5, rngs=rngs)
        np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-5
        )
    finally:
        fb.FORCE_INTERPRET = False


def test_contrastive_encoder_fused_mlp_equivalence():
    """ContrastiveEncoder(fused_mlp=True) on a v2 backbone matches the
    unfused forward on the same parameters (v1 backbones fall back: the
    fused kernel requires GRN and no layer scale)."""
    from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder
    from viscy_tpu.ops.pallas import fused_block as fb

    cfg = dict(
        backbone="convnextv2_test",
        in_channels=1,
        in_stack_depth=5,
        stem_kernel_size=(5, 4, 4),
        stem_stride=(5, 4, 4),
        embedding_dim=128,
        projection_dim=32,
    )
    m0 = ContrastiveEncoder(**cfg)
    m1 = ContrastiveEncoder(**cfg, fused_mlp=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 1, 5, 32, 32)).astype(np.float32)
    )
    fb.FORCE_INTERPRET = True
    try:
        v = m0.init(jax.random.PRNGKey(0), x)
        e0, p0 = m0.apply(v, x)
        e1, p1 = m1.apply(v, x)
        np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), rtol=1e-5, atol=1e-5)
    finally:
        fb.FORCE_INTERPRET = False


def test_no_divisor_raises():
    args = _make_args(s=36)
    with pytest.raises(ValueError):
        fused_mlp_grn(*args, interpret=True)


def test_fcmae_fused_mlp_equivalence():
    """FullyConvolutionalMAE(fused_mlp=True) shares the unfused model's
    parameter tree exactly and reproduces its forward values and gradients
    (the fused kernel is a pure execution-strategy change)."""
    from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
    from viscy_tpu.ops.pallas import fused_block as fb

    cfg = dict(
        in_channels=1,
        out_channels=2,
        encoder_blocks=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        stem_kernel_size=(5, 4, 4),
        in_stack_depth=5,
        pretraining=False,
    )
    m0 = FullyConvolutionalMAE(**cfg)
    m1 = FullyConvolutionalMAE(**cfg, fused_mlp=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 1, 5, 32, 32)).astype(np.float32)
    )
    fb.FORCE_INTERPRET = True
    try:
        v0 = m0.init(jax.random.PRNGKey(0), x)
        v1 = m1.init(jax.random.PRNGKey(0), x)
        # identical parameter trees (names, shapes, and init values)
        p0 = jax.tree_util.tree_leaves_with_path(v0)
        p1 = jax.tree_util.tree_leaves_with_path(v1)
        assert [k for k, _ in p0] == [k for k, _ in p1]
        for (k, a), (_, b) in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))

        y0 = m0.apply(v0, x)
        y1 = m1.apply(v0, x)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-5
        )

        cot = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, y0.shape).astype(np.float32)
        )
        g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, x) * cot))(
            v0["params"]
        )
        g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, x) * cot))(
            v0["params"]
        )
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5, err_msg=str(k)
            )
    finally:
        fb.FORCE_INTERPRET = False

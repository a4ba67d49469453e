"""Forward-shape tests for every architecture (reference test strategy §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.models import (
    ContrastiveEncoder,
    FullyConvolutionalMAE,
    UNeXt2,
    Unet2d,
    Unet25d,
    Unet3d,
)
from viscy_tpu.models.contrastive.loss import ntxent_loss, triplet_margin_loss
from viscy_tpu.models.unet.fcmae import generate_mask

KEY = jax.random.PRNGKey(0)
# small ConvNeXt config for fast CPU tests
SMALL = dict(backbone="convnextv2_test")


def _init_and_apply(model, x, **kwargs):
    variables = model.init({"params": KEY}, x, **kwargs)
    return model.apply(variables, x, **kwargs), variables


def test_unext2_2d_shape():
    # "UNeXt2_2D" in the reference registry is FCMAE with in_stack_depth=1
    # (2D stem path; cytoland/engine.py:42)
    model = FullyConvolutionalMAE(
        in_channels=1,
        out_channels=2,
        encoder_blocks=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        in_stack_depth=1,
        stem_kernel_size=(1, 4, 4),
        pretraining=False,
    )
    x = jnp.zeros((1, 1, 1, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 2, 1, 32, 32)


def test_unext2_3d_shape():
    model = UNeXt2(
        in_channels=1,
        out_channels=2,
        in_stack_depth=5,
        stem_kernel_size=(5, 4, 4),
        backbone="convnextv2_test",
    )
    x = jnp.zeros((1, 1, 5, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 2, 5, 32, 32)


def test_unext2_out_stack_depth():
    model = UNeXt2(
        in_channels=2,
        out_channels=1,
        in_stack_depth=4,
        out_stack_depth=2,
        stem_kernel_size=(2, 4, 4),
        backbone="convnextv2_test",
    )
    x = jnp.zeros((1, 2, 4, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 1, 2, 32, 32)


def test_fcmae_finetune_shape():
    model = FullyConvolutionalMAE(
        in_channels=1,
        out_channels=2,
        encoder_blocks=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        in_stack_depth=5,
        pretraining=False,
    )
    x = jnp.zeros((2, 1, 5, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (2, 2, 5, 32, 32)


def test_fcmae_pretrain_mask():
    model = FullyConvolutionalMAE(
        in_channels=1,
        out_channels=1,
        encoder_blocks=(1, 1, 2, 1),
        dims=(16, 32, 64, 128),
        in_stack_depth=5,
        pretraining=True,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 5, 64, 64), np.float32))
    variables = model.init({"params": KEY, "mask": KEY}, x, mask_ratio=0.5)
    (out, mask) = model.apply(
        variables, x, mask_ratio=0.5, rngs={"mask": jax.random.PRNGKey(1)}
    )
    assert out.shape == x.shape
    assert mask.shape == (2, 1, 64, 64)
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    assert frac == pytest.approx(0.5, abs=0.1)


def test_generate_mask_exact_ratio():
    mask = generate_mask(KEY, 3, (64, 64), stride=32, mask_ratio=0.5)
    assert mask.shape == (3, 1, 2, 2)
    assert int(mask.sum()) == 3 * 2  # exactly half of 4 cells per sample


def test_fcmae_masking_zeroes_encoder_features():
    """Masked positions must carry exact zeros through encoder stages."""
    from viscy_tpu.models.unet.fcmae import MaskedMultiscaleEncoder

    enc = MaskedMultiscaleEncoder(
        in_channels=1, stage_blocks=(1, 1), dims=(8, 16), stem_kernel_size=(5, 4, 4)
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 1, 5, 32, 32), np.float32))
    variables = enc.init({"params": KEY, "mask": KEY}, x, mask_ratio=0.5)
    feats, mask = enc.apply(
        variables, x, mask_ratio=0.5, rngs={"mask": jax.random.PRNGKey(2)}
    )
    # stem out at 8x8 (stride 4), stage0 at 8x8; mask at input res 32x32
    m0 = np.asarray(mask[0, 0, ::4, ::4])  # mask at feature res
    f0 = np.asarray(feats[0][0])  # (H, W, C)
    assert np.abs(f0[m0.astype(bool)]).max() == 0.0
    assert np.abs(f0[~m0.astype(bool)]).max() > 0.0


def test_unet2d_shape():
    model = Unet2d(in_channels=2, out_channels=1, num_blocks=2, task="reg")
    x = jnp.zeros((1, 2, 1, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 1, 1, 32, 32)


def test_unet25d_shape():
    model = Unet25d(
        in_channels=1, out_channels=1, in_stack_depth=5, out_stack_depth=1, num_blocks=2
    )
    x = jnp.zeros((1, 1, 5, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 1, 1, 32, 32)


def test_unet3d_shape():
    model = Unet3d(
        in_channels=1, out_channels=1, dims=(8, 16, 32), num_res_block=(1, 1), downsample_z=True
    )
    x = jnp.zeros((1, 1, 8, 32, 32))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 1, 8, 32, 32)


def test_contrastive_encoder_shapes():
    model = ContrastiveEncoder(
        backbone="convnextv2_test",
        in_channels=2,
        in_stack_depth=10,
        stem_kernel_size=(5, 4, 4),
        stem_stride=(5, 4, 4),
        embedding_dim=64,
        projection_dim=16,
    )
    x = jnp.zeros((2, 2, 10, 32, 32))
    variables = model.init({"params": KEY}, x, train=False)
    emb, proj = model.apply(variables, x, train=False)
    # the embedding is the pooled backbone feature (reference erases the
    # classifier fc, encoder.py:122): dim = dims[-1], not embedding_dim
    assert emb.shape == (2, 128)
    assert proj.shape == (2, 16)
    # train mode updates batch stats
    (emb, proj), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates


def test_ntxent_loss_basic():
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))
    z2 = z1 + 0.01 * jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))
    loss_aligned = float(ntxent_loss(z1, z2))
    z3 = jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))
    loss_random = float(ntxent_loss(z1, z3))
    assert loss_aligned < loss_random
    # HCL with beta=0 equals standard
    assert float(ntxent_loss(z1, z2, beta=0.0)) == pytest.approx(loss_aligned)
    assert np.isfinite(float(ntxent_loss(z1, z2, beta=0.5)))


def test_triplet_margin_loss():
    a = jnp.ones((4, 8))
    p = jnp.ones((4, 8)) * 1.01
    n = -jnp.ones((4, 8))
    assert float(triplet_margin_loss(a, p, n)) == 0.0
    assert float(triplet_margin_loss(a, n, p)) > 0.0


def test_classification_head_loss_and_metrics():
    from viscy_tpu.models import ClassificationHead

    head = ClassificationHead(
        head_name="gene_ko",
        batch_key="gene_label",
        in_dims=8,
        hidden_dims=16,
        num_classes=4,
        top_k=2,
        weight_schedule="cosine",
        weight_start=0.0,
        loss_weight=1.0,
        weight_warmup_epochs=10,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 8))
    y = jnp.array([0, 1, 2, 3, 0, 1])
    variables = head.init(jax.random.PRNGKey(1), x, y)
    loss, metrics = head.apply(variables, x, y)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert 0.0 <= float(metrics["metrics/acc_top1/gene_ko"]) <= 1.0
    assert float(metrics["metrics/acc_top2/gene_ko"]) >= float(
        metrics["metrics/acc_top1/gene_ko"]
    )
    # cosine weight schedule: 0 at epoch 0, full weight past warmup
    assert head.weight_at(0) == pytest.approx(0.0)
    assert head.weight_at(10) == pytest.approx(1.0)
    assert 0.0 < head.weight_at(5) < 1.0


def test_cross_modal_head_masks_nan_targets():
    from viscy_tpu.models import CrossModalContrastiveHead

    head = CrossModalContrastiveHead(
        head_name="pls", batch_key="X_pls", in_dims=8, target_dims=5, proj_dims=16
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (6, 5))
    y = y.at[2].set(jnp.nan)  # one unpaired cell
    variables = head.init(jax.random.PRNGKey(2), x, y)
    loss, metrics = head.apply(variables, x, y)
    assert np.isfinite(float(loss))
    assert float(metrics["metrics/paired_frac/pls"]) == pytest.approx(5 / 6)
    # all-NaN batch -> zero loss, still finite
    y_all_nan = jnp.full_like(y, jnp.nan)
    loss0, _ = head.apply(variables, x, y_all_nan)
    assert float(loss0) == pytest.approx(0.0)


def test_contrastive_module_with_aux_heads():
    from viscy_tpu.apps.dynaclr.engine import ContrastiveModule
    from viscy_tpu.models import ClassificationHead
    from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder

    enc = ContrastiveEncoder(
        backbone="convnextv2_test",
        in_channels=1,
        in_stack_depth=5,
        embedding_dim=128,
        projection_dim=16,
    )
    module = ContrastiveModule(
        encoder=enc,
        auxiliary_heads={
            "state": ClassificationHead(
                head_name="state",
                batch_key="label",
                in_dims=128,
                hidden_dims=32,
                num_classes=3,
            )
        },
    )
    rng = jax.random.PRNGKey(0)
    batch = {
        "anchor": np.random.rand(4, 1, 5, 32, 32).astype(np.float32),
        "positive": np.random.rand(4, 1, 5, 32, 32).astype(np.float32),
        "negative": np.random.rand(4, 1, 5, 32, 32).astype(np.float32),
        "label": np.array([0, 1, 2, 0]),
    }
    variables = module.init_variables(rng, batch)
    assert "aux_heads" in variables["params"]
    sched = module.schedule_state(0)
    assert "aux_weight/state" in sched
    batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
    batch_dev["_schedule"] = {k: jnp.float32(v) for k, v in sched.items()}
    loss, (metrics, _) = module.training_loss(variables, batch_dev, rng)
    assert np.isfinite(float(loss))
    assert "loss/aux/state" in metrics
    assert "metrics/acc_top1/state" in metrics
    vloss, vmetrics = module.validation_loss(variables, batch_dev, rng)
    assert np.isfinite(float(vloss)) and "loss/aux/state" in vmetrics


def test_beta_vae_conv_shapes_and_engine():
    from viscy_tpu.apps.dynaclr.vae_engine import BetaVaeModule
    from viscy_tpu.models.vae import BetaVaeMonai

    m = BetaVaeMonai(
        spatial_dims=3,
        in_shape=(2, 8, 32, 32),
        out_channels=2,
        latent_size=16,
        channels=(8, 16),
        strides=(2, 2),
        num_res_units=1,
    )
    module = BetaVaeModule(vae=m, example_input_array_shape=(2, 2, 8, 32, 32))
    batch = {"anchor": np.random.rand(2, 2, 8, 32, 32).astype(np.float32)}
    variables = module.init_with_rngs({"params": jax.random.PRNGKey(0)}, batch)
    loss, (metrics, _) = module.training_loss(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    assert "loss/kl" in metrics
    out = module.predict_step(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    assert out["features"].shape == (2, 16)


def test_transform_channel_wise_roundtrip():
    from viscy_tpu.data.utils import transform_channel_wise

    patch = np.random.rand(2, 3, 4, 8, 8).astype(np.float32)

    def double_first(sample):
        sample = dict(sample)
        sample["a"] = sample["a"] * 2
        return sample

    out = transform_channel_wise(double_first, ["a", "b", "c"], patch)
    np.testing.assert_allclose(out[:, 0], patch[:, 0] * 2, rtol=1e-6)
    np.testing.assert_allclose(out[:, 1:], patch[:, 1:], rtol=1e-6)


def test_dinov2_hf_conversion_numeric_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import os

    os.environ["HF_HUB_OFFLINE"] = "1"
    from viscy_tpu.models.foundation.convert import convert_dinov2_state_dict
    from viscy_tpu.models.foundation.vit import DinoViT

    cfg = transformers.Dinov2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=256,
        image_size=32,
        patch_size=8,
        layerscale_value=0.5,
        hidden_act="gelu",
    )
    tm = transformers.Dinov2Model(cfg).eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    fm = DinoViT(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2)
    params = convert_dinov2_state_dict(tm.state_dict(), depth=2, num_heads=2)
    out = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    mine = np.asarray(out["tokens"])
    np.testing.assert_allclose(ref, mine, atol=2e-5, rtol=1e-4)


def test_foundation_wrapper_load_backbone(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import os

    os.environ["HF_HUB_OFFLINE"] = "1"
    from viscy_tpu.models.foundation.wrappers import CellDinoModel

    cfg = transformers.Dinov2Config(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=56,
        patch_size=14,
    )
    tm = transformers.Dinov2Model(cfg)
    ckpt_dir = tmp_path / "hf_ckpt"
    tm.save_pretrained(ckpt_dir)
    wrapper = CellDinoModel(embed_dim=32, depth=1, num_heads=2, patch_size=14, resize_to=56)
    x = np.random.rand(1, 1, 5, 64, 64).astype(np.float32)
    variables = wrapper.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = wrapper.load_backbone(variables, str(ckpt_dir))
    feats, _ = wrapper.apply(variables, jnp.asarray(x))
    assert feats.shape == (1, 32)
    assert np.isfinite(np.asarray(feats)).all()


def test_phase_pad_pool_equals_post_shuffle_blur():
    """pad_pool_blur_2d_phase(x) then shuffle == shuffle then MONAI-style
    pad-pool blur, exactly (the phase-domain form runs at pre-shuffle
    resolution and replaces the stride-1 r x r reduce_window)."""
    import numpy as np

    from viscy_tpu.models.components.blocks import (
        pad_pool_blur_2d,
        pad_pool_blur_2d_phase,
        pixel_shuffle_2d,
    )

    rng = np.random.default_rng(0)
    for r in (2, 4):
        x = jnp.asarray(rng.normal(size=(2, 5, 6, 3 * r * r)).astype(np.float32))
        ref = pad_pool_blur_2d(pixel_shuffle_2d(x, r), r)
        new = pixel_shuffle_2d(pad_pool_blur_2d_phase(x, r), r)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(new), atol=1e-5)


def test_channels_last_loss_exactness():
    """VSUNet's channels-last loss path (nhwcd head layout + transposed
    no-grad target) must produce the identical loss and gradients as the
    NCDHW path — it is a pure layout optimization."""
    import jax
    import numpy as np

    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.training.losses.mixed_loss import MixedLoss

    def build(cl: bool) -> VSUNet:
        return VSUNet(
            architecture="fcmae",
            model_config=dict(
                in_channels=1,
                out_channels=2,
                encoder_blocks=(1, 1, 2, 1),
                dims=(16, 32, 64, 128),
                stem_kernel_size=(5, 4, 4),
                in_stack_depth=5,
                pretraining=False,
            ),
            loss_function=MixedLoss(l1_alpha=0.5, l2_alpha=0.0, ms_dssim_alpha=0.5),
            channels_last_loss=cl,
        )

    rng = np.random.default_rng(0)
    batch = {
        "source": jnp.asarray(rng.random((2, 1, 5, 32, 32)).astype(np.float32)),
        "target": jnp.asarray(rng.random((2, 2, 5, 32, 32)).astype(np.float32)),
    }
    m_cl, m_nc = build(True), build(False)
    variables = m_cl.init_variables(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    def loss_of(module):
        def f(params):
            v = {"params": params, **{k: variables[k] for k in variables if k != "params"}}
            loss, _ = module.training_loss(v, batch, key)
            return loss

        return f

    l_cl, g_cl = jax.value_and_grad(loss_of(m_cl))(variables["params"])
    l_nc, g_nc = jax.value_and_grad(loss_of(m_nc))(variables["params"])
    np.testing.assert_allclose(float(l_cl), float(l_nc), rtol=1e-5)
    flat_cl = jax.tree_util.tree_leaves(g_cl)
    flat_nc = jax.tree_util.tree_leaves(g_nc)
    for a, b in zip(flat_cl, flat_nc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_bf16_loss_closeness():
    """VSUNet's bf16 loss path (byte-cutting opt-in: loss inputs cast to
    bf16, math still f32) must stay within bf16 input-rounding error of the
    f32 path: loss close, gradients well-aligned (cosine ~1)."""
    import jax
    import numpy as np

    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.training.losses.mixed_loss import MixedLoss

    def build(bf: bool) -> VSUNet:
        return VSUNet(
            architecture="fcmae",
            model_config=dict(
                in_channels=1,
                out_channels=2,
                encoder_blocks=(1, 1, 2, 1),
                dims=(16, 32, 64, 128),
                stem_kernel_size=(5, 4, 4),
                in_stack_depth=5,
                pretraining=False,
            ),
            loss_function=MixedLoss(l1_alpha=0.5, l2_alpha=0.0, ms_dssim_alpha=0.5),
            bf16_loss=bf,
        )

    rng = np.random.default_rng(0)
    batch = {
        "source": jnp.asarray(rng.random((2, 1, 5, 32, 32)).astype(np.float32)),
        "target": jnp.asarray(rng.random((2, 2, 5, 32, 32)).astype(np.float32)),
    }
    m_bf, m_f32 = build(True), build(False)
    variables = m_bf.init_variables(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    def loss_of(module):
        def f(params):
            v = {"params": params, **{k: variables[k] for k in variables if k != "params"}}
            loss, _ = module.training_loss(v, batch, key)
            return loss

        return f

    l_bf, g_bf = jax.value_and_grad(loss_of(m_bf))(variables["params"])
    l_f, g_f = jax.value_and_grad(loss_of(m_f32))(variables["params"])
    # the f32 test model's prediction AND the target both round to bf16
    # (~0.4% relative input noise); the loss is O(1)
    np.testing.assert_allclose(float(l_bf), float(l_f), atol=2e-2)
    va = np.concatenate(
        [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(g_bf)]
    ).astype(np.float64)
    vb = np.concatenate(
        [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(g_f)]
    ).astype(np.float64)
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-30))
    assert cos > 0.99, cos

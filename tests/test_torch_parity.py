"""Numeric parity: reference torch modules vs the JAX port, converted weights.

The acceptance contract is the reference's inference-reproducibility pin
(``applications/cytoland/tests/test_inference_reproducibility.py:50-73``):
atol 0.02, per-channel Pearson r > 0.999.  Those bounds are for released
checkpoints through the full predict pipeline; at module level with
identical f32 weights we hold a much tighter line (max|delta| <= 2e-3 of
the output range, r > 0.9999).

Golden side: the reference's OWN model code
(``/root/reference/packages/viscy-models/src``) imported via
``tests/torch_golden`` with local timm/monai/pytorch-metric-learning shims
(none of those are installed).  JAX side: :mod:`viscy_tpu.models` with
weights produced by the production converters in
:mod:`viscy_tpu.training.convert`.

Every flax parameter leaf must be covered by the converter — an uncovered
leaf would silently keep its random init, so coverage failures are hard
errors, not tolerance failures.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_golden import load_reference  # noqa: E402

from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder  # noqa: E402
from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE  # noqa: E402
from viscy_tpu.models.unet.unet2d import Unet2d  # noqa: E402
from viscy_tpu.models.unet.unet25d import Unet25d  # noqa: E402
from viscy_tpu.models.unet.unet3d import Unet3d  # noqa: E402
from viscy_tpu.models.unet.unext2 import UNeXt2  # noqa: E402
from viscy_tpu.training.convert import (  # noqa: E402
    convert_contrastive_state_dict,
    convert_fcmae_state_dict,
    convert_unet2d_state_dict,
    convert_unet25d_state_dict,
    convert_unet3d_state_dict,
    convert_unext2_state_dict,
)

# module-level parity line: identical f32 weights, eval mode
ATOL_FRAC = 2e-3  # of the golden output's dynamic range
MIN_R = 0.9999


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    a -= a.mean()
    b -= b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom else 1.0


def _flat_leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat_leaves(v, p))
        else:
            out[p] = v
    return out


def strict_merge(
    params: dict,
    converted: dict,
    waive: tuple[str, ...] = (),
    extra_ok: tuple[str, ...] = (),
) -> dict:
    """Replace every leaf of ``params`` with its converted value.

    Fails if a flax leaf has no converted counterpart (unless its path
    contains a ``waive`` fragment) or if shapes mismatch — uncovered
    leaves would silently stay random-init and poison the comparison.
    ``extra_ok`` waives converted leaves with no flax analog (torch-side
    modules the config never routes through, e.g. the FCMAE stem's 2D
    branch when in_stack_depth > 1).
    """
    flat_ref = _flat_leaves(params)
    flat_conv = _flat_leaves(converted)
    extra = sorted(
        k
        for k in set(flat_conv) - set(flat_ref)
        if not any(w in k for w in extra_ok)
    )
    assert not extra, f"converter produced leaves absent from the flax tree: {extra[:8]}"
    missing = [
        k
        for k in flat_ref
        if k not in flat_conv and not any(w in k for w in waive)
    ]
    assert not missing, f"converter left {len(missing)} flax leaves unconverted: {missing[:8]}"
    for k, v in flat_conv.items():
        if k not in flat_ref:
            continue  # extra_ok-waived above
        assert np.asarray(flat_ref[k]).shape == np.asarray(v).shape, (
            f"{k}: flax {np.asarray(flat_ref[k]).shape} vs converted {np.asarray(v).shape}"
        )

    def rebuild(node, path=""):
        out = {}
        for k, v in node.items():
            p = f"{path}/{k}" if path else str(k)
            if isinstance(v, dict):
                out[k] = rebuild(v, p)
            else:
                out[k] = jnp.asarray(flat_conv.get(p, v))
        return out

    return rebuild(params)


def assert_parity(golden: np.ndarray, ported: np.ndarray, label: str):
    assert golden.shape == ported.shape, f"{label}: {golden.shape} vs {ported.shape}"
    rng = float(golden.max() - golden.min()) or 1.0
    max_abs = float(np.abs(golden - ported).max())
    r = _pearson(golden, ported)
    assert max_abs <= ATOL_FRAC * rng, (
        f"{label}: max|delta|={max_abs:.3e} exceeds {ATOL_FRAC:.0e} x range {rng:.3e}"
    )
    assert r > MIN_R, f"{label}: Pearson r={r:.6f} <= {MIN_R}"
    # the reference's released-artifact contract, as an outer sanity bound
    assert max_abs <= 0.02 * max(rng, 1.0) and r > 0.999


def torch_forward(model, x: np.ndarray):
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(x))
    if isinstance(out, (tuple, list)):
        return tuple(
            None if o is None else np.asarray(o.detach()) for o in out
        )
    return np.asarray(out.detach())


class TestUNeXt2:
    """Flagship virtual-staining architecture (reference unet/unext2.py:13)."""

    @pytest.fixture(scope="class")
    def pair(self):
        mod = load_reference("unet.unext2")
        torch.manual_seed(7)
        golden = mod.UNeXt2(
            in_channels=1,
            out_channels=2,
            in_stack_depth=5,
            backbone="convnextv2_atto",
            pretrained=False,
            stem_kernel_size=(5, 4, 4),
            decoder_mode="pixelshuffle",
            head_pool=False,
        )
        ported = UNeXt2(
            in_channels=1,
            out_channels=2,
            in_stack_depth=5,
            backbone="convnextv2_atto",
            stem_kernel_size=(5, 4, 4),
            head_pool=False,
        )
        return golden, ported

    def test_full_forward(self, pair):
        golden, ported = pair
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        converted = convert_unext2_state_dict(sd, strip_prefix="")
        x = np.random.default_rng(0).normal(size=(2, 1, 5, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), converted)
        y_torch = torch_forward(golden, x)
        y_jax = np.asarray(ported.apply({"params": params}, jnp.asarray(x)))
        assert_parity(y_torch, y_jax, "UNeXt2 forward")

    def test_head_pool_variant(self, pair):
        mod = load_reference("unet.unext2")
        torch.manual_seed(11)
        golden = mod.UNeXt2(
            in_channels=2,
            out_channels=1,
            in_stack_depth=5,
            backbone="convnextv2_atto",
            pretrained=False,
            head_pool=True,
        )
        ported = UNeXt2(
            in_channels=2,
            out_channels=1,
            in_stack_depth=5,
            backbone="convnextv2_atto",
            head_pool=True,
        )
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        converted = convert_unext2_state_dict(sd, strip_prefix="")
        x = np.random.default_rng(1).normal(size=(1, 2, 5, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), converted)
        y_torch = torch_forward(golden, x)
        y_jax = np.asarray(ported.apply({"params": params}, jnp.asarray(x)))
        assert_parity(y_torch, y_jax, "UNeXt2 head_pool forward")


class TestFCMAE:
    """ConvNeXt-v2 masked autoencoder (reference unet/fcmae.py:456)."""

    @pytest.fixture(scope="class")
    def pair(self):
        mod = load_reference("unet.fcmae")
        torch.manual_seed(3)
        kw = dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=[2, 2, 4, 2],
            dims=[24, 48, 96, 192],
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
            decoder_conv_blocks=1,
            pretraining=True,
        )
        golden = mod.FullyConvolutionalMAE(**kw)
        ported = FullyConvolutionalMAE(
            **{**kw, "encoder_blocks": tuple(kw["encoder_blocks"]), "dims": tuple(kw["dims"])}
        )
        return golden, ported

    def test_unmasked_forward(self, pair):
        golden, ported = pair
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        converted = convert_fcmae_state_dict(sd, strip_prefix="")
        x = np.random.default_rng(2).normal(size=(2, 1, 5, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # torch builds both stem branches; depth-5 input only routes conv3d
        params = strict_merge(
            jax.device_get(variables["params"]),
            converted,
            extra_ok=("encoder/stem/conv2d",),
        )
        y_torch, mask_torch = torch_forward(golden, x)
        assert mask_torch is None  # mask_ratio 0 -> reference skips masking
        out = ported.apply({"params": params}, jnp.asarray(x), 0.0)
        y_jax, mask_jax = out if not isinstance(out, jax.Array) else (out, None)
        y_jax = np.asarray(y_jax)
        assert_parity(y_torch, y_jax, "FCMAE unmasked forward")
        if mask_jax is not None:
            assert not np.asarray(mask_jax).any()


def _randomize_bn_stats(model, seed: int) -> None:
    """Perturb BN running stats away from their (0, 1) init so the
    batch_stats conversion path is actually exercised at eval time."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.5)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


class TestLegacyUNets:
    """Torch-only legacy U-Nets (reference unet2d.py:11 / unet25d.py:11)."""

    @pytest.mark.parametrize("residual,task", [(False, "seg"), (True, "reg")])
    def test_unet2d_forward(self, residual, task):
        mod = load_reference("unet.unet2d")
        torch.manual_seed(13)
        kw = dict(in_channels=2, out_channels=1, num_blocks=3, residual=residual, task=task)
        golden = mod.Unet2d(**kw)
        _randomize_bn_stats(golden, 17)
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        conv_params, conv_stats = convert_unet2d_state_dict(sd, strip_prefix="")
        ported = Unet2d(**kw)
        # reference API is (B, C, 1, H, W): forward squeezes and re-adds Z
        x = np.random.default_rng(4).normal(size=(2, 2, 1, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # torch builds a resid_conv on every block; the forward only routes
        # it when channels shrink (down blocks zero-pad instead)
        params = strict_merge(
            jax.device_get(variables["params"]), conv_params, extra_ok=("res_proj",)
        )
        stats = strict_merge(jax.device_get(variables["batch_stats"]), conv_stats)
        y_t = torch_forward(golden, x)
        y_j = np.asarray(ported.apply({"params": params, "batch_stats": stats}, jnp.asarray(x)))
        assert_parity(y_t, y_j, f"Unet2d residual={residual} task={task}")

    @pytest.mark.parametrize("residual", [False, True])
    def test_unet25d_forward(self, residual):
        mod = load_reference("unet.unet25d")
        torch.manual_seed(19)
        kw = dict(
            in_channels=1,
            out_channels=2,
            in_stack_depth=5,
            out_stack_depth=1,
            num_blocks=2,
            residual=residual,
        )
        golden = mod.Unet25d(**kw)
        _randomize_bn_stats(golden, 23)
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        conv_params, conv_stats = convert_unet25d_state_dict(sd, strip_prefix="")
        ported = Unet25d(**kw)
        x = np.random.default_rng(5).normal(size=(2, 1, 5, 32, 32)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(
            jax.device_get(variables["params"]), conv_params, extra_ok=("res_proj",)
        )
        stats = strict_merge(jax.device_get(variables["batch_stats"]), conv_stats)
        y_t = torch_forward(golden, x)
        y_j = np.asarray(ported.apply({"params": params, "batch_stats": stats}, jnp.asarray(x)))
        assert_parity(y_t, y_j, f"Unet25d residual={residual}")


class TestContrastiveEncoder:
    """DynaCLR encoder (reference contrastive/encoder.py:52)."""

    @pytest.fixture(scope="class")
    def pair(self):
        mod = load_reference("contrastive.encoder")
        torch.manual_seed(5)
        # the DynaCLR recipe config (reference encoder.py defaults; stem
        # folds 15 z-slices / depth-5 stride into 96 = 3 x 32 channels)
        kw = dict(
            backbone="convnext_tiny",
            in_channels=2,
            in_stack_depth=15,
            stem_kernel_size=(5, 4, 4),
            stem_stride=(5, 4, 4),
            embedding_dim=768,
            projection_dim=32,
        )
        golden = mod.ContrastiveEncoder(**kw)
        ported = ContrastiveEncoder(**kw)
        return golden, ported

    def test_embedding_and_projection(self, pair):
        golden, ported = pair
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        # running BN stats start at (0, 1) on both sides; the converter maps
        # the learned weight/bias, and num_batches_tracked has no flax analog
        sd = {
            k: v
            for k, v in sd.items()
            if "running_" not in k and "num_batches_tracked" not in k
        }
        converted = convert_contrastive_state_dict(sd, strip_prefix="")
        x = np.random.default_rng(3).normal(size=(2, 2, 15, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), converted)
        emb_t, proj_t = torch_forward(golden, x)
        emb_j, proj_j = ported.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            jnp.asarray(x),
            train=False,
        )
        assert_parity(emb_t, np.asarray(emb_j), "ContrastiveEncoder embedding")
        assert_parity(proj_t, np.asarray(proj_j), "ContrastiveEncoder projection")


class TestUnet3dFamily:
    """FNet3D preset + the shared UNet3DBase (reference unet3d.py:37,
    unet3d_base.py:19, blocks.py ResnetBlock/Block/ConvBottleneck3D)."""

    def test_fnet3d_forward(self):
        mod = load_reference("unet.unet3d")
        torch.manual_seed(29)
        kw = dict(in_channels=2, out_channels=1, depth=2, mult_chan=4)
        golden = mod.Unet3d(**kw)
        _randomize_bn_stats(golden, 31)
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        conv_params, conv_stats = convert_unet3d_state_dict(sd, strip_prefix="", norm="batch")
        ported = Unet3d(**kw)
        x = np.random.default_rng(6).normal(size=(2, 2, 8, 16, 16)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), conv_params)
        stats = strict_merge(jax.device_get(variables["batch_stats"]), conv_stats)
        y_t = torch_forward(golden, x)
        y_j = np.asarray(ported.apply({"params": params, "batch_stats": stats}, jnp.asarray(x)))
        assert_parity(y_t, y_j, "Unet3d FNet preset")

    def test_unet3d_base_conditioned(self):
        """Group norm + residual blocks + timestep FiLM + cond input —
        the CELLDiff-side configuration of the shared base (ViT bottleneck
        swapped for the conv bottleneck to isolate the U-Net path)."""
        base_mod = load_reference("unet.unet3d_base")
        blocks_mod = load_reference("unet.blocks")
        torch.manual_seed(37)
        bott = blocks_mod.ConvBottleneck3D(
            16, time_emb_dim=8, residual=True, norm="group", activation="silu", groups=2
        )
        golden = base_mod.UNet3DBase(
            in_channels=2,
            out_channels=1,
            dims=[4, 8, 16],
            num_res_block=[1, 2],
            bottleneck=bott,
            downsample_z=False,
            residual=True,
            norm="group",
            activation="silu",
            groups=2,
            time_embed_dim=8,
            cond_channels=1,
        )
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        conv_params, _ = convert_unet3d_state_dict(sd, strip_prefix="", norm="group")

        from functools import partial

        from viscy_tpu.models.unet.unet3d_base import ResnetBottleneck, UNet3DBase

        ported = UNet3DBase(
            in_channels=2,
            out_channels=1,
            dims=(4, 8, 16),
            num_res_block=(1, 2),
            bottleneck_factory=partial(
                ResnetBottleneck,
                16,
                residual=True,
                norm="group",
                activation="silu",
                groups=2,
                time_emb_dim=8,
                name="bottleneck",
            ),
            downsample_z=False,
            residual=True,
            norm="group",
            activation="silu",
            groups=2,
            time_embed_dim=8,
            cond_channels=1,
        )
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 2, 3, 16, 16)).astype(np.float32)
        cond = rng.normal(size=(2, 1, 3, 16, 16)).astype(np.float32)
        t = np.asarray([0.25, 0.75], np.float32)
        variables = ported.init(
            jax.random.PRNGKey(0), jnp.asarray(x), cond=jnp.asarray(cond), t=jnp.asarray(t)
        )
        # applying the base directly drops the wrapper's "unet" scope
        params = strict_merge(jax.device_get(variables["params"]), conv_params["unet"])
        golden.eval()
        with torch.no_grad():
            y_t = np.asarray(
                golden(torch.from_numpy(x), cond=torch.from_numpy(cond), t=torch.from_numpy(t))
            )
        y_j = np.asarray(
            ported.apply(
                {"params": params},
                jnp.asarray(x),
                cond=jnp.asarray(cond),
                t=jnp.asarray(t),
            )
        )
        assert_parity(y_t, y_j, "UNet3DBase conditioned (group norm)")


class TestPatchGAN3D:
    """GAN discriminators (reference gan/patchgan3d.py:22,132), spectral
    norm materialized to the eval-time weight (W/sigma)."""

    def test_single_scale_forward(self):
        mod = load_reference("gan.patchgan3d")
        torch.manual_seed(41)
        golden = mod.PatchGAN3D(in_channels=2, base_channels=8, use_spectral_norm=True)
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        from viscy_tpu.training.convert import convert_patchgan3d_state_dict

        conv_params = convert_patchgan3d_state_dict(sd, strip_prefix="")
        from viscy_tpu.models.gan.patchgan3d import PatchGAN3D

        ported = PatchGAN3D(in_channels=2, base_channels=8, use_spectral_norm=False)
        x = np.random.default_rng(8).normal(size=(2, 2, 8, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), conv_params)
        y_t = torch_forward(golden, x)
        y_j = np.asarray(ported.apply({"params": params}, jnp.asarray(x)))
        assert_parity(y_t, y_j, "PatchGAN3D spectral-norm eval")

    def test_multiscale_forward(self):
        mod = load_reference("gan.patchgan3d")
        torch.manual_seed(43)
        golden = mod.MultiScalePatchGAN3D(
            in_channels=1, base_channels=8, num_scales=2, use_spectral_norm=True
        )
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        from viscy_tpu.training.convert import convert_multiscale_patchgan3d_state_dict

        conv_params = convert_multiscale_patchgan3d_state_dict(sd, strip_prefix="")
        from viscy_tpu.models.gan.patchgan3d import MultiScalePatchGAN3D

        ported = MultiScalePatchGAN3D(
            in_channels=1, base_channels=8, num_scales=2, use_spectral_norm=False
        )
        x = np.random.default_rng(9).normal(size=(2, 1, 8, 64, 64)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), conv_params)
        y_t = torch_forward(golden, x)
        y_j = ported.apply({"params": params}, jnp.asarray(x))
        assert isinstance(y_t, tuple) and len(y_t) == 2
        for s in range(2):
            assert_parity(np.asarray(y_t[s]), np.asarray(y_j[s]), f"MultiScalePatchGAN3D scale {s}")


class TestCELLDiffFamily:
    """UNetViT3D + CELLDiffNet (reference celldiff/unet_vit_3d.py:17,
    celldiff_net.py:21, vit_bottleneck.py:26) with the diffusers shim."""

    def test_unet_vit3d_forward(self):
        mod = load_reference("celldiff.unet_vit_3d")
        torch.manual_seed(47)
        kw = dict(
            input_spatial_size=[4, 32, 32],
            in_channels=2,
            out_channels=1,
            dims=[8, 16, 32],
            num_res_block=[1, 1],
            hidden_size=64,
            num_heads=4,
            dim_head=16,
            num_hidden_layers=2,
            patch_size=2,
        )
        golden = mod.UNetViT3D(**kw)
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        from viscy_tpu.training.convert import convert_celldiff_state_dict

        conv_params, _ = convert_celldiff_state_dict(sd, strip_prefix="")
        from viscy_tpu.models.celldiff.celldiff_net import UNetViT3D

        ported = UNetViT3D(
            in_channels=2,
            out_channels=1,
            dims=(8, 16, 32),
            num_res_block=(1, 1),
            hidden_size=64,
            num_heads=4,
            dim_head=16,
            num_hidden_layers=2,
            patch_size=2,
        )
        x = np.random.default_rng(10).normal(size=(2, 2, 4, 32, 32)).astype(np.float32)
        variables = ported.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = strict_merge(jax.device_get(variables["params"]), conv_params)
        y_t = torch_forward(golden, x)
        y_j = np.asarray(ported.apply({"params": params}, jnp.asarray(x)))
        assert_parity(y_t, y_j, "UNetViT3D")

    def test_celldiff_net_forward(self):
        mod = load_reference("celldiff.celldiff_net")
        torch.manual_seed(53)
        golden = mod.CELLDiffNet(
            input_spatial_size=[4, 32, 32],
            in_channels=1,
            dims=[8, 16, 32],
            num_res_block=[1, 1],
            hidden_size=64,
            num_heads=4,
            dim_head=16,
            num_hidden_layers=2,
            patch_size=2,
        )
        # zero-init adaLN kills the conditioned paths; perturb so the
        # timestep conditioning is actually exercised
        with torch.no_grad():
            for name, p in golden.named_parameters():
                if "adaLN" in name:
                    p.copy_(torch.randn_like(p) * 0.02)
        sd = {k: v.numpy() for k, v in golden.state_dict().items()}
        from viscy_tpu.training.convert import convert_celldiff_state_dict

        conv_params, _ = convert_celldiff_state_dict(sd, strip_prefix="")
        from viscy_tpu.models.celldiff.celldiff_net import CELLDiffNet

        ported = CELLDiffNet(
            in_channels=1,
            out_channels=1,
            cond_channels=1,
            dims=(8, 16, 32),
            num_res_block=(1, 1),
            hidden_size=64,
            num_heads=4,
            dim_head=16,
            num_hidden_layers=2,
            patch_size=2,
        )
        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, 1, 4, 32, 32)).astype(np.float32)
        cond = rng.normal(size=(2, 1, 4, 32, 32)).astype(np.float32)
        t = np.asarray([0.1, 0.9], np.float32)
        variables = ported.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t)
        )
        params = strict_merge(jax.device_get(variables["params"]), conv_params)
        golden.eval()
        with torch.no_grad():
            y_t = np.asarray(
                golden(torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t))
            )
        y_j = np.asarray(
            ported.apply(
                {"params": params}, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t)
            )
        )
        assert_parity(y_t, y_j, "CELLDiffNet conditioned")

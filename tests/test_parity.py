"""Released-checkpoint parity harness tests.

The released artifacts (torch checkpoint, fixture zarr, reference
predictions) are not present in this environment, so these tests exercise
every tier of the harness on synthetic stand-ins — including a full
end-to-end run of :func:`run_checkpoint_parity` against a synthetic
"released" torch .ckpt and self-generated reference predictions — proving
the contract machinery (conversion -> production predict -> per-channel
atol/rtol/Pearson) works before real weights ever arrive.

Contract source: reference
``applications/cytoland/tests/test_inference_reproducibility.py:50-73``.
"""

from __future__ import annotations

import numpy as np
import pytest

from viscy_tpu.training.parity import (
    capture_activations,
    compare_activations,
    compare_predictions,
    layerwise_weight_audit,
    run_checkpoint_parity,
    write_parity_report,
)

TINY_CONFIG = {
    "in_channels": 1,
    "out_channels": 2,
    "encoder_blocks": [1, 1, 1, 1],
    "dims": [8, 16, 32, 64],
    "decoder_conv_blocks": 1,
    "in_stack_depth": 5,
    "pretraining": False,
}


@pytest.fixture(scope="module")
def tiny_fcmae():
    import jax
    import jax.numpy as jnp

    from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE

    model = FullyConvolutionalMAE(
        in_channels=1,
        out_channels=2,
        encoder_blocks=(1, 1, 1, 1),
        dims=(8, 16, 32, 64),
        decoder_conv_blocks=1,
        in_stack_depth=5,
        pretraining=False,
    )
    x = jnp.zeros((1, 1, 5, 32, 32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model, variables


@pytest.fixture(scope="module")
def torch_style_ckpt(tiny_fcmae):
    """Synthetic torch-style state dict (reference naming) for the tiny model."""
    from test_convert import _flax_to_torch_names

    _, variables = tiny_fcmae
    return _flax_to_torch_names(variables["params"])


class TestWeightAudit:
    def test_clean_conversion_audits_ok(self, tiny_fcmae, torch_style_ckpt):
        from viscy_tpu.training.convert import convert_fcmae_state_dict

        _, variables = tiny_fcmae
        converted = convert_fcmae_state_dict(torch_style_ckpt)
        audit = layerwise_weight_audit(
            torch_style_ckpt, converted, model_params=variables["params"]
        )
        assert audit.ok, (
            audit.unmatched_torch_keys,
            audit.missing_model_leaves,
            audit.extra_converted_leaves,
            audit.shape_mismatches,
            audit.norm_mismatches,
        )
        assert audit.n_torch_keys == audit.n_converted_leaves

    def test_detects_scaled_weight(self, tiny_fcmae, torch_style_ckpt):
        from viscy_tpu.training.convert import convert_fcmae_state_dict

        bad = dict(torch_style_ckpt)
        key = next(iter(bad))
        bad[key] = bad[key] * 2.0
        converted = convert_fcmae_state_dict(torch_style_ckpt)  # unscaled conversion
        audit = layerwise_weight_audit(bad, converted)
        assert audit.norm_mismatches

    def test_detects_missing_leaf(self, tiny_fcmae, torch_style_ckpt):
        from viscy_tpu.training.convert import convert_fcmae_state_dict

        _, variables = tiny_fcmae
        converted = convert_fcmae_state_dict(torch_style_ckpt)
        # drop one converted subtree
        broken = {k: v for k, v in converted.items() if k != "encoder"}
        audit = layerwise_weight_audit(
            torch_style_ckpt, broken, model_params=variables["params"]
        )
        assert audit.missing_model_leaves


class TestActivationCapture:
    def test_capture_and_compare(self, tiny_fcmae, tmp_path):
        import numpy as np

        model, variables = tiny_fcmae
        x = np.random.default_rng(0).normal(size=(1, 1, 5, 32, 32)).astype(np.float32)
        acts = capture_activations(model, variables, x, with_arrays=True)
        assert acts, "no intermediates captured"
        for stats in acts.values():
            assert {"shape", "mean", "std"} <= set(stats)

        # simulate a torch-side export: same arrays, NHWC->NCHW transposed.
        # Skip layers where channels == spatial size: the layout detection
        # is shape-based and such arrays are ambiguous by construction.
        sel = {
            k: v["array"]
            for k, v in list(acts.items())[:8]
            if v["array"].ndim in (4, 5) and v["array"].shape[1] != v["array"].shape[-1]
        }
        assert sel, "need at least one unambiguous activation"
        npz_path = tmp_path / "torch_acts.npz"
        np.savez(
            npz_path,
            **{
                k: np.transpose(v, (0, 3, 1, 2) if v.ndim == 4 else (0, 4, 1, 2, 3))
                for k, v in sel.items()
            },
        )
        results = compare_activations(acts, npz_path)
        assert results
        assert all(r["status"] == "ok" for r in results.values()), results

        # perturbation is flagged as divergence
        np.savez(
            npz_path,
            **{
                k: np.transpose(v + 1.0, (0, 3, 1, 2) if v.ndim == 4 else (0, 4, 1, 2, 3))
                for k, v in sel.items()
            },
        )
        results = compare_activations(acts, npz_path)
        assert all(r["status"] == "diverged" for r in results.values())


class TestPredictionContract:
    def test_identical_passes(self):
        rng = np.random.default_rng(0)
        ref = rng.normal(size=(2, 5, 16, 16)).astype(np.float32)
        res = compare_predictions(ref.copy(), ref, ["Membrane", "Nuclei"])
        assert res["pass"]
        for ch in res["channels"].values():
            assert ch["pearson_r"] > 0.999
            assert ch["frac_within_tol"] == 1.0

    def test_noise_fails(self):
        rng = np.random.default_rng(0)
        ref = rng.normal(size=(2, 5, 16, 16)).astype(np.float32)
        noisy = ref + rng.normal(scale=0.5, size=ref.shape).astype(np.float32)
        res = compare_predictions(noisy, ref, ["Membrane", "Nuclei"])
        assert not res["pass"]

    def test_small_offset_fails_atol(self):
        ref = np.zeros((1, 2, 8, 8), dtype=np.float32)[0]
        res = compare_predictions(ref + 0.05, ref, ["a", "b"][:2])
        assert not res["pass"]


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def fixture_paths(self, tmp_path_factory, torch_style_ckpt):
        """Synthetic released artifacts: .ckpt + fixture zarr + reference zarr."""
        torch = pytest.importorskip("torch")

        from viscy_tpu.zarr_io.store import open_ome_zarr
        from viscy_tpu.zarr_io.synthetic import build_hcs_plate

        root = tmp_path_factory.mktemp("parity")
        ckpt_path = root / "released.ckpt"
        torch.save(
            {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in torch_style_ckpt.items()}},
            ckpt_path,
        )

        data_zarr = root / "fixture.zarr"
        build_hcs_plate(
            str(data_zarr),
            ["Phase3D", "Membrane", "Nuclei"],
            zyx_shape=(7, 32, 32),
            dtype=np.float32,
            max_value=1.0,
            num_timepoints=1,
            rows=["A"],
            cols=["1"],
            fovs=["0"],
            norm_meta=True,
        )
        return ckpt_path, data_zarr, root

    def test_parity_against_self_generated_reference(self, fixture_paths):
        """Full contract run: conversion -> production predict -> compare."""
        ckpt_path, data_zarr, root = fixture_paths

        from viscy_tpu.apps.cytoland.engine import FcmaeUNet
        from viscy_tpu.apps.cytoland.prediction import AugmentedPredictionVSUNet
        from viscy_tpu.data.utils import read_norm_meta
        from viscy_tpu.training.convert import (
            convert_fcmae_state_dict,
            load_torch_checkpoint,
        )
        from viscy_tpu.zarr_io.store import open_ome_zarr

        # generate the "released reference predictions" with the same
        # converted weights + production pipeline
        state = load_torch_checkpoint(str(ckpt_path))
        params = convert_fcmae_state_dict(state)
        module = FcmaeUNet(model_config=dict(TINY_CONFIG))
        src = open_ome_zarr(str(data_zarr), mode="r")
        _, pos = next(src.positions())
        norm = read_norm_meta(pos)
        source = np.asarray(pos.data[0, 0], np.float32)
        stats = norm["Phase3D"]["fov_statistics"]
        source = (source - stats["mean"]) / stats["std"]
        predictor = AugmentedPredictionVSUNet(model=module.model)
        pred = predictor.predict_sliding_windows(
            {"params": params}, source[None, None], out_channel=2
        )[0]

        ref_zarr = root / "reference.zarr"
        dst = open_ome_zarr(
            str(ref_zarr), layout="hcs", mode="w", channel_names=["Membrane", "Nuclei"]
        )
        out_pos = dst.create_position("A", "1", "0")
        out_pos.create_image("0", pred[None].astype(np.float32))

        result = run_checkpoint_parity(
            ckpt_path,
            data_zarr,
            ref_zarr,
            model_config=dict(TINY_CONFIG),
            source_channel="Phase3D",
            target_channels=["Membrane", "Nuclei"],
        )
        assert result["pass"], result
        assert result["weight_audit"]["ok"]
        for ch in ("Membrane", "Nuclei"):
            assert result["channels"][ch]["pearson_r"] > 0.999

        # corrupted reference -> contract fails
        bad_zarr = root / "bad_reference.zarr"
        dst = open_ome_zarr(
            str(bad_zarr), layout="hcs", mode="w", channel_names=["Membrane", "Nuclei"]
        )
        out_pos = dst.create_position("A", "1", "0")
        rng = np.random.default_rng(1)
        out_pos.create_image(
            "0",
            (pred[None] + rng.normal(scale=0.3, size=pred[None].shape)).astype(
                np.float32
            ),
        )
        result_bad = run_checkpoint_parity(
            ckpt_path,
            data_zarr,
            bad_zarr,
            model_config=dict(TINY_CONFIG),
            source_channel="Phase3D",
            target_channels=["Membrane", "Nuclei"],
        )
        assert not result_bad["pass"]


class TestReport:
    def test_gated_report(self, tmp_path):
        report = write_parity_report(tmp_path / "PARITY.json")
        assert report["status"] == "artifacts_unavailable"
        assert set(report["missing_artifacts"]) == {"checkpoint", "data", "reference"}
        assert (tmp_path / "PARITY.json").exists()


class TestStateDictInventoryAudit:
    """Converter coverage pinned against statically derived reference key
    inventories (VERDICT r2 item 4; reference
    ``viscy-models/tests/test_state_dict_compat.py``). The inventories are
    generated from the reference *source* structure, independent of the
    flax models, so a key the converter cannot map fails here — before any
    real-checkpoint run."""

    def test_counts_match_reference_pins(self):
        from viscy_tpu.training.state_dict_inventory import (
            contrastive_state_dict_inventory,
            fcmae_state_dict_inventory,
            unext2_state_dict_inventory,
        )

        # the reference's own pins (test_state_dict_compat.py)
        assert len(unext2_state_dict_inventory(backbone="convnextv2_atto")) == 213
        assert len(fcmae_state_dict_inventory()) == 222
        assert len(contrastive_state_dict_inventory()) == 194

    def test_prefixes_and_sentinels(self):
        from viscy_tpu.training.state_dict_inventory import (
            contrastive_state_dict_inventory,
            fcmae_state_dict_inventory,
            unext2_state_dict_inventory,
        )

        u = unext2_state_dict_inventory(backbone="convnextv2_atto")
        assert {k.split(".")[0] for k in u} == {"decoder", "encoder_stages", "head", "stem"}
        for s in [
            "stem.conv.weight",
            "encoder_stages.stages_1.blocks.1.mlp.fc2.bias",
            "decoder.decoder_stages.0.conv.blocks.0.conv_dw.weight",
            "decoder.decoder_stages.2.conv.blocks.0.mlp.grn.bias",
            "head.conv.1.weight",
        ]:
            assert s in u, s
        f = fcmae_state_dict_inventory()
        assert {k.split(".")[0] for k in f} == {"decoder", "encoder"}
        for s in [
            "encoder.stem.conv3d.weight",
            "encoder.stem.norm.bias",
            "encoder.stages.0.blocks.1.mlp.fc1.weight",
            "encoder.stages.2.blocks.1.layernorm.weight",
            "decoder.decoder_stages.0.conv.blocks.0.conv_dw.bias",
            "decoder.decoder_stages.0.conv.blocks.0.mlp.fc1.bias",
        ]:
            assert s in f, s
        # the reference FCMAE encoder dwconv has NO bias (timm
        # create_conv2d_pad defaults bias=False)
        assert "encoder.stages.0.blocks.0.dwconv.bias" not in f
        c = contrastive_state_dict_inventory()
        assert {k.split(".")[0] for k in c} == {"encoder", "projection", "stem"}
        for s in [
            "stem.conv.weight",
            "encoder.head.norm.bias",
            "encoder.stages.0.blocks.0.conv_dw.bias",
            "encoder.stages.2.blocks.4.gamma",
            "projection.4.running_var",
        ]:
            assert s in c, s

    @pytest.mark.parametrize(
        "name",
        ["vscyto3d", "vscyto2d", "fcmae_3d", "dynaclr_contrastive"],
    )
    def test_converter_covers_every_released_key(self, name):
        """Every key a released checkpoint will contain must be consumed by
        the converter rules (zero unmatched), exercised on shape-faithful
        dummy arrays so the value transforms run too."""
        from viscy_tpu.training.convert import (
            _CONTRASTIVE_RULES,
            _FCMAE_RULES,
            _UNEXT2_RULES,
            convert_state_dict,
        )
        from viscy_tpu.training.state_dict_inventory import released_inventory

        rules = {
            "vscyto3d": _UNEXT2_RULES,
            "vscyto2d": _FCMAE_RULES,
            "fcmae_3d": _FCMAE_RULES,
            "dynaclr_contrastive": _CONTRASTIVE_RULES,
        }[name]
        inventory = released_inventory(name)
        sd = {k: np.zeros(shape, np.float32) for k, shape in inventory.items()}
        params, unmatched = convert_state_dict(sd, rules, strip_prefix="")
        # num_batches_tracked is a torch BN counter with no flax analog;
        # everything else must map
        unexpected = [k for k in unmatched if not k.endswith("num_batches_tracked")]
        assert unexpected == [], f"{len(unexpected)} uncovered keys, e.g. {unexpected[:8]}"

    def test_fcmae_converted_tree_matches_flax_params(self):
        """Converted released-FCMAE tree must line up leaf-for-leaf (names
        AND shapes) with the flax model's own param tree — so a real
        checkpoint can only fail on numerics, never naming."""
        import jax

        from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
        from viscy_tpu.training.convert import convert_fcmae_state_dict
        from viscy_tpu.training.state_dict_inventory import released_inventory

        inventory = released_inventory("vscyto2d")
        sd = {k: np.zeros(shape, np.float32) for k, shape in inventory.items()}
        converted = convert_fcmae_state_dict(sd, strip_prefix="")

        model = FullyConvolutionalMAE(
            in_channels=1,
            out_channels=2,
            encoder_blocks=(3, 3, 9, 3),
            dims=(96, 192, 384, 768),
            decoder_conv_blocks=2,
            stem_kernel_size=(1, 2, 2),
            in_stack_depth=1,
            pretraining=False,
        )
        variables = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), np.zeros((1, 1, 1, 32, 32), np.float32)
            )
        )
        flax_params = variables["params"]

        def leaves(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    out.update(leaves(v, p))
                else:
                    out[p] = tuple(v.shape)
            return out

        conv_leaves = leaves(converted)
        flax_leaves = leaves(flax_params)
        missing = sorted(set(flax_leaves) - set(conv_leaves))
        extra = sorted(set(conv_leaves) - set(flax_leaves))
        assert missing == [], f"flax params not fed by converter: {missing[:8]}"
        # the torch MaskedAdaptiveProjection always materializes BOTH stem
        # convs but forwards through conv3d only when D > 1 (reference
        # fcmae.py:371-379); at in_stack_depth=1 the conv3d branch is dead
        # weight in the checkpoint and the flax model never instantiates it
        allowed_dead = {"encoder/stem/conv3d/kernel", "encoder/stem/conv3d/bias"}
        unexpected_extra = [k for k in extra if k not in allowed_dead]
        assert unexpected_extra == [], f"converter produced unknown leaves: {unexpected_extra[:8]}"
        conv_leaves = {k: v for k, v in conv_leaves.items() if k not in allowed_dead}
        mismatched = {
            k: (conv_leaves[k], flax_leaves[k])
            for k in flax_leaves
            if conv_leaves[k] != flax_leaves[k]
        }
        assert mismatched == {}, f"shape mismatches: {dict(list(mismatched.items())[:5])}"

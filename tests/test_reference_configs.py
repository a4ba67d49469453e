"""Reference-config surface parity: the actual YAML configs shipped with
the reference application instantiate against viscy_tpu classes
(class_path remapping + init_args compatibility)."""

from pathlib import Path

import pytest
import yaml

from viscy_tpu.training.compose import load_composed_config
from viscy_tpu.training.instantiate import instantiate

REFERENCE = Path("/root/reference")


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
def test_production_vscyto3d_model_instantiates():
    cfg_path = (
        REFERENCE
        / "applications/cytoland/examples/configs/vscyto3d/finetune_a549_infected_4gpu_batched.yml"
    )
    cfg = load_composed_config(cfg_path)
    model_cfg = cfg["model"]
    # drop the HPC checkpoint path (not present here)
    model_cfg["init_args"].pop("ckpt_path", None)
    module = instantiate(model_cfg)
    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.training.losses.mixed_loss import MixedLoss

    assert isinstance(module, VSUNet)
    assert module.architecture == "fcmae"
    assert module.model.in_stack_depth == 15
    assert module.model.dims == (96, 192, 384, 768)
    assert isinstance(module.loss_function, MixedLoss)
    assert module.lr == pytest.approx(2.0e-5)
    # trainer section builds a Trainer with remapped callbacks
    from viscy_tpu.training.cli import build_trainer

    trainer_cfg = dict(cfg["trainer"])
    trainer = build_trainer(trainer_cfg)
    assert trainer.max_epochs == 30


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
def test_reference_recipe_composition():
    """The `base:` recipes of the production config deep-merge correctly."""
    cfg_path = (
        REFERENCE
        / "applications/cytoland/examples/configs/vscyto3d/finetune_a549_infected_4gpu_batched.yml"
    )
    cfg = load_composed_config(cfg_path)
    # from recipes/trainer/fit.yml via base:
    callback_classes = [c["class_path"] for c in cfg["trainer"]["callbacks"]]
    assert any("ModelCheckpoint" in c for c in callback_classes)
    # leaf overrides recipe values
    assert cfg["trainer"]["max_epochs"] == 30
    # private top-level anchors stripped
    assert not any(k.startswith("_") for k in cfg)


_CYTOLAND = REFERENCE / "applications/cytoland/examples/configs"


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
@pytest.mark.parametrize(
    "rel",
    [
        "vscyto2d/finetune.yml",
        "vscyto2d/pretrain.yml",
        "vsneuromast/fit.yml",
        "fnet3d/fit.yml",
    ],
)
def test_other_production_models_instantiate(rel):
    """Every shipped cytoland fit config's model section instantiates."""
    cfg = load_composed_config(_CYTOLAND / rel)
    model_cfg = cfg["model"]
    init_args = model_cfg.get("init_args", {})
    if "ckpt_path" in init_args:
        # the HPC checkpoint is not in this image; encoder-only load
        # depends on it
        init_args.pop("ckpt_path")
        init_args.pop("encoder_only", None)
    module = instantiate(model_cfg)
    assert hasattr(module, "model")
    assert hasattr(module, "training_loss")


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
@pytest.mark.parametrize(
    "rel",
    ["vscyto3d/predict_a549.yml", "vscyto2d/predict.yml", "vsneuromast/predict.yml"],
)
def test_predict_configs_model_and_callbacks(rel):
    path = _CYTOLAND / rel
    if not path.exists():
        pytest.skip(f"{rel} not shipped")
    cfg = load_composed_config(path)
    model_cfg = cfg["model"]
    model_cfg.get("init_args", {}).pop("ckpt_path", None)
    module = instantiate(model_cfg)
    assert hasattr(module, "predict_step")
    for cb in cfg.get("trainer", {}).get("callbacks", []):
        if "PredictionWriter" in cb.get("class_path", ""):
            from viscy_tpu.training.instantiate import resolve_class

            assert resolve_class(cb["class_path"]) is not None


_DYNACLR = REFERENCE / "applications/dynaclr/configs"


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
def test_all_dynaclr_training_configs_instantiate():
    """Every shipped DynaCLR training config's model section instantiates
    (ContrastiveEncoder variants, foundation wrappers, aux-head configs)."""
    paths = sorted((_DYNACLR / "training").rglob("*.yml"))
    assert len(paths) > 20
    failures = {}
    for p in paths:
        try:
            cfg = load_composed_config(p)
            if "model" not in cfg:
                continue
            model_cfg = cfg["model"]
            model_cfg.get("init_args", {}).pop("ckpt_path", None)
            instantiate(model_cfg)
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures[p.name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
def test_dynaclr_prediction_and_evaluation_configs():
    """Shipped prediction/evaluation configs instantiate (one reference
    YAML has a syntax error upstream and is skipped)."""
    import yaml as _yaml

    failures = {}
    for family in ("prediction", "evaluation", "dimensionality_reduction"):
        for p in sorted((_DYNACLR / family).rglob("*.yml")):
            try:
                cfg = load_composed_config(p)
            except _yaml.YAMLError:
                continue  # upstream syntax error (dinov3_temporal_MLP_predict)
            try:
                if "model" in cfg:
                    model_cfg = cfg["model"]
                    model_cfg.get("init_args", {}).pop("ckpt_path", None)
                    instantiate(model_cfg)
            except Exception as e:  # noqa: BLE001
                failures[p.name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
def test_all_dynacell_configs_instantiate():
    """Every dynacell benchmark leaf (423 model configs: DynacellUNet with
    predict tiling, FlowMatching net/transport configs, GAN modernization
    knobs incl. spectral norm) instantiates."""
    paths = sorted(
        (REFERENCE / "applications/cytoland/examples/configs/dynacell").rglob("*.yml")
    )
    paths += sorted((REFERENCE / "applications/dynacell").rglob("configs/**/*.yml"))
    failures = {}
    n_model = 0
    for p in paths:
        try:
            cfg = load_composed_config(p)
            if "model" not in cfg:
                continue
            n_model += 1
            model_cfg = cfg["model"]
            model_cfg.get("init_args", {}).pop("ckpt_path", None)
            instantiate(model_cfg)
        except Exception as e:  # noqa: BLE001
            failures[str(p)] = f"{type(e).__name__}: {e}"
    assert n_model > 300
    assert not failures, dict(list(failures.items())[:5])


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout not mounted")
def test_data_sections_instantiate():
    """Shipped leaf configs' data sections construct (recipe fragments are
    partial by design and excluded)."""
    roots = [
        _DYNACLR / "training",
        _CYTOLAND,
    ]
    failures = {}
    n = 0
    for root in roots:
        for p in sorted(root.rglob("*.yml")):
            if "recipes" in p.parts:
                continue
            try:
                cfg = load_composed_config(p)
            except Exception:
                continue
            data_cfg = cfg.get("data")
            if not isinstance(data_cfg, dict) or "class_path" not in data_cfg:
                continue
            n += 1
            try:
                instantiate(data_cfg)
            except Exception as e:  # noqa: BLE001
                failures[p.name] = f"{type(e).__name__}: {e}"
    assert n > 25
    assert not failures, failures

"""Model export (reference ``viscy_utils/trainer.py:90``: ONNX opset 18).

The TPU-native equivalents:

- ``stablehlo``: serialize the jitted forward with ``jax.export`` (the
  portable XLA interchange format — the ONNX analog for this stack) with
  a dynamic batch dimension;
- ``orbax``: parameter-only checkpoint for downstream JAX consumers.
"""

from __future__ import annotations

import logging
from pathlib import Path

_logger = logging.getLogger("viscy_tpu")


def export_model(module, export_cfg: dict) -> Path:
    import jax
    import jax.numpy as jnp
    import numpy as np

    fmt = export_cfg.get("format", "stablehlo")
    out = Path(export_cfg.get("export_path", "exported_model"))
    out.parent.mkdir(parents=True, exist_ok=True)

    example = module.example_input()
    variables = module.init_variables(jax.random.PRNGKey(0), example)
    ckpt = export_cfg.get("ckpt_path")
    if ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(Path(ckpt).absolute())
        variables = {"params": restored.get("params", restored)} | {
            k: v for k, v in restored.get("extra_vars", {}).items()
        }

    if fmt == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(out.absolute(), jax.device_get(variables), force=True)
        ckptr.wait_until_finished()
        _logger.info(f"Saved orbax parameters to {out}")
        return out

    from jax import export as jax_export

    x = jnp.asarray(example["source"])
    # dynamic batch dimension (reference exports dynamic axes in ONNX)
    batch = jax_export.symbolic_shape("b")[0]
    x_poly = jax.ShapeDtypeStruct((batch, *x.shape[1:]), x.dtype)
    if export_cfg.get("embed_params", False):
        # self-contained artifact (the ONNX analog: weights baked in) —
        # consumers call it with just the input batch, see load_exported
        fn = jax.jit(lambda inp: module.forward(variables, inp))
        exported = jax_export.export(fn)(x_poly)
    else:
        fn = jax.jit(lambda v, inp: module.forward(v, inp))
        exported = jax_export.export(fn)(
            jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
            ),
            x_poly,
        )
    out.write_bytes(exported.serialize())
    _logger.info(f"Serialized StableHLO module to {out}")
    return out


def load_exported(path):
    """Deserialize a StableHLO artifact written by :func:`export_model` and
    return its call function.

    With ``embed_params: true`` exports, the returned function takes only
    the input batch (``fn(x)``); otherwise it takes ``fn(variables, x)``
    with the same variables pytree the model was exported with. The call
    runs on whatever backend is active — the serving path for exported
    models (reference consumers run the ONNX export in onnxruntime;
    ``viscy_utils/trainer.py:90``).
    """
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call

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
    # dynamic axes mirroring the reference ONNX export (trainer.py:124-130:
    # batch_size, num_rows, num_cols; channels/depth stay static — conv
    # weight shapes bake them in). YX are exported as multiples of the
    # model's total stride (the same divisibility contract the predict
    # path guarantees via divisible pad); models without a known stride,
    # or forwards XLA cannot shape-polymorphize, fall back to a static
    # spatial extent with just the batch symbolic.
    stride = getattr(getattr(module, "model", None), "total_stride", None)

    def poly_spec(dims: str):
        sym = jax_export.symbolic_shape(dims)
        b = sym[0]
        if len(sym) == 3:
            h, w = sym[1], sym[2]
            shape = (b, *x.shape[1:-2], stride * h, stride * w)
        else:
            shape = (b, *x.shape[1:])
        return jax.ShapeDtypeStruct(shape, x.dtype)

    x_poly = poly_spec("b, h, w") if stride else poly_spec("b")
    def do_export(spec):
        if export_cfg.get("embed_params", False):
            # self-contained artifact (the ONNX analog: weights baked in) —
            # consumers call it with just the input batch, see load_exported
            fn = jax.jit(lambda inp: module.forward(variables, inp))
            return jax_export.export(fn)(spec)
        fn = jax.jit(lambda v, inp: module.forward(v, inp))
        return jax_export.export(fn)(
            jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
            ),
            spec,
        )

    try:
        exported = do_export(x_poly)
    except Exception as e:
        if not stride:
            raise
        _logger.warning(
            "Shape-polymorphic YX export failed "
            f"({type(e).__name__}: {e}); retrying with static spatial "
            "extents (batch stays dynamic) — the artifact will only "
            "accept the example spatial shape"
        )
        exported = do_export(poly_spec("b"))
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

"""GPipe pipeline parallelism: forward/gradient exactness vs sequential.

Runs on the virtual 8-device CPU mesh (conftest). The reference has no
pipeline parallelism (SURVEY §2.6); these tests pin the TPU-native
extension's semantics: a ``pipe``-sharded stage stack must produce the
same outputs and gradients as applying the stages sequentially on one
device, including when composed with data parallelism on a
``(data, pipe)`` mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from viscy_tpu.parallel.pipeline import (
    gpipe_apply,
    gpipe_spec,
    stack_stage_params,
)

D = 16
S = 4
B = 8


def _stage_fn(params, x):
    return x + jnp.tanh(x @ params["w"] + params["b"])


def _make_params(seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "w": jnp.asarray(rng.normal(0, 0.3, (D, D)), jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.float32),
        }
        for _ in range(S)
    ]


def _sequential(per_stage, x):
    for p in per_stage:
        x = _stage_fn(p, x)
    return x


def _pipe_mesh(data=2, pipe=4):
    dev = np.array(jax.devices()[: data * pipe]).reshape(data, pipe)
    return Mesh(dev, axis_names=("data", "pipe"))


@pytest.mark.parametrize("n_microbatches", [2, 4])
def test_forward_matches_sequential(n_microbatches):
    mesh = _pipe_mesh()
    per_stage = _make_params()
    stacked = jax.device_put(stack_stage_params(per_stage), gpipe_spec(mesh))
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (B, D)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    out = jax.jit(
        lambda p, v: gpipe_apply(_stage_fn, p, v, mesh, n_microbatches)
    )(stacked, xs)
    ref = _sequential(per_stage, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gradients_match_sequential():
    mesh = _pipe_mesh()
    per_stage = _make_params(2)
    stacked_host = stack_stage_params(per_stage)
    stacked = jax.device_put(stacked_host, gpipe_spec(mesh))
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (B, D)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    tgt = jnp.asarray(np.random.default_rng(4).normal(0, 1, (B, D)), jnp.float32)

    def loss_pipe(p, v):
        return jnp.mean((gpipe_apply(_stage_fn, p, v, mesh, 4) - tgt) ** 2)

    def loss_seq(stacked_p, v):
        per = [jax.tree_util.tree_map(lambda a: a[i], stacked_p) for i in range(S)]
        return jnp.mean((_sequential(per, v) - tgt) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked, xs)
    g_seq = jax.grad(loss_seq)(stacked_host, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_checkpointed_stage_same_result():
    mesh = _pipe_mesh()
    per_stage = _make_params(5)
    stacked = jax.device_put(stack_stage_params(per_stage), gpipe_spec(mesh))
    x = jnp.asarray(np.random.default_rng(6).normal(0, 1, (B, D)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out1 = jax.jit(
        lambda p, v: gpipe_apply(_stage_fn, p, v, mesh, 4, checkpoint_stage=True)
    )(stacked, xs)
    ref = _sequential(per_stage, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), atol=1e-6)


def test_bad_microbatch_count_raises():
    mesh = _pipe_mesh()
    per_stage = _make_params()
    stacked = jax.device_put(stack_stage_params(per_stage), gpipe_spec(mesh))
    x = jnp.zeros((B, D), jnp.float32)
    with pytest.raises(ValueError):
        gpipe_apply(_stage_fn, stacked, x, mesh, 3)


def test_pipeline_vit_transformer_blocks():
    """The real ViT bottleneck block stack pipelined vs applied sequentially."""
    from viscy_tpu.models.celldiff.vit_bottleneck import TransformerBlock
    from viscy_tpu.parallel.pipeline import pipeline_vit_blocks

    hidden, heads, L = 32, 4, 4
    block = TransformerBlock(hidden, heads, conditioned=True)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.normal(0, 1, (B, 10, hidden)), jnp.float32)
    cond = jnp.asarray(rng.normal(0, 1, (B, hidden)), jnp.float32)
    params = [
        block.init(jax.random.PRNGKey(i), tokens, cond)["params"] for i in range(L)
    ]

    def apply_block(p, t, c):
        return block.apply({"params": p}, t, c)

    ref = tokens
    for p in params:
        ref = apply_block(p, ref, cond)

    mesh = _pipe_mesh()
    out = jax.jit(
        lambda bp, t, c: pipeline_vit_blocks(bp, apply_block, t, c, mesh, 4)
    )(params, tokens, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_vit_blocks_grouped_stages():
    """8 blocks over 4 stages (2 blocks per stage)."""
    from viscy_tpu.models.celldiff.vit_bottleneck import TransformerBlock
    from viscy_tpu.parallel.pipeline import pipeline_vit_blocks

    hidden, heads, L = 16, 2, 8
    block = TransformerBlock(hidden, heads, conditioned=False)
    rng = np.random.default_rng(8)
    tokens = jnp.asarray(rng.normal(0, 1, (B, 6, hidden)), jnp.float32)
    params = [block.init(jax.random.PRNGKey(i), tokens)["params"] for i in range(L)]

    def apply_block(p, t, c):
        return block.apply({"params": p}, t)

    ref = tokens
    for p in params:
        ref = apply_block(p, ref, None)

    mesh = _pipe_mesh()
    out = jax.jit(
        lambda bp, t: pipeline_vit_blocks(bp, apply_block, t, None, mesh, 2)
    )(params, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

"""Data-parallel correctness on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.parallel.mesh import local_batch_slice, make_mesh, replicate, shard_batch
from viscy_tpu.training.state import TrainState


def _setup(n_devices):
    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.training.losses.mixed_loss import MixedLoss

    module = VSUNet(
        architecture="fcmae",
        model_config=dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=(1, 1, 1, 1),
            dims=(8, 16, 32, 64),
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
            pretraining=False,
        ),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    rngs = np.random.default_rng(0)
    batch = {
        "source": rngs.random((8, 1, 5, 32, 32), np.float32),
        "target": rngs.random((8, 1, 5, 32, 32), np.float32),
    }
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    tx, _ = module.configure_optimizers(10)
    mesh = make_mesh(data=n_devices, model=1, devices=jax.devices()[:n_devices])
    state = replicate(TrainState.create(variables, tx), mesh)
    return module, state, batch, mesh


def _step_fn(module):
    def step(state, batch, rng):
        def loss_fn(params):
            loss, _ = module.training_loss(
                {"params": params, **state.extra_vars}, batch, rng
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(step)


def test_dp_matches_single_device():
    """The same global batch gives the same loss and updated params whether
    sharded over 8 devices or run on 1 — gradient allreduce is exact."""
    rng = jax.random.PRNGKey(1)
    results = {}
    for n in (1, 8):
        module, state, batch, mesh = _setup(n)
        step = _step_fn(module)
        sharded = shard_batch(batch, mesh)
        # batch sharding really spans the mesh
        if n == 8:
            assert len(sharded["source"].sharding.device_set) == 8
        state, loss = step(state, sharded, rng)
        results[n] = (
            float(jax.device_get(loss)),
            jax.device_get(jax.tree_util.tree_leaves(state.params)[0]),
        )
    assert results[1][0] == pytest.approx(results[8][0], rel=1e-5)
    np.testing.assert_allclose(results[1][1], results[8][1], rtol=1e-4, atol=1e-6)


def test_local_batch_slice_partition():
    slices = [local_batch_slice(103, process_index=i) for i in range(4)]
    # override process_count via monkeypatched function args is not possible;
    # single-process: full slice
    assert slices[0].stop is not None


def test_shard_batch_replicates_indivisible():
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    batch = {"x": np.zeros((7, 3), np.float32)}  # 7 not divisible by 8
    out = shard_batch(batch, mesh)
    # replicated, not sharded
    assert out["x"].sharding.is_fully_replicated


def _run_steps(module, state, batch, mesh, n_steps=2):
    step = _step_fn(module)
    sharded = shard_batch(batch, mesh)
    loss = None
    for i in range(n_steps):
        state, loss = step(state, sharded, jax.random.PRNGKey(7 + i))
    return float(jax.device_get(loss)), state


def test_fsdp_matches_replicated():
    from viscy_tpu.parallel.sharding_rules import infer_param_sharding, shard_train_state

    module, state, batch, mesh = _setup(8)
    loss_rep, state_rep = _run_steps(module, state, batch, mesh)

    module2, state2, _, mesh2 = _setup(8)
    shardings = infer_param_sharding(state2.params, mesh2, "fsdp", min_elems=2**10)
    sharded_specs = {
        s.spec for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
    }
    assert any(spec != jax.sharding.PartitionSpec() for spec in sharded_specs), (
        "expected at least one sharded tensor"
    )
    state2 = shard_train_state(state2, mesh2, "fsdp", min_elems=2**10)
    loss_fsdp, state_fsdp = _run_steps(module2, state2, batch, mesh2)
    assert loss_fsdp == pytest.approx(loss_rep, rel=1e-4)
    p_rep = jax.device_get(jax.tree_util.tree_leaves(state_rep.params)[0])
    p_fsdp = jax.device_get(jax.tree_util.tree_leaves(state_fsdp.params)[0])
    np.testing.assert_allclose(p_rep, p_fsdp, rtol=1e-4, atol=1e-5)


def test_tp_model_axis():
    from viscy_tpu.parallel.sharding_rules import shard_train_state

    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.training.losses.mixed_loss import MixedLoss

    module = VSUNet(
        architecture="fcmae",
        model_config=dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=(1, 1, 1, 1),
            dims=(8, 16, 32, 64),
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
            pretraining=False,
        ),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    rngs = np.random.default_rng(0)
    batch = {
        "source": rngs.random((8, 1, 5, 32, 32), np.float32),
        "target": rngs.random((8, 1, 5, 32, 32), np.float32),
    }
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    tx, _ = module.configure_optimizers(10)

    # replicated single-device truth
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state1 = replicate(TrainState.create(variables, tx), mesh1)
    loss_ref, _ = _run_steps(module, state1, batch, mesh1)

    # 4-way data x 2-way tensor parallel
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    state = TrainState.create(variables, tx)
    state = shard_train_state(state, mesh, "tp", min_elems=2**10)
    loss_tp, _ = _run_steps(module, state, batch, mesh)
    assert loss_tp == pytest.approx(loss_ref, rel=1e-4)


def test_dp_predict_matches_single_device():
    """Sliding-window inference shards batches over the data axis with a
    replicated state (trainer.predict -> shard_batch): per-window outputs
    are identical to the single-device forward (SURVEY §5: large-volume
    inference scales across chips over ICI)."""
    module, state, batch, mesh8 = _setup(8)
    pred_fn = jax.jit(lambda state, batch: module.predict_step(state.variables, batch))
    sharded = shard_batch({"source": batch["source"]}, mesh8)
    assert len(sharded["source"].sharding.device_set) == 8
    out8 = jax.device_get(pred_fn(state, sharded))

    module1, state1, _, mesh1 = _setup(1)
    single = shard_batch({"source": batch["source"]}, mesh1)
    out1 = jax.device_get(pred_fn(state1, single))
    np.testing.assert_allclose(out8, out1, rtol=1e-5, atol=1e-6)


def _with_mesh(n, fn):
    """Run fn with an active n-device mesh, restoring the previous mesh."""
    from viscy_tpu.parallel import mesh as mesh_mod

    prev = mesh_mod._ACTIVE_MESH
    try:
        mesh_mod.make_mesh(data=n, model=1, devices=jax.devices()[:n])
        return fn()
    finally:
        mesh_mod._ACTIVE_MESH = prev


def test_data_parallel_call_fused_kernel_matches_direct():
    """The shard_map wrapper around the fused MLP kernel (Pallas/Mosaic has
    no GSPMD partitioning rule) is value-identical to the direct call."""
    from viscy_tpu.ops.pallas.fused_block import fused_mlp_grn
    from viscy_tpu.parallel.mesh import data_parallel_call

    rng = np.random.default_rng(0)
    b, s, c, m = 8, 32, 16, 48
    x = jnp.asarray(rng.normal(0, 1, (b, s, c)).astype(np.float32))
    sc = jnp.asarray(rng.normal(0, 1, (b, s, c)).astype(np.float32))
    params = (
        jnp.ones((c,)), jnp.zeros((c,)),
        jnp.asarray(rng.normal(0, 0.1, (c, m)).astype(np.float32)), jnp.zeros((m,)),
        jnp.zeros((m,)), jnp.zeros((m,)),
        jnp.asarray(rng.normal(0, 0.1, (m, c)).astype(np.float32)), jnp.zeros((c,)),
    )
    fn = lambda xb, sb, *p: fused_mlp_grn(xb, sb, *p, interpret=True)
    direct = fn(x, sc, *params)
    wrapped = _with_mesh(8, lambda: data_parallel_call(fn, (x, sc), params))
    np.testing.assert_allclose(np.asarray(wrapped), np.asarray(direct), rtol=1e-6)
    # indivisible batch falls back to the direct call
    odd = _with_mesh(8, lambda: data_parallel_call(fn, (x[:3], sc[:3]), params))
    np.testing.assert_allclose(np.asarray(odd), np.asarray(direct[:3]), rtol=1e-6)


def test_data_parallel_call_warp_matches_direct():
    """The Pallas affine warp under shard_map equals the direct call."""
    from viscy_tpu.ops.pallas.warp3d import affine_warp_3d_pallas
    from viscy_tpu.parallel.mesh import data_parallel_call

    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random((8, 1, 8, 40, 40), np.float32))
    mats = jnp.tile(jnp.eye(3, 4, dtype=jnp.float32), (8, 1, 1))
    mats = mats.at[:, 1, 3].set(jnp.linspace(-2, 2, 8))
    fn = lambda v, m: affine_warp_3d_pallas(v, m, (6, 32, 32), kz=3, interpret=True)
    direct = fn(vol, mats)
    wrapped = _with_mesh(8, lambda: data_parallel_call(fn, (vol, mats)))
    np.testing.assert_allclose(np.asarray(wrapped), np.asarray(direct), rtol=1e-6)


def test_fused_model_dp_under_active_mesh():
    """Full FCMAE forward with fused_mlp=True on a sharded batch under an
    active 8-device mesh (the fused call routes through shard_map inside
    the jitted forward) matches the meshless forward."""
    from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
    from viscy_tpu.ops.pallas import fused_block as fb

    cfg = dict(
        in_channels=1,
        out_channels=1,
        encoder_blocks=(1, 1, 1, 1),
        dims=(8, 16, 32, 64),
        stem_kernel_size=(5, 4, 4),
        in_stack_depth=5,
        pretraining=False,
        fused_mlp=True,
    )
    model = FullyConvolutionalMAE(**cfg)
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (8, 1, 5, 32, 32)).astype(np.float32)
    )
    fb.FORCE_INTERPRET = True
    try:
        v = model.init(jax.random.PRNGKey(0), x)
        y_ref = jax.device_get(model.apply(v, x))

        def run():
            mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
            xs = shard_batch({"x": x}, mesh)["x"]
            assert len(xs.sharding.device_set) == 8
            vr = replicate(v, mesh)
            return jax.device_get(jax.jit(model.apply)(vr, xs))

        y_mesh = _with_mesh(8, run)
        np.testing.assert_allclose(y_mesh, y_ref, rtol=1e-5, atol=1e-6)
    finally:
        fb.FORCE_INTERPRET = False


def test_sharded_fov_forward_matches_unsharded():
    """Spatially sharded full-FOV inference (Y split over the data axis,
    GSPMD conv halo exchanges) is exact vs the single-device forward,
    including an uneven deepest-stage extent (288/32 = 9 rows over 8
    shards), and the min_height guard falls back bit-identically."""
    from viscy_tpu.apps.cytoland.prediction import sharded_fov_forward

    module, state, _, _ = _setup(1)
    src = jnp.asarray(
        np.random.default_rng(3).random((1, 1, 5, 288, 64), np.float32)
    )
    fwd = lambda s: module._pad_forward_crop(state.variables, s)
    ref = jax.device_get(fwd(src))

    def run():
        mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
        out = sharded_fov_forward(fwd, src, min_height=256, mesh=mesh)
        assert len(out.sharding.device_set) == 8
        return jax.device_get(out)

    out8 = _with_mesh(8, run)
    assert out8.shape == ref.shape
    np.testing.assert_allclose(out8, ref, rtol=1e-5, atol=1e-6)
    # no active mesh: plain fallback, bit-identical
    from viscy_tpu.parallel import mesh as mesh_mod

    prev = mesh_mod._ACTIVE_MESH
    mesh_mod._ACTIVE_MESH = None
    try:
        fallback = jax.device_get(sharded_fov_forward(fwd, src, min_height=256))
    finally:
        mesh_mod._ACTIVE_MESH = prev
    np.testing.assert_array_equal(fallback, ref)
    # min_height guard (GSPMD near-empty-shard edge): short FOV falls back
    guarded = _with_mesh(
        8,
        lambda: jax.device_get(
            sharded_fov_forward(
                fwd,
                src,
                mesh=make_mesh(data=8, model=1, devices=jax.devices()[:8]),
                min_height=512,
            )
        ),
    )
    np.testing.assert_array_equal(guarded, ref)


def test_vsunet_fov_shard_predict_step():
    """VSUNet(fov_shard=True) routes predict_step through the spatially
    sharded path under an active multi-device mesh (taking precedence
    over tile_yx) and matches the meshless full-frame prediction, also
    under jit (the trainer jits predict_step)."""
    module, state, _, _ = _setup(1)
    module.fov_shard = True
    module.tile_yx = (32, 32)  # would tile; fov_shard must take precedence
    src = jnp.asarray(
        np.random.default_rng(4).random((1, 1, 5, 288, 64), np.float32)
    )
    module.fov_shard = False
    ref = jax.device_get(module._full_frame_predict(state.variables, {"source": src}))
    module.fov_shard = True

    def run():
        mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
        # the trainer replicates state over the active mesh before predict
        vr = replicate(state.variables, mesh)
        eager = module.predict_step(vr, {"source": src})
        jitted = jax.jit(module.predict_step)(vr, {"source": src})
        return jax.device_get(eager), jax.device_get(jitted)

    eager, jitted = _with_mesh(8, run)
    np.testing.assert_allclose(eager, ref, rtol=1e-5, atol=1e-6)
    # GSPMD reduction-order noise under the fully jitted path
    np.testing.assert_allclose(jitted, ref, rtol=1e-4, atol=1e-5)

"""Pallas TPU kernel: two-pass fused ConvNeXt-v2 MLP with GRN.

The production train step is HBM-bound (docs/STATUS.md round-3 roofline:
131 GB/step vs a 819 GB/s chip — 160 ms memory floor against a 26 ms
compute floor). The single largest activation traffic is the ConvNeXt
block MLP: its ``mlp_ratio=4`` expansion tensors (e.g. 566 MB bf16 at the
decoder's 96x96x480 stage for batch 16) are materialized by XLA because
the GRN's *global* spatial L2 statistics consume fc1's full output before
the pointwise apply — fc1 -> (write, read-for-stats, read-for-apply,
write-apply, read-by-fc2) is ~2.8 GB/block forward and about twice that
backward.

This kernel removes every 4C-wide materialization by recomputing fc1
inside VMEM (the step has ~6x compute headroom, so trading FLOPs for
bytes is the right direction on this roofline):

- **fwd pass A** (stats): per spatial tile, LN -> fc1 -> gelu in VMEM,
  accumulate the GRN sum-of-squares ``ss[b, m]`` (f32); only ``ss``
  (B x 4C) leaves the chip.
- **fwd pass B** (apply): recompute the tile, apply GRN with the now
  known ``nx``, fc2, add the residual, write the block output. HBM
  traffic: read x twice + shortcut once, write out once.
- **bwd pass C** (global grads): recompute the tile, form
  ``dy = g @ w2^T`` in VMEM, accumulate ``P[b,m] = sum_s dy*v`` (the GRN
  stat cotangent), ``dw2``, ``db2``, ``dbeta_g``.
- **bwd pass D** (main): recompute again, combine the (tiny) per-(b, m)
  GRN coefficients computed on-host from pass C, run the fc1/LN backward
  per tile, write ``dx`` and accumulate ``dw1/db1/dln``.

All matmuls run on the MXU in the block's compute dtype (bf16 on the
flagship) with f32 accumulation; LN/GRN statistics and every parameter
gradient accumulate in f32. Value semantics replicate
``models/components/blocks.ConvNeXtBlock`` op-for-op (same dtype
promotion order, exact erf gelu), so the fused path is checkpoint- and
parity-compatible; hand-derived VJP equals autodiff of the unfused block
to fp32 roundoff (pinned in tests/test_fused_block.py).

Reference behavior being accelerated: the timm ConvNeXt-v2 block used by
``/root/reference/packages/viscy-models/src/viscy_models/unet/unext2.py``
and ``fcmae.py:144`` (MaskedConvNeXtV2Block: dwconv -> LN -> pwconv1 ->
act -> GRN -> pwconv2 -> residual).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# test hook (mirrors transforms.affine._pallas_interpret): when True the
# model-integrated fused path runs in interpret mode on CPU instead of
# falling back to the unfused modules
FORCE_INTERPRET = False

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def pick_s_tile(s: int, cap: int) -> int | None:
    """Largest multiple-of-8 divisor of ``s`` not exceeding ``cap``.

    Edge tiles are avoided entirely (no masking in the kernels); callers
    fall back to the unfused path when no divisor exists.
    """
    for d in range(min(cap, s), 7, -1):
        if s % d == 0 and d % 8 == 0:
            return d
    return None


def fits_vmem(s: int, c: int, m: int, bwd_tile_cap: int = 256, budget: int = 14 << 20) -> bool:
    """Rough VMEM bound for the heaviest pass (bwd main): both weight
    matrices (compute dtype) + the f32 ``dw1`` accumulator + the per-tile
    activation buffers must fit. Blocks over budget (e.g. the 768->3072
    encoder bottleneck, whose spatial map is tiny anyway) fall back to the
    unfused path."""
    ts = pick_s_tile(s, bwd_tile_cap) or s
    weights = 2 * c * m * 2 + c * m * 4
    tiles = 8 * ts * m + 14 * ts * c
    return weights + tiles <= budget


# XLA's own f32 erf rational approximation (Cephes-style, ErfImpl32 in
# xla/hlo/builder/lib/math.cc): Mosaic has no lowering for the erf
# primitive, so the kernels evaluate the same polynomial XLA expands it
# to — measured max |diff| vs jax.lax.erf is 4.2e-7 over [-6, 6]. The
# clamp bound is erfinv(1 - 2^-23): past it the polynomial matches XLA's
# expansion bit-for-bit, which in f32 evaluates to +/-(1 + 2^-23) — one
# ULP past 1, NOT saturated at exactly +/-1. GELU only consumes
# 0.5*(1+erf), so the overshoot is harmless here; add a final clip if a
# strict [-1, 1] range is ever required.
_ERF_ALPHA = (
    0.00022905065861350646,
    0.0034082910107109506,
    0.050955695062380861,
    0.18520832239976145,
    1.128379143519084,
)
_ERF_BETA = (
    -1.1791602954361697e-7,
    0.000023547966471313185,
    0.0010179625278914885,
    0.014070470171167667,
    0.11098505178285362,
    0.49746925110067538,
    1.0,
)
_ERF_CLAMP = 3.832506856900711  # erfinv(1 - 2^-23)


def _erf_f32(x32: Array) -> Array:
    x32 = jnp.clip(x32, -_ERF_CLAMP, _ERF_CLAMP)
    x2 = x32 * x32

    def poly(cs):
        r = jnp.full_like(x2, cs[0])
        for c in cs[1:]:
            r = r * x2 + c
        return r

    return x32 * poly(_ERF_ALPHA) / poly(_ERF_BETA)


def _erf(x: Array) -> Array:
    # matches XLA's erf-on-narrow-dtype behavior: upcast to f32, evaluate,
    # round back to the input dtype
    return _erf_f32(x.astype(jnp.float32)).astype(x.dtype)


def _gelu_exact(u: Array) -> Array:
    # jax.nn.gelu(approximate=False) on the compute dtype
    return (u * (_erf(u / _SQRT2) + 1) / 2).astype(u.dtype)


def _gelu_grad_f32(u32: Array) -> Array:
    phi = jnp.exp(-0.5 * u32 * u32) * _INV_SQRT_2PI
    cdf = 0.5 * (_erf_f32(u32 / _SQRT2) + 1.0)
    return cdf + u32 * phi


def _ln_fc1_gelu(x_tile, ln_s_ref, ln_b_ref, w1_ref, b1_ref, eps_ln, cdt):
    """LN -> fc1 -> exact gelu for one (ts, C) tile; returns (v, u, xhat,
    rstd) with v/u in the compute dtype and xhat/rstd f32."""
    x32 = x_tile.astype(jnp.float32)
    mu = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps_ln)
    xc = x32 - mu
    xhat = xc * rstd
    # flax _normalize combines rsqrt*scale before multiplying
    ln = (xc * (rstd * ln_s_ref[...].astype(jnp.float32)) + ln_b_ref[...].astype(jnp.float32)).astype(cdt)
    u = (
        jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32).astype(cdt)
        + b1_ref[...].astype(cdt)
    )
    return _gelu_exact(u), u, ln, xhat, rstd


def _stats_kernel(*refs, eps_ln, cdt, has_mask):
    if has_mask:
        x_ref, mk_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, ss_ref = refs
    else:
        x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, ss_ref = refs
    t = pl.program_id(1)
    v, _, _, _, _ = _ln_fc1_gelu(x_ref[0], ln_s_ref, ln_b_ref, w1_ref, b1_ref, eps_ln, cdt)
    if has_mask:
        # MaskedGRN: statistics over mask-zeroed activations (fcmae.py:66)
        v = v * mk_ref[0]
    v32 = v.astype(jnp.float32)

    @pl.when(t == 0)
    def _init():
        ss_ref[...] = jnp.zeros_like(ss_ref)

    ss_ref[0] += jnp.sum(v32 * v32, axis=0, keepdims=True)


def _apply_kernel(*refs, eps_ln, cdt, has_mask):
    if has_mask:
        (
            x_ref,
            sc_ref,
            mk_ref,
            ln_s_ref,
            ln_b_ref,
            w1_ref,
            b1_ref,
            nxb_ref,
            gg_ref,
            gb_ref,
            w2_ref,
            b2_ref,
            out_ref,
        ) = refs
    else:
        (
            x_ref,
            sc_ref,
            ln_s_ref,
            ln_b_ref,
            w1_ref,
            b1_ref,
            nxb_ref,
            gg_ref,
            gb_ref,
            w2_ref,
            b2_ref,
            out_ref,
        ) = refs
    v, _, _, _, _ = _ln_fc1_gelu(x_ref[0], ln_s_ref, ln_b_ref, w1_ref, b1_ref, eps_ln, cdt)
    # GRN apply, replicating blocks.GRN dtype promotion: t = v*nx in the
    # compute dtype, then f32 (gamma/beta are f32 params), cast back at fc2
    t = v * nxb_ref[0]
    y32 = gg_ref[...].astype(jnp.float32) * t.astype(jnp.float32) + gb_ref[...].astype(
        jnp.float32
    ) + v.astype(jnp.float32)
    y = y32.astype(cdt)
    z = (
        jnp.dot(y, w2_ref[...], preferred_element_type=jnp.float32).astype(cdt)
        + b2_ref[...].astype(cdt)
    )
    if has_mask:
        # masked block zeroes the MLP branch before the residual add
        z = z * mk_ref[0]
    out_ref[0] = sc_ref[0] + z


def _bwd_stats_kernel(*refs, eps_ln, cdt, has_mask):
    if has_mask:
        (
            x_ref,
            g_ref,
            mk_ref,
            ln_s_ref,
            ln_b_ref,
            w1_ref,
            b1_ref,
            nxb_ref,
            gg_ref,
            gb_ref,
            w2_ref,
            p_ref,
            dbg_ref,
            dw2_ref,
            db2_ref,
        ) = refs
    else:
        (
            x_ref,
            g_ref,
            ln_s_ref,
            ln_b_ref,
            w1_ref,
            b1_ref,
            nxb_ref,
            gg_ref,
            gb_ref,
            w2_ref,
            p_ref,
            dbg_ref,
            dw2_ref,
            db2_ref,
        ) = refs
    b = pl.program_id(0)
    t = pl.program_id(1)
    step = b * pl.num_programs(1) + t
    v, _, _, _, _ = _ln_fc1_gelu(x_ref[0], ln_s_ref, ln_b_ref, w1_ref, b1_ref, eps_ln, cdt)
    dz = g_ref[0].astype(cdt)
    if has_mask:
        dz = dz * mk_ref[0]
    # dy = dz @ w2^T: contract the C axis of both
    dy = jax.lax.dot_general(
        dz, w2_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    v32 = v.astype(jnp.float32)
    tm = v * nxb_ref[0]
    y = (
        gg_ref[...].astype(jnp.float32) * tm.astype(jnp.float32)
        + gb_ref[...].astype(jnp.float32)
        + v32
    ).astype(cdt)

    @pl.when(t == 0)
    def _init_b():
        p_ref[...] = jnp.zeros_like(p_ref)

    @pl.when(step == 0)
    def _init():
        dbg_ref[...] = jnp.zeros_like(dbg_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    p_ref[0] += jnp.sum(dy * v32, axis=0, keepdims=True)
    dbg_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    # dw2 += y^T @ dz (contract the tile axis)
    dw2_ref[...] += jax.lax.dot_general(
        y, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[...] += jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)


def _bwd_main_kernel(*refs, eps_ln, cdt, has_mask):
    if has_mask:
        (
            x_ref,
            g_ref,
            mk_ref,
            ln_s_ref,
            ln_b_ref,
            w1_ref,
            b1_ref,
            w2_ref,
            coef1_ref,
            coef2_ref,
            dx_ref,
            dw1_ref,
            db1_ref,
            dls_ref,
            dlb_ref,
        ) = refs
    else:
        (
            x_ref,
            g_ref,
            ln_s_ref,
            ln_b_ref,
            w1_ref,
            b1_ref,
            w2_ref,
            coef1_ref,
            coef2_ref,
            dx_ref,
            dw1_ref,
            db1_ref,
            dls_ref,
            dlb_ref,
        ) = refs
    b = pl.program_id(0)
    t = pl.program_id(1)
    step = b * pl.num_programs(1) + t
    v, u, ln, xhat, rstd = _ln_fc1_gelu(
        x_ref[0], ln_s_ref, ln_b_ref, w1_ref, b1_ref, eps_ln, cdt
    )
    dz = g_ref[0].astype(cdt)
    if has_mask:
        dz = dz * mk_ref[0]
    dy = jax.lax.dot_general(
        dz, w2_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    v32 = v.astype(jnp.float32)
    if has_mask:
        # stats path saw v*m, so its cotangent carries m^2 (m is 0/1)
        mk32 = mk_ref[0].astype(jnp.float32)
        stats_v = v32 * (mk32 * mk32)
    else:
        stats_v = v32
    dv32 = dy * coef1_ref[0] + stats_v * coef2_ref[0]
    du32 = dv32 * _gelu_grad_f32(u.astype(jnp.float32))
    du = du32.astype(cdt)

    @pl.when(step == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    # dw1 += ln^T @ du (contract the tile axis)
    dw1_ref[...] += jax.lax.dot_general(
        ln, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[...] += jnp.sum(du32, axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        du, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dls_ref[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * ln_s_ref[...].astype(jnp.float32)
    mean_d = jnp.mean(dxhat, axis=1, keepdims=True)
    mean_dx = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx32 = rstd * (dxhat - mean_d - xhat * mean_dx)
    dx_ref[0] = dx32.astype(dx_ref.dtype)


def _row(shape_m):
    return (1, shape_m)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape))


def _tile_spec(ts, c):
    return pl.BlockSpec((1, ts, c), lambda b, t: (b, t, 0))


def _perb_spec(m):
    # per-sample row carried as (B, 1, M): Mosaic requires the block's last
    # two dims be (8, 128)-divisible OR equal to the array dims — a (1, M)
    # block over a (B, M) array violates the sublane rule on real TPUs
    # (interpret mode does not check it), while (1, 1, M) over (B, 1, M)
    # satisfies it exactly
    return pl.BlockSpec((1, 1, m), lambda b, t: (b, 0, 0))


def _mask_spec(ts):
    # mask carried as (B, S, 1) for the same sublane-rule reason
    return pl.BlockSpec((1, ts, 1), lambda b, t: (b, t, 0))


def _fixed_spec(shape):
    return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp_grn(cfg, x, shortcut, mask, ln_s, ln_b, w1, b1, gg, gb, w2, b2):
    out, _ = _fwd(cfg, x, shortcut, mask, ln_s, ln_b, w1, b1, gg, gb, w2, b2)
    return out


def _grn_coeffs(ss, gg, eps_grn):
    """nx (and friends) from the sum-of-squares; all (B, M) f32."""
    gx = jnp.sqrt(ss)
    m = jnp.mean(gx, axis=-1, keepdims=True) + eps_grn
    nx = gx / m
    return gx, m, nx


def _fwd(cfg, x, shortcut, mask, ln_s, ln_b, w1, b1, gg, gb, w2, b2):
    (eps_ln, eps_grn, fwd_cap, bwd_cap, interpret) = cfg
    bsz, s, c = x.shape
    m = w1.shape[1]
    cdt = x.dtype
    ts = pick_s_tile(s, fwd_cap)
    w1c, b1c, w2c, b2c = (a.astype(cdt) for a in (w1, b1, w2, b2))
    grid = (bsz, s // ts)
    has_mask = mask is not None
    kw = dict(eps_ln=eps_ln, cdt=cdt, has_mask=has_mask)
    mask_in = []
    mask_spec = []
    if has_mask:
        mask_in = [mask.astype(cdt)[..., None]]
        mask_spec = [_mask_spec(ts)]
    ss3 = pl.pallas_call(
        functools.partial(_stats_kernel, **kw),
        grid=grid,
        in_specs=[
            _tile_spec(ts, c),
            *mask_spec,
            _fixed_spec((c,)),
            _fixed_spec((c,)),
            _fixed_spec((c, m)),
            _fixed_spec((m,)),
        ],
        out_specs=_perb_spec(m),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, m), jnp.float32),
        interpret=interpret,
    )(x, *mask_in, ln_s, ln_b, w1c, b1c)
    ss = ss3[:, 0]
    _, _, nx = _grn_coeffs(ss, gg, eps_grn)
    nxb = nx.astype(cdt)[:, None]
    out = pl.pallas_call(
        functools.partial(_apply_kernel, **kw),
        grid=grid,
        in_specs=[
            _tile_spec(ts, c),
            _tile_spec(ts, c),
            *mask_spec,
            _fixed_spec((c,)),
            _fixed_spec((c,)),
            _fixed_spec((c, m)),
            _fixed_spec((m,)),
            _perb_spec(m),
            _fixed_spec((m,)),
            _fixed_spec((m,)),
            _fixed_spec((m, c)),
            _fixed_spec((c,)),
        ],
        out_specs=_tile_spec(ts, c),
        out_shape=jax.ShapeDtypeStruct((bsz, s, c), cdt),
        interpret=interpret,
    )(x, shortcut, *mask_in, ln_s, ln_b, w1c, b1c, nxb, gg, gb, w2c, b2c)
    return out, (x, mask, ln_s, ln_b, w1, b1, gg, gb, w2, b2, ss)


def _bwd(cfg, res, g):
    (eps_ln, eps_grn, fwd_cap, bwd_cap, interpret) = cfg
    x, mask, ln_s, ln_b, w1, b1, gg, gb, w2, b2, ss = res
    bsz, s, c = x.shape
    m = w1.shape[1]
    cdt = x.dtype
    ts = pick_s_tile(s, bwd_cap)
    w1c, b1c, w2c, b2c = (a.astype(cdt) for a in (w1, b1, w2, b2))
    grid = (bsz, s // ts)
    has_mask = mask is not None
    kw = dict(eps_ln=eps_ln, cdt=cdt, has_mask=has_mask)
    mask_in = []
    mask_spec = []
    if has_mask:
        mask_in = [mask.astype(cdt)[..., None]]
        mask_spec = [_mask_spec(ts)]
    gx, mn, nx = _grn_coeffs(ss, gg, eps_grn)
    nxb = nx.astype(cdt)[:, None]
    p3, dbg_row, dw2, db2_row = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, **kw),
        grid=grid,
        in_specs=[
            _tile_spec(ts, c),
            _tile_spec(ts, c),
            *mask_spec,
            _fixed_spec((c,)),
            _fixed_spec((c,)),
            _fixed_spec((c, m)),
            _fixed_spec((m,)),
            _perb_spec(m),
            _fixed_spec((m,)),
            _fixed_spec((m,)),
            _fixed_spec((m, c)),
        ],
        out_specs=[
            _perb_spec(m),
            _fixed_spec((1, m)),
            _fixed_spec((m, c)),
            _fixed_spec((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((m, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, *mask_in, ln_s, ln_b, w1c, b1c, nxb, gg, gb, w2c)
    p = p3[:, 0]
    gg32 = gg.astype(jnp.float32)
    # GRN cotangents from the accumulated P[b, m] = sum_s dy * v:
    #   A = dnx = gamma * P;     dgamma = sum_b P * nx;   dbeta from pass C
    a_nx = gg32 * p
    dgg = jnp.sum(p * nx, axis=0)
    # nx = gx / mean(gx + eps): dgx = A/m - sum_k(A_k gx_k)/(M m^2)
    dgx = a_nx / mn - jnp.sum(a_nx * gx, axis=-1, keepdims=True) / (m * mn * mn)
    # through gx = sqrt(sum v^2): dv += v * dgx / gx (0 where gx == 0)
    coef2 = jnp.where(gx > 0, dgx / jnp.maximum(gx, 1e-30), 0.0)
    coef1 = gg32 * nx + 1.0
    dx, dw1, db1_row, dls_row, dlb_row = pl.pallas_call(
        functools.partial(_bwd_main_kernel, **kw),
        grid=grid,
        in_specs=[
            _tile_spec(ts, c),
            _tile_spec(ts, c),
            *mask_spec,
            _fixed_spec((c,)),
            _fixed_spec((c,)),
            _fixed_spec((c, m)),
            _fixed_spec((m,)),
            _fixed_spec((m, c)),
            _perb_spec(m),
            _perb_spec(m),
        ],
        out_specs=[
            _tile_spec(ts, c),
            _fixed_spec((c, m)),
            _fixed_spec((1, m)),
            _fixed_spec((1, c)),
            _fixed_spec((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, c), cdt),
            jax.ShapeDtypeStruct((c, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, *mask_in, ln_s, ln_b, w1c, b1c, w2c, coef1[:, None], coef2[:, None])
    dsc = g.astype(x.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (
        dx,
        dsc,
        dmask,
        dls_row[0].astype(ln_s.dtype),
        dlb_row[0].astype(ln_b.dtype),
        dw1.astype(w1.dtype),
        db1_row[0].astype(b1.dtype),
        dgg.astype(gg.dtype),
        dbg_row[0].astype(gb.dtype),
        dw2.astype(w2.dtype),
        db2_row[0].astype(b2.dtype),
    )


_fused_mlp_grn.defvjp(_fwd, _bwd)


def fused_mlp_grn(
    x: Array,
    shortcut: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    grn_gamma: Array,
    grn_beta: Array,
    w2: Array,
    b2: Array,
    *,
    mask: Array | None = None,
    eps_ln: float = 1e-6,
    eps_grn: float = 1e-6,
    fwd_tile_cap: int = 512,
    bwd_tile_cap: int = 256,
    interpret: bool = False,
) -> Array:
    """``shortcut + fc2(GRN(gelu(fc1(LN(x)))))`` without materializing any
    ``mlp_ratio``-wide tensor in HBM.

    ``x``/``shortcut`` are ``(B, S, C)`` (spatial flattened) in the
    block's compute dtype; parameters keep their natural (f32) dtype and
    are cast to the compute dtype exactly where the unfused flax modules
    cast them. ``mask`` (0/1 floats, ``(B, S)``) enables the FCMAE masked
    semantics: GRN statistics over mask-zeroed activations and the MLP
    branch zeroed before the residual add (MaskedConvNeXtV2Block,
    fcmae.py). Gradients for all array arguments are defined via a
    hand-derived VJP that recomputes fc1 per tile (pinned against
    autodiff of the unfused block in tests/test_fused_block.py).
    """
    if x.ndim != 3 or shortcut.shape != x.shape:
        raise ValueError(f"expected (B, S, C) pairs, got {x.shape} / {shortcut.shape}")
    if mask is not None and mask.shape != x.shape[:2]:
        raise ValueError(f"mask must be (B, S), got {mask.shape}")
    if pick_s_tile(x.shape[1], fwd_tile_cap) is None:
        raise ValueError(f"no multiple-of-8 tile divides S={x.shape[1]}")
    cfg = (eps_ln, eps_grn, fwd_tile_cap, bwd_tile_cap, bool(interpret))
    return _fused_mlp_grn(
        cfg, x, shortcut, mask, ln_scale, ln_bias, w1, b1, grn_gamma, grn_beta, w2, b2
    )


def reference_mlp_grn(
    x: Array,
    shortcut: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    grn_gamma: Array,
    grn_beta: Array,
    w2: Array,
    b2: Array,
    *,
    mask: Array | None = None,
    eps_ln: float = 1e-6,
    eps_grn: float = 1e-6,
) -> Array:
    """Pure-jnp oracle replicating the unfused flax block segment
    op-for-op (LayerNorm/Dense/GRN dtype promotion included; masked
    semantics match MaskedConvNeXtV2Block/MaskedGRN)."""
    cdt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    ln = (
        (x32 - mu) * jax.lax.rsqrt(var + eps_ln) * ln_scale.astype(jnp.float32)
        + ln_bias.astype(jnp.float32)
    ).astype(cdt)
    u = (
        jnp.dot(ln, w1.astype(cdt), preferred_element_type=jnp.float32).astype(cdt)
        + b1.astype(cdt)
    )
    v = _gelu_exact(u)
    vs = v if mask is None else v * mask.astype(cdt)[..., None]
    vs32 = vs.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(vs32 * vs32, axis=1, keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + eps_grn)
    t = v * nx.astype(cdt)
    y = (
        grn_gamma.astype(jnp.float32) * t.astype(jnp.float32)
        + grn_beta.astype(jnp.float32)
        + v.astype(jnp.float32)
    ).astype(cdt)
    z = (
        jnp.dot(y, w2.astype(cdt), preferred_element_type=jnp.float32).astype(cdt)
        + b2.astype(cdt)
    )
    if mask is not None:
        z = z * mask.astype(cdt)[..., None]
    return shortcut + z

"""The whole ChAdaViT encoder layer as ONE Pallas TPU kernel (fwd + custom VJP).

Motivation: at the canonical width (D=192) every matmul is small relative to
activation traffic, and the XLA lowering of one encoder layer reads/writes the
(B, S, D) activation ~10 times per layer-forward (LN stats passes, QKV
projection round-trip, attention in/out, out-proj, two residual+LN fusions,
and a 0.5 GB (B, S, 2048) FFN intermediate in HBM). Profiling the width-10
train step showed ~60% of device time in these memory-bound fusions. This
kernel computes

    h  = LN1(x);  qkv = h @ Wqkv + bq
    a  = prefix-masked attention(qkv)          (full-row softmax, base 2)
    o  = a @ Wout + bo
    x2 = LN1(x + o)                            (double-norm1 quirk,
                                                reference chada_vit.py:96-100)
    f  = relu(x2 @ W1 + b1) @ W2 + b2
    y  = LN2(x2 + f)

for one batch element per grid step, keeping EVERYTHING in VMEM: HBM traffic
per layer-forward is one read of x and one write of y (plus, in training,
the attention output `a` and `x2`, saved as backward residuals, and tiny
lse/stat rows). The backward is one kernel too: it recomputes h/qkv (cheap
MXU) and the FFN hidden from the saved residuals, shares one attention score
recompute across dq/dk/dv (same scheme as ops/flash_attention.py), and
accumulates all twelve parameter gradients in f32 VMEM scratch across the
batch grid, writing them once at the last grid step.

Numerics mirror models/chada_vit.py::EncoderLayer exactly: bf16 residual adds,
f32 LN stats with flax fast-variance clamp, matmuls with
preferred_element_type = input dtype, base-2 softmax identical to
ops/flash_attention.py. Reference semantics: torch TransformerEncoderLayer
(norm_first=False) as used at reference chada_vit.py:96-100,160.

Query/key positions beyond ``valid_len`` follow the flash-attention contract:
keys are masked additively; fully-invalid blocks are skipped in every phase
(the forward writes finite zeros + lse=+BIG there, the backward zero-fills),
so gradients stay exact for ANY upstream cotangent. Partially-valid tail rows
compute the real masked-softmax forward and its true backward (tested against
the unfused layer with nonzero tail cotangents).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# the base-2 softmax / additive-mask / lse-row conventions are one contract
# shared with the standalone flash kernels — single definition there
from chadavit_tpu.ops.flash_attention import (  # noqa: E402
    DEFAULT_BLOCK,
    LANES,
    _LOG2E,
    _NEG_LARGE as _NEG,
    pick_block,
)

# conservative per-core VMEM budget for the fused path; above it the caller
# should fall back to the unfused (flash attention + XLA) layer
VMEM_BYTES = 100 * 1024 * 1024


def _stats(xf: Array, eps: float):
    """f32 row stats, flax fast-variance with the max(0,.) clamp."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    return mu, jax.lax.rsqrt(var + eps)


def _nn(a, b):  # (m,k)@(k,n), accumulate f32
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _nt(a, b):  # (m,k)@(n,k)^T -> (m,n)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tn(a, b):  # (k,m)^T@(k,n) -> (m,n): weight-grad orientation
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- forward ----
def _fwd_kernel(save: bool, scale: float, block: int, n_blocks: int,
                num_heads: int, hd: int, eps1: float, eps2: float, *refs):
    if save:
        (vl_ref, x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, g1_ref, b1_ref,
         g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
         y_ref, attn_ref, x2_ref, r2_ref, lse_ref, stats_ref, qkv_s) = refs
    else:
        (vl_ref, x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, g1_ref, b1_ref,
         g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
         y_ref, qkv_s) = refs

    b = pl.program_id(0)
    vl = vl_ref[b]
    d = num_heads * hd
    s_pad = n_blocks * block
    dt = x_ref.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    neg = jnp.where(col < vl, 0.0, _NEG).astype(jnp.float32)
    g1 = g1_ref[0:1, :].astype(jnp.float32)
    b1 = b1_ref[0:1, :].astype(jnp.float32)

    # ---- phase A: LN1 + QKV projection into VMEM scratch, per s-block ----
    def a_step(i, _):
        sl = pl.ds(i * block, block)

        @pl.when(i * block < vl)
        def _valid():
            xf = x_ref[0, sl, :].astype(jnp.float32)
            mu, rstd = _stats(xf, eps1)
            h = ((xf - mu) * rstd * g1 + b1).astype(dt)
            qkv = _nn(h, wqkv_ref[...]).astype(dt) + bqkv_ref[0:1, :]
            qkv_s[sl, :] = qkv
            if save:
                stats_ref[0, 0, sl, :] = jnp.broadcast_to(mu, (block, LANES))
                stats_ref[0, 1, sl, :] = jnp.broadcast_to(rstd, (block, LANES))

        @pl.when(i * block >= vl)
        def _padded():
            # keys here are masked and the q block is skipped, but phase B
            # reads full k/v rows — keep them finite zeros (phase B's
            # _padded branch writes the 1.0 stat placeholders)
            qkv_s[sl, :] = jnp.zeros((block, 3 * d), dt)

        return 0

    jax.lax.fori_loop(0, n_blocks, a_step, 0)

    # ---- phase B: attention + out-proj + LN1 + FFN + LN2, per q-block ----
    def b_step(qi, _):
        sl = pl.ds(qi * block, block)

        @pl.when(qi * block < vl)
        def _valid():
            # out-projection accumulated per head (a_h @ Wout[rows of head]),
            # avoiding an in-kernel head concat
            o = jnp.zeros((block, d), jnp.float32)
            for h_i in range(num_heads):
                lo = h_i * hd
                q = qkv_s[sl, lo:lo + hd] * (scale * _LOG2E)
                s = _nt(q, qkv_s[:, d + lo:d + lo + hd]) + neg
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = _nn(p.astype(dt), qkv_s[:, 2 * d + lo:2 * d + lo + hd])
                a_h = (acc / l).astype(dt)
                o = o + _nn(a_h, wout_ref[lo:lo + hd, :])
                if save:
                    attn_ref[0, sl, lo:lo + hd] = a_h
                    lse_ref[0, h_i, sl, :] = jnp.broadcast_to(
                        m + jnp.log2(l), (block, LANES))

            o = o.astype(dt) + bout_ref[0:1, :]
            r = x_ref[0, sl, :] + o  # input-dtype residual, as in the model
            rf = r.astype(jnp.float32)
            mu2, rstd2 = _stats(rf, eps1)
            x2 = ((rf - mu2) * rstd2 * g1 + b1).astype(dt)
            if save:
                x2_ref[0, sl, :] = x2
                stats_ref[0, 2, sl, :] = jnp.broadcast_to(mu2, (block, LANES))
                stats_ref[0, 3, sl, :] = jnp.broadcast_to(rstd2, (block, LANES))

            z1 = _nn(x2, w1_ref[...]).astype(dt) + b1f_ref[0:1, :]
            hid = jax.nn.relu(z1)
            f = _nn(hid, w2_ref[...]).astype(dt) + b2f_ref[0:1, :]
            r2 = x2 + f
            if save:
                # saving r2 lets the backward skip the second FFN matmul of
                # its forward recompute (xhat3 comes straight from r2)
                r2_ref[0, sl, :] = r2
            r2f = r2.astype(jnp.float32)
            mu3, rstd3 = _stats(r2f, eps2)
            y = (r2f - mu3) * rstd3 * g2_ref[0:1, :].astype(jnp.float32) \
                + b2_ref[0:1, :].astype(jnp.float32)
            y_ref[0, sl, :] = y.astype(dt)
            if save:
                stats_ref[0, 4, sl, :] = jnp.broadcast_to(mu3, (block, LANES))
                stats_ref[0, 5, sl, :] = jnp.broadcast_to(rstd3, (block, LANES))

        @pl.when(qi * block >= vl)
        def _padded():
            # finite zeros for downstream consumers; lse=+BIG so backward
            # p_t underflows to 0 for these query columns
            y_ref[0, sl, :] = jnp.zeros((block, d), dt)
            if save:
                attn_ref[0, sl, :] = jnp.zeros((block, d), dt)
                x2_ref[0, sl, :] = jnp.zeros((block, d), dt)
                r2_ref[0, sl, :] = jnp.zeros((block, d), dt)
                for h_i in range(num_heads):
                    lse_ref[0, h_i, sl, :] = jnp.full((block, LANES), -_NEG,
                                                      jnp.float32)
                for s_i in range(6):
                    stats_ref[0, s_i, sl, :] = jnp.full((block, LANES), 1.0,
                                                        jnp.float32)

        return 0

    jax.lax.fori_loop(0, n_blocks, b_step, 0)


# --------------------------------------------------------------- backward ----
def _bwd_kernel(scale: float, block: int, n_blocks: int, num_heads: int,
                hd: int, eps1: float, eps2: float,
                # inputs
                vl_ref, x_ref, attn_ref, x2_ref, r2_ref, dy_ref, lse_ref,
                stats_ref,
                wqkv_ref, bqkv_ref, wout_ref, bout_ref, g1_ref, b1_ref,
                g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
                # outputs
                dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                dg1_ref, db1_ref, dg2_ref, db2_ref,
                dw1_ref, db1f_ref, dw2_ref, db2f_ref,
                # scratch
                h_s, qkv_s, dattn_s, dqkv_s, dq_acc, rows_cs, rows_t,
                dwqkv_s, dbqkv_s, dwout_s, dbout_s, dg1_s, db1_s, dg2_s,
                db2_s, dw1_s, db1f_s, dw2_s, db2f_s):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    vl = vl_ref[b]
    d = num_heads * hd
    s_pad = n_blocks * block
    dt = x_ref.dtype
    g1 = g1_ref[0:1, :].astype(jnp.float32)
    b1 = b1_ref[0:1, :].astype(jnp.float32)
    g2 = g2_ref[0:1, :].astype(jnp.float32)

    @pl.when(b == 0)
    def _init():
        for s in (dwqkv_s, dbqkv_s, dwout_s, dbout_s, dg1_s, db1_s, dg2_s,
                  db2_s, dw1_s, db1f_s, dw2_s, db2f_s):
            s[...] = jnp.zeros_like(s)

    def ln_bwd(dy, xhat, rstd, gamma):
        """d(input) of y = xhat*gamma+beta given dy; returns (dx, dgamma, dbeta
        row sums)."""
        dyg = dy * gamma
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
        dx = rstd * (dyg - m1 - xhat * m2)
        dgam = jnp.sum(dy * xhat, axis=0, keepdims=True)
        dbet = jnp.sum(dy, axis=0, keepdims=True)
        return dx, dgam, dbet

    # ---- phase A': recompute h and qkv from saved LN1 stats ----
    def a_step(i, _):
        sl = pl.ds(i * block, block)

        @pl.when(i * block < vl)
        def _valid():
            xf = x_ref[0, sl, :].astype(jnp.float32)
            mu = stats_ref[0, 0, sl, 0:1]
            rstd = stats_ref[0, 1, sl, 0:1]
            h = ((xf - mu) * rstd * g1 + b1).astype(dt)
            h_s[sl, :] = h
            qkv = _nn(h, wqkv_ref[...]).astype(dt) + bqkv_ref[0:1, :]
            # pre-scale the query columns once; phase C' reads them once per
            # key block, so scaling there would repeat the work n_blocks times
            qkv_s[sl, 0:d] = qkv[:, 0:d] * jnp.asarray(scale * _LOG2E, dt)
            qkv_s[sl, d:] = qkv[:, d:]

        @pl.when(i * block >= vl)
        def _padded():
            h_s[sl, :] = jnp.zeros((block, d), dt)
            qkv_s[sl, :] = jnp.zeros((block, 3 * d), dt)

        return 0

    jax.lax.fori_loop(0, n_blocks, a_step, 0)

    # ---- phase B': FFN + both post-attention LN backwards, per s-block.
    # Fully-invalid blocks must be skipped even though their cotangent is
    # zero for every in-repo loss: the forward stored zeros + placeholder
    # stats there, so running the math against a hypothetical nonzero dy
    # would silently poison the parameter-gradient sums. ----
    def b_step(i, _):
        sl = pl.ds(i * block, block)

        @pl.when(i * block >= vl)
        def _padded():
            dx_ref[0, sl, :] = jnp.zeros((block, d), dt)
            dattn_s[sl, :] = jnp.zeros((block, d), dt)
            rows_cs[sl, :] = jnp.zeros((block, num_heads * LANES), jnp.float32)

        @pl.when(i * block < vl)
        def _valid():
            _b_valid(i, sl)

        return 0

    def _b_valid(i, sl):
        x2 = x2_ref[0, sl, :]
        dy = dy_ref[0, sl, :].astype(jnp.float32)

        # recompute the FFN hidden (needed for dW2/relu'); r2 was saved by
        # the forward, so the second FFN matmul is not recomputed
        z1 = _nn(x2, w1_ref[...]).astype(dt) + b1f_ref[0:1, :]
        hid = jax.nn.relu(z1)
        r2f = r2_ref[0, sl, :].astype(jnp.float32)
        xhat3 = (r2f - stats_ref[0, 4, sl, 0:1]) * stats_ref[0, 5, sl, 0:1]

        dr2, dgam2, dbet2 = ln_bwd(dy, xhat3, stats_ref[0, 5, sl, 0:1], g2)
        dg2_s[0:1, :] += dgam2
        db2_s[0:1, :] += dbet2

        # FFN backward
        dr2h = dr2.astype(dt)
        dw2_s[...] += _tn(hid, dr2h)
        db2f_s[0:1, :] += jnp.sum(dr2, axis=0, keepdims=True)
        dhid = _nt(dr2h, w2_ref[...])
        # relu' via an f32 compare (Mosaic/v5e has no bf16 vector compare)
        dz1 = jnp.where(z1.astype(jnp.float32) > 0, dhid, 0.0).astype(dt)
        dw1_s[...] += _tn(x2, dz1)
        db1f_s[0:1, :] += jnp.sum(dz1.astype(jnp.float32), axis=0, keepdims=True)
        dx2 = dr2 + _nt(dz1, w1_ref[...])

        # site-2 LN (norm1 params applied to x + o)
        a = attn_ref[0, sl, :]
        o = _nn(a, wout_ref[...]).astype(dt) + bout_ref[0:1, :]
        rf = (x_ref[0, sl, :] + o).astype(jnp.float32)
        xhat2 = (rf - stats_ref[0, 2, sl, 0:1]) * stats_ref[0, 3, sl, 0:1]
        dr, dgam1, dbet1 = ln_bwd(dx2, xhat2, stats_ref[0, 3, sl, 0:1], g1)
        dg1_s[0:1, :] += dgam1
        db1_s[0:1, :] += dbet1
        dx_ref[0, sl, :] = dr.astype(dt)  # residual branch; phase D' adds LN1

        # out-projection backward
        do = dr.astype(dt)
        dwout_s[...] += _tn(a, do)
        dbout_s[0:1, :] += jnp.sum(dr, axis=0, keepdims=True)
        da = _nt(do, wout_ref[...]).astype(dt)
        dattn_s[sl, :] = da

        # per-head delta columns: rowsum(da * a) over the head's lanes
        for h_i in range(num_heads):
            lo = h_i * hd
            dcol = jnp.sum(da[:, lo:lo + hd].astype(jnp.float32)
                           * a[:, lo:lo + hd].astype(jnp.float32),
                           axis=-1, keepdims=True)
            rows_cs[sl, h_i * LANES:(h_i + 1) * LANES] = jnp.broadcast_to(
                dcol, (block, LANES))

    jax.lax.fori_loop(0, n_blocks, b_step, 0)

    # ---- phase B2': lane-major delta/lse rows via an MXU transpose ----
    eye = jnp.eye(LANES, dtype=jnp.float32)
    for h_i in range(num_heads):
        rows_t[h_i * LANES:(h_i + 1) * LANES, :] = jax.lax.dot_general(
            eye, rows_cs[:, h_i * LANES:(h_i + 1) * LANES],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        rows_t[(num_heads + h_i) * LANES:(num_heads + h_i + 1) * LANES, :] = \
            jax.lax.dot_general(
                eye, lse_ref[0, h_i, :, :],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # ---- phase C': attention backward (one score recompute per key block) ----
    dq_acc[...] = jnp.zeros_like(dq_acc)

    def c_step(kj, _):
        sl = pl.ds(kj * block, block)

        def attn_bwd(boundary: bool):
            # key rows beyond vl carry garbage-nonzero k/v (phase A' writes
            # real LN+bias values for the partial block's tail); only the
            # boundary block needs the mask add — interior blocks skip the
            # (block, s_pad) VPU pass entirely
            row = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) \
                + kj * block
            rneg = jnp.where(row < vl, 0.0, _NEG).astype(jnp.float32)
            for h_i in range(num_heads):
                lo = h_i * hd
                qs = qkv_s[:, lo:lo + hd]  # pre-scaled by phase A'
                do = dattn_s[:, lo:lo + hd]
                lse_r = rows_t[(num_heads + h_i) * LANES:
                               (num_heads + h_i) * LANES + 1, :]
                delta_r = rows_t[h_i * LANES:h_i * LANES + 1, :]
                k_blk = qkv_s[sl, d + lo:d + lo + hd]
                v_blk = qkv_s[sl, 2 * d + lo:2 * d + lo + hd]
                s_t = _nt(k_blk, qs)
                if boundary:
                    s_t = s_t + rneg
                p_t = jnp.exp2(s_t - lse_r)
                dv = _nn(p_t.astype(dt), do)
                dp_t = _nt(v_blk, do)
                ds_t = (p_t * (dp_t - delta_r)).astype(dt)
                dk = _nn(ds_t, qs)
                dq_acc[:, lo:lo + hd] += _tn(ds_t, k_blk)
                dqkv_s[sl, d + lo:d + lo + hd] = (dk * (1.0 / _LOG2E)).astype(dt)
                dqkv_s[sl, 2 * d + lo:2 * d + lo + hd] = dv.astype(dt)

        @pl.when(kj * block + block <= vl)
        def _interior():
            attn_bwd(boundary=False)

        @pl.when((kj * block < vl) & (kj * block + block > vl))
        def _boundary():
            attn_bwd(boundary=True)

        @pl.when(kj * block >= vl)
        def _padded():
            dqkv_s[sl, d:] = jnp.zeros((block, 2 * d), dt)

        return 0

    jax.lax.fori_loop(0, n_blocks, c_step, 0)

    # ---- phase D': QKV projection + site-1 LN backward, per s-block ----
    def d_step(i, _):
        sl = pl.ds(i * block, block)
        dqkv_s[sl, 0:d] = (dq_acc[sl, :] * scale).astype(dt)
        dqkv = dqkv_s[sl, :]
        dwqkv_s[...] += _tn(h_s[sl, :], dqkv)
        dbqkv_s[0:1, :] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                   keepdims=True)
        dh = _nt(dqkv, wqkv_ref[...])
        xf = x_ref[0, sl, :].astype(jnp.float32)
        xhat1 = (xf - stats_ref[0, 0, sl, 0:1]) * stats_ref[0, 1, sl, 0:1]
        dxln, dgam1, dbet1 = ln_bwd(dh, xhat1, stats_ref[0, 1, sl, 0:1], g1)
        dg1_s[0:1, :] += dgam1
        db1_s[0:1, :] += dbet1
        dx_ref[0, sl, :] += dxln.astype(dt)
        return 0

    jax.lax.fori_loop(0, n_blocks, d_step, 0)

    # ---- phase E: flush accumulated parameter grads at the last grid step ----
    @pl.when(b == nb - 1)
    def _flush():
        dwqkv_ref[...] = dwqkv_s[...]
        dbqkv_ref[...] = dbqkv_s[0:1, :]
        dwout_ref[...] = dwout_s[...]
        dbout_ref[...] = dbout_s[0:1, :]
        dg1_ref[...] = dg1_s[0:1, :]
        db1_ref[...] = db1_s[0:1, :]
        dg2_ref[...] = dg2_s[0:1, :]
        db2_ref[...] = db2_s[0:1, :]
        dw1_ref[...] = dw1_s[...]
        db1f_ref[...] = db1f_s[0:1, :]
        dw2_ref[...] = dw2_s[...]
        db2f_ref[...] = db2f_s[0:1, :]


# ------------------------------------------------------------ entry points ----
def _full(s, d):
    return pl.BlockSpec((1, s, d), lambda b, vl: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _whole(*shape):
    return pl.BlockSpec(shape, lambda b, vl: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pad_seq(x, s_pad):
    b, s, d = x.shape
    return x if s == s_pad else jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))


def _pack_weights(params, dt, d, f):
    """Cast/reshape the 12 layer parameters into kernel operands + specs
    (single definition shared by the forward and backward pallas_calls)."""
    (wqkv, bqkv, wout, bout, g1, b1, g2, b2, w1, b1f, w2, b2f) = params
    row = lambda a: a.reshape(1, -1).astype(dt)
    frow = lambda a: a.reshape(1, -1)  # LN params stay f32
    weights = (wqkv.astype(dt), row(bqkv), wout.astype(dt), row(bout),
               frow(g1), frow(b1), frow(g2), frow(b2),
               w1.astype(dt), row(b1f), w2.astype(dt), row(b2f))
    w_specs = [_whole(d, 3 * d), _whole(1, 3 * d), _whole(d, d), _whole(1, d),
               _whole(1, d), _whole(1, d), _whole(1, d), _whole(1, d),
               _whole(d, f), _whole(1, f), _whole(f, d), _whole(1, d)]
    return weights, w_specs


def _bwd_block(block: int, s_pad: int) -> int:
    """The backward's key-block size: doubled when it still divides s_pad
    (fewer loop trips; measured 9.10 -> 8.74 ms at the canonical shape).
    Coarsening further is a measured LOSS (4x: 8.64 -> 10.26 ms at the
    canonical shape — the 1024-row score temporaries crowd VMEM and stall
    the input-stream double buffering)."""
    return 2 * block if s_pad % (2 * block) == 0 else block


def _fwd_block(block: int, s_pad: int) -> int:
    """The forward's compute-block size, decoupled from the padding
    granularity. Coarsening was measured a LOSS at the canonical shape
    (256 -> 512: 3.55 -> 3.81 ms; -> 1024: 3.85 ms — bigger score
    temporaries crowd VMEM and stall the input-stream double buffering),
    so the forward tiles at the padding block."""
    result = block
    # the grid math in _run_fwd assumes the compute block divides s_pad; a
    # future non-identity choice must preserve that
    assert s_pad % result == 0, (s_pad, result)
    return result


def vmem_estimate(s_pad: int, d: int, f: int, num_heads: int, block: int,
                  itemsize: int) -> int:
    """Rough VMEM bytes for the backward kernel (the bigger of the two)."""
    act = s_pad * d * itemsize
    return (4 * act                     # h, dattn (+ in/out double-buffering)
            + 2 * s_pad * 3 * d * itemsize   # qkv, dqkv
            + s_pad * d * 4              # dq_acc
            + 4 * num_heads * LANES * s_pad * 4
            + (2 * d * 3 * d + 2 * d * d + 4 * d * f) * 4  # dW scratch f32
            + (d * 3 * d + d * d + 2 * d * f) * itemsize   # weights
            # score-sized temporaries at the backward's (doubled) block
            + 6 * _bwd_block(block, s_pad) * s_pad * 4
            + 6 * act)                   # in/out buffers


def _run_fwd(x, valid_len, params, num_heads, eps1, eps2, block, interpret,
             save):
    bsz, s, d = x.shape
    f = params[8].shape[1]  # w1 (D, F)
    hd = d // num_heads
    s_pad = ((s + block - 1) // block) * block
    block = _fwd_block(block, s_pad)
    scale = 1.0 / (hd ** 0.5)
    xp = _pad_seq(x, s_pad)
    vl = valid_len.astype(jnp.int32)
    dt = x.dtype

    weights, w_specs = _pack_weights(params, dt, d, f)

    out_specs = [_full(s_pad, d)]
    out_shapes = [jax.ShapeDtypeStruct((bsz, s_pad, d), dt)]
    if save:
        out_specs += [
            _full(s_pad, d), _full(s_pad, d), _full(s_pad, d),
            pl.BlockSpec((1, num_heads, s_pad, LANES), lambda b, vl: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, s_pad, LANES), lambda b, vl: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((bsz, s_pad, d), dt),
            jax.ShapeDtypeStruct((bsz, s_pad, d), dt),
            jax.ShapeDtypeStruct((bsz, s_pad, d), dt),
            jax.ShapeDtypeStruct((bsz, num_heads, s_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 6, s_pad, LANES), jnp.float32),
        ]

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, save, scale, block, s_pad // block,
                          num_heads, hd, eps1, eps2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz,),
            in_specs=[_full(s_pad, d)] + w_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[pltpu.VMEM((s_pad, 3 * d), dt)],
        ),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_BYTES,
        ),
        interpret=interpret,
    )(vl, xp, *weights)
    return outs, s_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18))
def fused_encoder_block(
    x: Array, valid_len: Array,
    wqkv: Array, bqkv: Array, wout: Array, bout: Array,
    g1: Array, b1: Array, g2: Array, b2: Array,
    w1: Array, b1f: Array, w2: Array, b2f: Array,
    num_heads: int, eps1: float = 1e-5, eps2: float = 1e-5,
    block: int = DEFAULT_BLOCK, interpret: bool = False,
) -> Array:
    """One ChAdaViT encoder layer, fused. x: (B, S, D); returns (B, S, D)."""
    params = (wqkv, bqkv, wout, bout, g1, b1, g2, b2, w1, b1f, w2, b2f)
    outs, _ = _run_fwd(x, valid_len, params, num_heads, eps1, eps2, block,
                       interpret, save=False)
    return outs[0][:, :x.shape[1]]


def _vjp_fwd(x, valid_len, wqkv, bqkv, wout, bout, g1, b1, g2, b2,
             w1, b1f, w2, b2f, num_heads, eps1, eps2, block, interpret):
    params = (wqkv, bqkv, wout, bout, g1, b1, g2, b2, w1, b1f, w2, b2f)
    (y, attn, x2, r2, lse, stats), s_pad = _run_fwd(
        x, valid_len, params, num_heads, eps1, eps2, block, interpret,
        save=True)
    res = (x, valid_len, attn, x2, r2, lse, stats, params)
    return y[:, :x.shape[1]], res


def _vjp_bwd(num_heads, eps1, eps2, block, interpret, res, g):
    x, valid_len, attn, x2, r2, lse, stats, params = res
    (wqkv, bqkv, wout, bout, g1, b1, g2, b2, w1, b1f, w2, b2f) = params
    bsz, s, d = x.shape
    f = w1.shape[1]
    hd = d // num_heads
    s_pad = attn.shape[1]
    # the backward may tile independently of the forward since all saved
    # rows are row-granular
    block = _bwd_block(block, s_pad)
    scale = 1.0 / (hd ** 0.5)
    dt = x.dtype
    xp = _pad_seq(x, s_pad)
    dy = _pad_seq(g.astype(dt), s_pad)
    vl = valid_len.astype(jnp.int32)

    weights, w_specs = _pack_weights(params, dt, d, f)
    gshapes = [(d, 3 * d), (1, 3 * d), (d, d), (1, d), (1, d), (1, d),
               (1, d), (1, d), (d, f), (1, f), (f, d), (1, d)]
    grad_specs = [_whole(*sh) for sh in gshapes]
    grad_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32) for sh in gshapes]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale, block, s_pad // block,
                          num_heads, hd, eps1, eps2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz,),
            in_specs=[_full(s_pad, d), _full(s_pad, d), _full(s_pad, d),
                      _full(s_pad, d), _full(s_pad, d),
                      pl.BlockSpec((1, num_heads, s_pad, LANES),
                                   lambda b, vl: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 6, s_pad, LANES),
                                   lambda b, vl: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_specs=tuple([_full(s_pad, d)] + grad_specs),
            scratch_shapes=[
                pltpu.VMEM((s_pad, d), dt),          # h_s
                pltpu.VMEM((s_pad, 3 * d), dt),      # qkv_s
                pltpu.VMEM((s_pad, d), dt),          # dattn_s
                pltpu.VMEM((s_pad, 3 * d), dt),      # dqkv_s
                pltpu.VMEM((s_pad, d), jnp.float32),  # dq_acc
                pltpu.VMEM((s_pad, num_heads * LANES), jnp.float32),  # rows_cs
                pltpu.VMEM((2 * num_heads * LANES, s_pad), jnp.float32),
                pltpu.VMEM((d, 3 * d), jnp.float32),
                pltpu.VMEM((LANES, 3 * d), jnp.float32),
                pltpu.VMEM((d, d), jnp.float32),
                pltpu.VMEM((LANES, d), jnp.float32),
                pltpu.VMEM((LANES, d), jnp.float32),
                pltpu.VMEM((LANES, d), jnp.float32),
                pltpu.VMEM((LANES, d), jnp.float32),
                pltpu.VMEM((LANES, d), jnp.float32),
                pltpu.VMEM((d, f), jnp.float32),
                pltpu.VMEM((LANES, f), jnp.float32),
                pltpu.VMEM((f, d), jnp.float32),
                pltpu.VMEM((LANES, d), jnp.float32),
            ],
        ),
        out_shape=tuple([jax.ShapeDtypeStruct((bsz, s_pad, d), dt)]
                        + grad_shapes),
        compiler_params=pltpu.CompilerParams(
            # scratch accumulates across grid steps -> must stay sequential
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_BYTES,
        ),
        interpret=interpret,
    )(vl, xp, attn, x2, r2, dy, lse, stats, *weights)

    (dx, dwqkv, dbqkv, dwout, dbout, dg1, db1, dg2, db2,
     dw1, db1f, dw2, db2f) = outs
    dx = dx[:, :s]

    def like(gr, p):
        return gr.reshape(p.shape).astype(p.dtype)

    return (dx, None,
            like(dwqkv, wqkv), like(dbqkv, bqkv), like(dwout, wout),
            like(dbout, bout), like(dg1, g1), like(db1, b1), like(dg2, g2),
            like(db2, b2), like(dw1, w1), like(db1f, b1f), like(dw2, w2),
            like(db2f, b2f))


fused_encoder_block.defvjp(_vjp_fwd, _vjp_bwd)

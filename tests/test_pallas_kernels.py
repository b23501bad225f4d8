"""Pallas kernel tests: fused separable attention matches the XLA reference in
forward AND gradient (custom VJP). On CPU the op falls back to the reference path,
so these validate the VJP math; the TPU kernel itself is exercised by bench.py and
interpret-mode below."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _qkv(bp=4, n=32, c=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((bp, n, 1)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bp, n, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bp, n, c)).astype(np.float32))
    return q, k, v


def test_forward_matches_reference():
    from cvnets_tpu.ops.pallas.mobilevit_attn import (
        _reference_forward,
        separable_attention_core,
    )

    q, k, v = _qkv()
    out = separable_attention_core(q, k, v)
    ref = _reference_forward(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_interpret_mode_kernel():
    """Run the actual Pallas kernel body under the interpreter (CPU)."""
    from jax.experimental import pallas as pl

    from cvnets_tpu.ops.pallas.mobilevit_attn import (
        _attn_kernel,
        _reference_forward,
    )

    q, k, v = _qkv(bp=2, n=16, c=128)
    out = pl.pallas_call(
        _attn_kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, 16, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 16, 128), jnp.float32),
        interpret=True,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference_forward(q, k, v)), atol=1e-5)


def test_custom_vjp_matches_autodiff():
    from cvnets_tpu.ops.pallas.mobilevit_attn import (
        _reference_forward,
        separable_attention_core,
    )

    q, k, v = _qkv(bp=2, n=8, c=16)

    def f_custom(q, k, v):
        return jnp.sum(separable_attention_core(q, k, v) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_forward(q, k, v) ** 2)

    g_custom = jax.grad(f_custom, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gc, gr in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow  # integration-weight: full-suite tier (fast-tier wall-clock diet, VERDICT r2 #7)
def test_mobilevitv2_with_kernel_flag_parity():
    """Model outputs identical with the kernel path on/off (CPU fallback path)."""
    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_training_arguments

    outs = {}
    for flag in (True, False):
        opts = get_training_arguments(args=[
            "--model.classification.name", "mobilevit_v2",
            "--model.classification.n-classes", "7",
            "--dataset.category", "classification",
        ])
        setattr(opts, "model.enable_pallas_kernels", flag)
        model = get_model(opts)
        rng = jax.random.PRNGKey(0)
        x = jnp.ones((1, 32, 32, 3))
        v = model.init({"params": rng, "dropout": rng}, x, training=False)
        outs[flag] = model.apply(v, x, training=False)
    np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]),
                               atol=1e-5)


# ---------------------------------------------------------------- MHA kernel

def _mha_qkv(b=3, s=197, h=4, d=64, dtype=jnp.float32, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    e = h * d
    q = jnp.asarray(rng.standard_normal((b, s, e)) * 0.3, dtype)
    k = jnp.asarray(rng.standard_normal((b, s, e)) * 0.3, dtype)
    v = jnp.asarray(rng.standard_normal((b, s, e)), dtype)
    km = (jnp.where(jnp.asarray(rng.random((b, s))) < 0.2, -1e30, 0.0)
          if masked else None)
    return q, k, v, km


def _mha_gold(q, k, v, h, km):
    b, s, e = q.shape
    qh, kh, vh = (t.reshape(b, s, h, e // h) for t in (q, k, v))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    if km is not None:
        logits = logits + km[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, s, e)


def test_mha_forward_and_vjp_match_reference():
    """Reference (off-TPU) path of fused_mha_attention vs plain einsum."""
    from cvnets_tpu.ops.pallas.mha_attn import fused_mha_attention

    for masked in (True, False):
        q, k, v, km = _mha_qkv(masked=masked)
        out = fused_mha_attention(q, k, v, 4, km)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_mha_gold(q, k, v, 4, km)),
                                   atol=1e-5)
        g1 = jax.grad(lambda *t: jnp.sum(
            fused_mha_attention(*t, 4, km) ** 2), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *t: jnp.sum(
            _mha_gold(*t, 4, km) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-4, rtol=1e-4)


def test_mha_pallas_kernels_interpret_mode():
    """The actual fwd AND bwd Pallas kernels under the CPU interpreter,
    including odd sequence lengths (no padding path) and 64-lane head
    slices at unaligned offsets."""
    import cvnets_tpu.ops.pallas.mha_attn as M

    q, k, v, km = _mha_qkv(b=2, s=53, h=3, d=64)
    try:
        M._INTERPRET = True
        out = M.fused_mha_attention(q, k, v, 3, km)
        g1 = jax.grad(lambda *t: jnp.sum(
            M.fused_mha_attention(*t, 3, km) ** 2), argnums=(0, 1, 2))(q, k, v)
    finally:
        M._INTERPRET = False
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_mha_gold(q, k, v, 3, km)),
                               atol=1e-5)
    g2 = jax.grad(lambda *t: jnp.sum(
        _mha_gold(*t, 3, km) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)


def test_mha_layer_routes_through_fused_kernel():
    """MultiHeadAttention output is unchanged by the fused path (CPU reference)
    and ineligible cases (attn_mask / long seq) still work."""
    import flax.linen as nn

    from cvnets_tpu.layers.multi_head_attention import MultiHeadAttention
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.classification.name", "vit",
        "--dataset.category", "classification"])
    mha = MultiHeadAttention(opts=opts, embed_dim=64, num_heads=4)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 37, 64)),
                    jnp.float32)
    variables = mha.init({"params": rng}, x)
    y = mha.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all()
    # attn_mask forces the einsum path; outputs must agree (zero mask)
    zero_mask = jnp.zeros((1, 1, 37, 37))
    y2 = mha.apply(variables, x, attn_mask=zero_mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    # boolean key padding mask reaches the kernel as an additive mask
    kpm = jnp.zeros((2, 37), bool).at[:, 30:].set(True)
    y3 = mha.apply(variables, x, key_padding_mask=kpm)
    neg = jnp.finfo(jnp.float32).min
    y4 = mha.apply(variables, x, key_padding_mask=kpm,
                   attn_mask=jnp.zeros((1, 1, 37, 37)))
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y4), atol=1e-5)


def test_mha_kernel_partitions_over_data_axis():
    """Under GSPMD a bare pallas_call all-gathers a batch-sharded input; the
    custom_partitioning wrapper must keep the batch dim sharded with NO
    collectives in fwd or bwd (8-device CPU mesh, interpreter kernels)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import cvnets_tpu.ops.pallas.mha_attn as M

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    b, s, h, d = 16, 53, 3, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h * d)) * 0.3, jnp.float32)
    qs = jax.device_put(q, NamedSharding(mesh, P("data")))
    try:
        M._INTERPRET = True
        f = jax.jit(lambda q: M.fused_mha_attention(q, q, q, h))
        out = f(qs)
        assert "all-gather" not in f.lower(qs).compile().as_text()
        np.testing.assert_array_equal(np.asarray(out), np.asarray(f(q)))
        g = jax.jit(jax.grad(
            lambda q: jnp.sum(M.fused_mha_attention(q, q, q, h) ** 2)))
        assert "all-gather" not in g.lower(qs).compile().as_text()
        np.testing.assert_array_equal(np.asarray(g(qs)), np.asarray(g(q)))
    finally:
        M._INTERPRET = False


# ----------------------------------------------------- long-sequence MHA

def test_mha_long_kernel_block_choice():
    """Block picker: largest 512/256/128 divisor under the VMEM budget; shapes
    no block tiles (indivisible S, oversized E) are ineligible."""
    from cvnets_tpu.ops.pallas.mha_attn_long import (
        choose_block,
        long_attention_eligible,
    )

    assert choose_block(4096, 768, 4) == 256   # ViT-B @1024²: 512 over budget
    assert choose_block(1024, 192, 4) == 512
    assert choose_block(384, 128, 4) == 128
    assert choose_block(1000, 128, 4) is None  # not divisible by any block
    assert not long_attention_eligible(4096, 2048)  # embed cap


def test_mha_long_kernel_interpret_mode():
    """KV-blocked fwd + two-kernel bwd under the CPU interpreter vs einsum,
    with a multi-block grid (S=384 → 3 kv blocks of 128)."""
    import cvnets_tpu.ops.pallas.mha_attn as M
    from cvnets_tpu.ops.pallas.mha_attn_long import attn_core_long

    for masked in (True, False):
        q, k, v, km = _mha_qkv(b=2, s=384, h=2, d=64, masked=masked)
        mask = (jnp.zeros((2, 1, 384), jnp.float32) if km is None
                else km.reshape(2, 1, 384).astype(jnp.float32))
        try:
            M._INTERPRET = True
            out = attn_core_long(q, k, v, mask, 2)
            g1 = jax.grad(lambda *t: jnp.sum(
                attn_core_long(*t, mask, 2) ** 2), argnums=(0, 1, 2))(q, k, v)
        finally:
            M._INTERPRET = False
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_mha_gold(q, k, v, 2, km)),
                                   atol=1e-5)
        g2 = jax.grad(lambda *t: jnp.sum(
            _mha_gold(*t, 2, km) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-4, rtol=1e-4)


def test_mha_long_kernel_dispatch():
    """fused_mha_attention routes S > _MAX_SEQ to the blocked kernel when the
    Pallas path is live, and the result matches the einsum reference."""
    import cvnets_tpu.ops.pallas.mha_attn as M
    import cvnets_tpu.ops.pallas.mha_attn_long as L

    q, k, v, km = _mha_qkv(b=2, s=640, h=2, d=64)
    calls = []
    real = L.attn_core_long

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    try:
        M._INTERPRET = True
        L.attn_core_long = spy
        out = M.fused_mha_attention(q, k, v, 2, km)
    finally:
        M._INTERPRET = False
        L.attn_core_long = real
    assert calls, "long kernel was not dispatched for S=640"
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_mha_gold(q, k, v, 2, km)),
                               atol=1e-5)
    # layer-level eligibility now includes blocked shapes
    assert M.fused_attention_eligible(4096, 768)
    assert not M.fused_attention_eligible(1000, 768)


def test_mha_long_kernel_partitions_over_data_axis():
    """Batch-sharded inputs stay sharded through the blocked kernel (no
    all-gather in fwd or bwd) on the 8-device CPU mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import cvnets_tpu.ops.pallas.mha_attn as M

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    b, s, h, d = 8, 640, 2, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h * d)) * 0.3, jnp.float32)
    qs = jax.device_put(q, NamedSharding(mesh, P("data")))
    try:
        M._INTERPRET = True
        f = jax.jit(lambda q: M.fused_mha_attention(q, q, q, h))
        out = f(qs)
        assert "all-gather" not in f.lower(qs).compile().as_text()
        np.testing.assert_allclose(np.asarray(out), np.asarray(f(q)),
                                   atol=1e-6)
        g = jax.jit(jax.grad(
            lambda q: jnp.sum(M.fused_mha_attention(q, q, q, h) ** 2)))
        assert "all-gather" not in g.lower(qs).compile().as_text()
        np.testing.assert_allclose(np.asarray(g(qs)), np.asarray(g(q)),
                                   rtol=1e-5, atol=1e-4)
    finally:
        M._INTERPRET = False


# ------------------------------------------------------ windowed (Swin) MHA

def _win_qkv(B=3, nW=4, S=49, h=3, d=32, seed=0):
    rng = np.random.default_rng(seed)
    e = h * d
    bnw = B * nW
    q = jnp.asarray(rng.standard_normal((bnw, S, e)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((bnw, S, e)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((bnw, S, e)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, S, S)) * 0.5, jnp.float32)
    mask = jnp.where(jnp.asarray(rng.random((nW, S, S))) < 0.3,
                     -100.0, 0.0).astype(jnp.float32)
    return q, k, v, bias, mask


def _win_gold(q, k, v, heads, bias, mask):
    bnw, S, e = q.shape
    d = e // heads
    qh, kh, vh = (t.reshape(bnw, S, heads, d) for t in (q, k, v))
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        logits = (logits.reshape(bnw // nw, nw, heads, S, S)
                  + mask[None, :, None]).reshape(bnw, heads, S, S)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, vh).reshape(bnw, S, e)


def test_window_attn_kernel_interpret_mode():
    """Fused biased window attention (fwd + bwd incl. the bias cotangent)
    under the CPU interpreter vs einsum, shifted (per-window mask) and not."""
    import cvnets_tpu.ops.pallas.mha_attn as M
    from cvnets_tpu.ops.pallas.window_attn import fused_window_attention

    q, k, v, bias, mask = _win_qkv()
    for m in (mask, None):
        try:
            M._INTERPRET = True
            out = fused_window_attention(q, k, v, 3, bias, m)
            g1 = jax.grad(
                lambda *t: jnp.sum(fused_window_attention(
                    t[0], t[1], t[2], 3, t[3], m) ** 2),
                argnums=(0, 1, 2, 3))(q, k, v, bias)
        finally:
            M._INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_win_gold(q, k, v, 3, bias, m)),
            atol=1e-5)
        g2 = jax.grad(lambda *t: jnp.sum(_win_gold(
            t[0], t[1], t[2], 3, t[3], m) ** 2), argnums=(0, 1, 2, 3))(
            q, k, v, bias)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-4, rtol=1e-4)


def test_window_attn_layer_routes_through_kernel():
    """SwinTransformerBlock output is identical through the fused kernel
    (interpret, forced via the env escape hatch — the kernel is disabled by
    default after losing the v5e A/B, docs/perf/PROFILE-swin.md) and the
    einsum path, for both W-MSA and SW-MSA."""
    import os

    import cvnets_tpu.ops.pallas.mha_attn as M
    from cvnets_tpu.modules.swin_transformer_block import SwinTransformerBlock
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[
        "--model.classification.name", "swin",
        "--dataset.category", "classification"])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 14, 14, 24)),
                    jnp.float32)
    for shift in (0, 3):
        blk = SwinTransformerBlock(opts=opts, dim=24, num_heads=3,
                                   window_size=7, shift_size=shift)
        variables = blk.init({"params": jax.random.PRNGKey(0)}, x)
        y_einsum = blk.apply(variables, x)
        try:
            M._INTERPRET = True
            os.environ["CVNETS_TPU_FORCE_WINDOW_KERNEL"] = "1"
            y_kernel = blk.apply(variables, x)
        finally:
            M._INTERPRET = False
            os.environ.pop("CVNETS_TPU_FORCE_WINDOW_KERNEL", None)
        np.testing.assert_allclose(np.asarray(y_kernel),
                                   np.asarray(y_einsum), atol=2e-5)


def test_window_attn_partitions_over_data_axis():
    """Batch-sharded windows stay sharded through the fused kernel: no
    all-gather in fwd or bwd; the bias cotangent is the one all-reduce."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import cvnets_tpu.ops.pallas.mha_attn as M
    from cvnets_tpu.ops.pallas.window_attn import fused_window_attention

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    q, k, v, bias, mask = _win_qkv(B=8, nW=4)
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    try:
        M._INTERPRET = True
        f = jax.jit(lambda q, k, v, b: fused_window_attention(
            q, k, v, 3, b, mask))
        out = f(qs, ks, vs, bias)
        assert "all-gather" not in f.lower(qs, ks, vs, bias).compile().as_text()
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(f(q, k, v, bias)), atol=1e-6)
        g = jax.jit(jax.grad(
            lambda q, k, v, b: jnp.sum(fused_window_attention(
                q, k, v, 3, b, mask) ** 2), argnums=(0, 3)))
        txt = g.lower(qs, ks, vs, bias).compile().as_text()
        assert "all-gather" not in txt
        dq_s, db_s = g(qs, ks, vs, bias)
        dq_r, db_r = g(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(dq_s), np.asarray(dq_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(db_s), np.asarray(db_r),
                                   rtol=1e-5, atol=1e-4)
    finally:
        M._INTERPRET = False


# ------------------------------------------------------- fused seg resize+CE
@pytest.mark.parametrize("ls,use_wts", [(0.0, False), (0.1, True)])
def test_seg_ce_kernel_interpret_mode(ls, use_wts):
    """Fwd AND bwd Pallas kernels (ops/pallas/seg_ce_kernel.py) under the CPU
    interpreter vs upsample-then-CE: value and dlogits must match."""
    from cvnets_tpu.ops.pallas.seg_ce_kernel import pallas_resize_ce
    from cvnets_tpu.ops.seg_ce import resize_matrix

    rng = np.random.default_rng(11)
    b, h, w, c = 2, 6, 5, 7
    hh, ww = 32, 40
    logits = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    target = rng.integers(0, c, size=(b, hh, ww)).astype(np.int32)
    target[0, :4, :] = 255
    target = jnp.asarray(target)
    wts = (jnp.asarray(rng.uniform(0.5, 2.0, (1, c)).astype(np.float32))
           if use_wts else jnp.ones((1, c), jnp.float32))
    ah, aw = resize_matrix(hh, h), resize_matrix(ww, w)

    def naive(lo):
        up = jax.image.resize(lo, (b, hh, ww, c), method="bilinear")
        valid = target != 255
        safe = jnp.where(valid, target, 0)
        lse = jax.nn.logsumexp(up, axis=-1)
        picked = jnp.take_along_axis(up, safe[..., None], axis=-1)[..., 0]
        lp = lse - picked
        if ls > 0:
            lp = (1 - ls) * lp + ls * (lse - jnp.mean(up, axis=-1))
        lp = lp * jnp.take(wts[0], safe) * valid
        return jnp.sum(lp) / jnp.maximum(jnp.sum(valid), 1)

    def fused(lo):
        return pallas_resize_ce(255, ls, 8, True, use_wts,
                                lo, target, ah, aw, wts)

    v_naive, g_naive = jax.value_and_grad(naive)(logits)
    v_fused, g_fused = jax.value_and_grad(fused)(logits)
    assert abs(float(v_naive) - float(v_fused)) < 2e-5
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_naive),
                               rtol=2e-4, atol=2e-6)


def test_seg_ce_kernel_bf16_model_dtype():
    """bf16 logits: interp + CE run fp32 in-kernel (bf16 Mosaic matmul
    variants stall the compiler — seg_ce_kernel._h_interp docstring), and
    dlogits comes back in the logits dtype; value tracks fp32 to bf16
    input noise."""
    from cvnets_tpu.ops.pallas.seg_ce_kernel import pallas_resize_ce
    from cvnets_tpu.ops.seg_ce import resize_matrix

    rng = np.random.default_rng(12)
    b, h, w, c = 2, 4, 4, 9
    hh, ww = 16, 16
    lo32 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, c, size=(b, hh, ww)).astype(np.int32))
    wts = jnp.ones((1, c), jnp.float32)
    ah, aw = resize_matrix(hh, h), resize_matrix(ww, w)

    def run(lo):
        return pallas_resize_ce(255, 0.0, 8, True, False,
                                lo, target, ah, aw, wts)

    v32, g32 = jax.value_and_grad(run)(lo32)
    v16, g16 = jax.value_and_grad(run)(lo32.astype(jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16
    assert abs(float(v32) - float(v16)) < 3e-2
    np.testing.assert_allclose(np.asarray(g16, dtype=np.float32),
                               np.asarray(g32), rtol=0.1, atol=3e-3)

"""Training-side fused DiffNet stack (custom VJP) parity tests.

ops/pallas/diffnet_stack.residual_stack_train must match the
differentiable lax.scan path — value AND all gradients — in CPU interpret
mode (true fp32 there, so tolerances are tight).  Also covers the vmapped
batch path and the full diffnet.apply integration including loss grads
through the conditioner and the step MLP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.models import diffnet
from diffsvc_tpu.ops.pallas import diffnet_stack as stack

L, CYC, T, C = 4, 2, 128, 128


@pytest.fixture(scope="module")
def args():
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 10))
    x0 = jax.random.normal(next(ks), (T, C)) * 0.3
    sb = jax.random.normal(next(ks), (L, C)) * 0.2
    cp = jax.random.normal(next(ks), (L, T, 2 * C)) * 0.2
    wd = jax.random.normal(next(ks), (L, 3, C, 2 * C)) * 0.05
    bd = jax.random.normal(next(ks), (L, 2 * C)) * 0.1
    wo = jax.random.normal(next(ks), (L, C, 2 * C)) * 0.05
    bo = jax.random.normal(next(ks), (L, 2 * C)) * 0.1
    return x0, sb, cp, wd, bd, wo, bo


def ref_stack(x0, sb, cp, wd, bd, wo, bo):
    """Pure-JAX reference of the residual stack (same math as the kernel
    and as models/diffnet._residual_block)."""
    x, skip = x0, jnp.zeros((T, C))
    for l in range(L):
        d = 2 ** (l % CYC)
        y = x + sb[l][None, :]
        yp = jnp.pad(y, ((d, d), (0, 0)))
        z = (yp[:T] @ wd[l, 0] + y @ wd[l, 1] + yp[2 * d:] @ wd[l, 2]
             + bd[l][None, :] + cp[l])
        h = jax.nn.sigmoid(z[:, :C]) * jnp.tanh(z[:, C:])
        o = h @ wo[l] + bo[l][None, :]
        x = (x + o[:, :C]) / np.sqrt(2.0)
        skip = skip + o[:, C:]
    return skip


def test_forward_matches_reference(args):
    got = stack.residual_stack_train(*args, CYC, True)
    want = ref_stack(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(args):
    tgt = jax.random.normal(jax.random.PRNGKey(9), (T, C))

    def loss_k(*a):
        return jnp.sum((stack.residual_stack_train(*a, CYC, True) - tgt) ** 2)

    def loss_r(*a):
        return jnp.sum((ref_stack(*a) - tgt) ** 2)

    lk, gk = jax.value_and_grad(loss_k, argnums=tuple(range(7)))(*args)
    lr, gr = jax.value_and_grad(loss_r, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-5)
    names = ["dx0", "dsb", "dcp", "dwd", "dbd", "dwo", "dbo"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=n)


def test_vmapped_batch(args):
    x0, sb, cp, wd, bd, wo, bo = args
    B = 2
    xb = jnp.stack([x0, x0 * 0.5 + 0.1])
    sbb = jnp.stack([sb, sb * 0.7], axis=1)        # [L, B, C]
    cpb = jnp.stack([cp, cp * 0.9], axis=1)        # [L, B, T, 2C]

    def one(x1, sb1, cp1):
        return stack.residual_stack_train(x1, sb1, cp1, wd, bd, wo, bo,
                                          CYC, True)

    got = jax.vmap(one, in_axes=(0, 1, 1))(xb, sbb, cpb)
    for b in range(B):
        want = ref_stack(xb[b], sbb[:, b], cpb[:, b], wd, bd, wo, bo)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_diffnet_apply_training_grads():
    """Full integration: diffnet.apply with pallas_train='interpret' must
    match the scan path's loss and parameter gradients (incl conditioner
    and step-MLP paths that flow through the kernel's dcp/dsb)."""
    cfg = diffnet.DiffNetConfig(
        in_dims=16, encoder_hidden=32, residual_layers=L,
        residual_channels=C, dilation_cycle_length=CYC)
    cfg_k = cfg._replace(pallas_train="interpret", train_stream="f32")
    params = diffnet.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(2, T, 16), jnp.float32)
    tstep = jnp.asarray([3, 7], jnp.int32)
    cond = jnp.asarray(rng.randn(2, T, 32) * 0.3, jnp.float32)
    tgt = jnp.asarray(rng.randn(2, T, 16), jnp.float32)

    def loss(c, p):
        out = diffnet.apply(p, c, spec, tstep, cond)
        return jnp.mean((out - tgt) ** 2)

    l_r, g_r = jax.value_and_grad(lambda p: loss(cfg, p))(params)
    l_k, g_k = jax.value_and_grad(lambda p: loss(cfg_k, p))(params)
    np.testing.assert_allclose(float(l_k), float(l_r), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_k = jax.tree.leaves(g_k)
    for (path, a), b in zip(flat_r, flat_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_diffnet_apply_training_grads_shard_map():
    """Multi-chip fused train kernel: with a data-only mesh declared via
    set_train_mesh, the kernel runs inside shard_map (one pallas call per
    device on its local batch shard). Loss and every parameter gradient
    must match (a) the unsharded kernel bitwise-level and (b) the scan
    path at the usual tolerance, on the 8-virtual-device CPU mesh."""
    from diffsvc_tpu.parallel.mesh import make_mesh

    cfg = diffnet.DiffNetConfig(
        in_dims=16, encoder_hidden=32, residual_layers=L,
        residual_channels=C, dilation_cycle_length=CYC)
    cfg_k = cfg._replace(pallas_train="interpret", train_stream="f32")
    cfg_off = cfg._replace(pallas_train="off")
    params = diffnet.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    B = 8
    spec = jnp.asarray(rng.randn(B, T, 16), jnp.float32)
    tstep = jnp.asarray(rng.randint(0, 50, B), jnp.int32)
    cond = jnp.asarray(rng.randn(B, T, 32) * 0.3, jnp.float32)
    tgt = jnp.asarray(rng.randn(B, T, 16), jnp.float32)

    def loss(c, p):
        out = diffnet.apply(p, c, spec, tstep, cond)
        return jnp.mean((out - tgt) ** 2)

    # unsharded kernel (no mesh declared)
    prev = diffnet.set_train_mesh(None)
    try:
        l_plain, g_plain = jax.value_and_grad(
            lambda p: loss(cfg_k, p))(params)
        l_scan, g_scan = jax.value_and_grad(
            lambda p: loss(cfg_off, p))(params)

        mesh = make_mesh(("data",))
        assert mesh.shape["data"] == 8
        diffnet.set_train_mesh(mesh)
        l_sm, g_sm = jax.value_and_grad(lambda p: loss(cfg_k, p))(params)
    finally:
        diffnet.set_train_mesh(prev)

    # (a) shard_map vs unsharded kernel: same kernel math on batch shards;
    # only the dsb/dcp/weight-grad reductions reassociate (psum tree vs a
    # flat batch sum) — ulp-level
    np.testing.assert_allclose(float(l_sm), float(l_plain), rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_s = jax.tree.leaves(g_sm)
    for (path, a), b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))

    # (b) shard_map kernel vs scan: the existing integration tolerance
    np.testing.assert_allclose(float(l_sm), float(l_scan), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(g_scan)
    for (path, a), b in zip(flat_r, jax.tree.leaves(g_sm)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_shardable_data_mesh_gating():
    """seq-sharded or indivisible meshes must fall back to the scan."""
    from diffsvc_tpu.parallel.mesh import make_mesh

    prev = diffnet.set_train_mesh(None)
    try:
        assert diffnet._shardable_data_mesh(8) is None  # no mesh declared
        mesh = make_mesh(("data",))
        diffnet.set_train_mesh(mesh)
        assert diffnet._shardable_data_mesh(8) is mesh
        assert diffnet._shardable_data_mesh(6) is None  # indivisible batch
        mesh2 = make_mesh(("data", "seq"), shape=(4, 2))
        diffnet.set_train_mesh(mesh2)
        assert diffnet._shardable_data_mesh(8) is None  # seq shards T
    finally:
        diffnet.set_train_mesh(prev)


# ---------------------------------------------------------------------------
# Batch-fused backward (residual_stack_train_batched): one (layer, batch)
# grid kernel with in-VMEM weight-grad accumulation.  f32 streams must match
# the reference tightly (same math, different reduction order over the
# batch); bf16 streams round the conditioner addend / saved activations /
# cotangents, so the tolerance is the bf16 epsilon scale (~4e-3 relative) —
# matmul OPERAND rounding is identical either way (Mosaic single-pass bf16).
# ---------------------------------------------------------------------------

def _batched_args(args, B=3):
    x0, sb, cp, wd, bd, wo, bo = args
    ks = iter(jax.random.split(jax.random.PRNGKey(42), 6))
    xb = jnp.stack([x0 * (0.5 + 0.3 * i) + 0.05 * i for i in range(B)])
    sbb = jnp.stack([sb * (1.0 - 0.1 * i) for i in range(B)], axis=1)
    cpb = jnp.stack([cp * (1.0 + 0.05 * i) for i in range(B)], axis=1)
    return xb, sbb, cpb, wd, bd, wo, bo


def ref_stack_batched(x0, sb, cp, wd, bd, wo, bo):
    def one(x1, sb1, cp1):
        return ref_stack(x1, sb1, cp1, wd, bd, wo, bo)

    return jax.vmap(one, in_axes=(0, 1, 1))(x0, sb, cp)


@pytest.mark.parametrize("sd,tol_val,tol_grad", [
    ("f32", 2e-5, 2e-5),
    ("bf16", 2e-2, 6e-3),
])
def test_batched_train_parity(args, sd, tol_val, tol_grad):
    a = _batched_args(args)
    got = stack.residual_stack_train_batched(*a, CYC, True, sd)
    want = ref_stack_batched(*a)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol_val, atol=tol_val * scale)

    tgt = jax.random.normal(jax.random.PRNGKey(9), got.shape)

    def loss_k(*aa):
        return jnp.sum(
            (stack.residual_stack_train_batched(*aa, CYC, True, sd) - tgt)
            ** 2)

    def loss_r(*aa):
        return jnp.sum((ref_stack_batched(*aa) - tgt) ** 2)

    lk, gk = jax.value_and_grad(loss_k, argnums=tuple(range(7)))(*a)
    lr, gr = jax.value_and_grad(loss_r, argnums=tuple(range(7)))(*a)
    np.testing.assert_allclose(float(lk), float(lr), rtol=tol_val)
    names = ["dx0", "dsb", "dcp", "dwd", "dbd", "dwo", "dbo"]
    for n, x, y in zip(names, gk, gr):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype, n  # cotangents keep the primal dtype
        denom = np.max(np.abs(y)) + 1e-9
        relmax = np.max(np.abs(x - y)) / denom
        assert relmax < tol_grad, (n, relmax)


def test_batched_train_single_sample(args):
    """B == 1 exercises the b==0-only accumulation path."""
    x0, sb, cp, wd, bd, wo, bo = args
    a = (x0[None], sb[:, None], cp[:, None], wd, bd, wo, bo)
    got = stack.residual_stack_train_batched(*a, CYC, True, "f32")
    want = ref_stack(x0, sb, cp, wd, bd, wo, bo)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_diffnet_apply_training_grads_bf16_stream():
    """apply with the production bf16-stream batched kernel: loss/grads
    track the scan within mixed-precision tolerance."""
    cfg = diffnet.DiffNetConfig(
        in_dims=16, encoder_hidden=32, residual_layers=L,
        residual_channels=C, dilation_cycle_length=CYC)
    cfg_k = cfg._replace(pallas_train="interpret")  # train_stream bf16 default
    assert cfg_k.train_stream == "bf16"
    params = diffnet.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(2, T, 16), jnp.float32)
    tstep = jnp.asarray([3, 7], jnp.int32)
    cond = jnp.asarray(rng.randn(2, T, 32) * 0.3, jnp.float32)
    tgt = jnp.asarray(rng.randn(2, T, 16), jnp.float32)

    def loss(c, p):
        out = diffnet.apply(p, c, spec, tstep, cond)
        return jnp.mean((out - tgt) ** 2)

    l_r, g_r = jax.value_and_grad(lambda p: loss(cfg, p))(params)
    l_k, g_k = jax.value_and_grad(lambda p: loss(cfg_k, p))(params)
    np.testing.assert_allclose(float(l_k), float(l_r), rtol=5e-3)
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    for (path, a), b in zip(flat_r, jax.tree.leaves(g_k)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.max(np.abs(a)) + 1e-8
        relmax = np.max(np.abs(b - a)) / denom
        assert relmax < 3e-2, (jax.tree_util.keystr(path), relmax)


def test_supported_train_batched_gate():
    assert stack.supported_train_batched(20, 4, 1024, 384, 24)
    # dx carry too large for VMEM -> fall back (B=32 bf16 is borderline
    # once Mosaic's ~30 MB of stack temporaries are budgeted; B=24 f32
    # measured a real 100.5 MB ask and must be rejected)
    assert not stack.supported_train_batched(20, 4, 1024, 384, 32)
    assert not stack.supported_train_batched(20, 4, 1024, 384, 24,
                                             stream_esize=4)
    assert not stack.supported_train_batched(20, 4, 1024, 384, 64)
    # unaligned shapes
    assert not stack.supported_train_batched(20, 4, 1000, 384, 8)
    assert not stack.supported_train_batched(20, 4, 1024, 100, 8)

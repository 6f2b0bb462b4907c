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
    cfg_k = cfg._replace(pallas_train="interpret")
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
    cfg_k = cfg._replace(pallas_train="interpret")
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

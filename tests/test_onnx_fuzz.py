"""Fuzz the jaxpr->ONNX converter: random compositions of the op
vocabulary the real exports use, checked numerically through the numpy
runtime against jax's own output. Deterministic seeds — failures
reproduce. Complements the targeted tests in test_onnx_export.py (which
found reverse-CumSum and integer-Div semantics bugs only because a case
happened to hit them; this sweeps the space)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.onnx import OnnxRunner, export_onnx


def _random_program(rng: np.random.RandomState):
    """Build (fn, args): a random chain over [B, T, C] activations using
    the converter's supported vocabulary."""
    B, T, C = 2, int(rng.randint(5, 12)), int(rng.randint(3, 9))
    C2 = int(rng.randint(3, 9))
    x = rng.randn(B, T, C).astype(np.float32)
    w = rng.randn(C, C2).astype(np.float32)
    b = rng.randn(C2).astype(np.float32)
    g = rng.randn(1, 1, C2).astype(np.float32)
    n_ops = int(rng.randint(3, 8))
    choices = rng.randint(0, 18, size=n_ops)
    axis = int(rng.randint(0, 3))
    shift_t = int(rng.randint(1, T))

    def fn(xv):
        h = xv @ w + b
        for c in choices:
            c = int(c)
            if c == 0:
                h = jax.nn.relu(h)
            elif c == 1:
                h = jnp.tanh(h)
            elif c == 2:
                h = jax.nn.sigmoid(h) * h  # silu via primitives
            elif c == 3:
                h = h * g + 0.5
            elif c == 4:
                h = jnp.cumsum(h, axis=1)
            elif c == 5:
                h = jax.lax.cumsum(h, axis=1, reverse=True)
            elif c == 6:
                h = jnp.flip(h, axis=1)
            elif c == 7:
                h = jnp.pad(h, ((0, 0), (1, 2), (0, 0)))[:, : h.shape[1]]
            elif c == 8:
                # a real rotation (not an identity reassembly), so concat
                # operand ordering and slice offsets are discriminating
                h = jnp.concatenate([h[:, shift_t:], h[:, :shift_t]], axis=1)
            elif c == 9:
                h = h - h.mean(axis=axis, keepdims=True)
            elif c == 10:
                h = h / (jnp.sqrt(jnp.maximum(
                    (h * h).mean(axis=-1, keepdims=True), 1e-6)))
            elif c == 11:
                h = jnp.maximum(h, 0.1 * h)  # leaky relu via primitives
            # 12-17: the dpmpp step graph's scalar-ladder op classes
            # (onnx/svc_export.py export_dpmpp_onnx) — exp/expm1 on
            # negative log-SNR steps, sqrt alpha/sigma ratios, the x0
            # clamp, where-masks, log1p — bounded so random chains
            # stay finite
            elif c == 12:
                h = jnp.exp(-jnp.abs(h))
            elif c == 13:
                h = jnp.expm1(-jnp.abs(h)) + 0.5
            elif c == 14:
                h = jnp.sqrt(jnp.abs(h) + 1e-3)
            elif c == 15:
                h = jnp.clip(h, -1.0, 1.0)
            elif c == 16:
                h = jnp.where(h > 0, h, jnp.tanh(h))
            else:
                h = jnp.log1p(jnp.abs(h))
        return h.sum(axis=-1)

    return fn, (x,)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_random_programs(seed):
    rng = np.random.RandomState(1234 + seed)
    fn, args = _random_program(rng)
    want = np.asarray(fn(*[jnp.asarray(a) for a in args]))
    model = export_onnx(fn, args, input_names=["x"], output_names=["y"],
                        graph_name=f"fuzz{seed}")
    got = OnnxRunner(model)(*args)[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fuzz_integer_index_arithmetic():
    """Index-math heavy path: gather + integer div/mod arithmetic with
    negatives, the class of ops where floor-vs-trunc semantics bite."""
    rng = np.random.RandomState(7)
    tab = rng.randn(16, 4).astype(np.float32)
    idx = rng.randint(-7, 15, size=(6,)).astype(np.int32)

    def fn(iv):
        tj = jnp.asarray(tab)
        j = jnp.clip(iv, 0, 15)
        k = (j * 3 - 5) // 2          # floor div with negatives
        k = jnp.clip(jnp.abs(k) % 16, 0, 15)
        return tj[j] + tj[k] * 0.5

    want = np.asarray(fn(jnp.asarray(idx)))
    model = export_onnx(fn, (idx,), input_names=["i"], output_names=["y"],
                        graph_name="fuzz_int")
    got = OnnxRunner(model)(idx)[0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_conv_programs(seed):
    """Random dilated-conv / transposed-conv chains (the vocoder export's
    op class) with random strides/dilations, vs jax numerics."""
    rng = np.random.RandomState(99 + seed)
    B, T, C = 1, int(rng.randint(12, 24)), int(rng.randint(2, 6))
    x = rng.randn(B, T, C).astype(np.float32)
    k = int(rng.choice([3, 5]))
    d = int(rng.choice([1, 2, 4]))
    s = int(rng.choice([1, 2]))
    wc = rng.randn(k, C, C).astype(np.float32)     # conv HIO
    wt = rng.randn(k, C, C).astype(np.float32)     # convT [k, out, in]

    def fn(xv):
        h = jax.lax.conv_general_dilated(
            xv, wc, window_strides=(1,), padding=[(d * (k - 1) // 2,) * 2],
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"))
        h = jnp.tanh(h)
        h = jax.lax.conv_transpose(
            h, wt, strides=(s,), padding=[((k - s) // 2, (k - s + 1) // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
        return jax.nn.relu(h)

    want = np.asarray(fn(jnp.asarray(x)))
    model = export_onnx(fn, (x,), input_names=["x"], output_names=["y"],
                        graph_name=f"fuzzconv{seed}")
    got = OnnxRunner(model)(x)[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

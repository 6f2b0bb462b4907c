"""Full-chain CREPE parity with shared random weights (VERDICT r2 #6).

The conv stack already has torch-parity coverage
(tests/test_crepe_petask.py::test_crepe_conv_padding_torch_parity); this
test extends it to the COMPLETE pipeline the reference runs
(``preprocessing/data_gen_utils.py:191-230`` through torchcrepe):

    wav -> centered 1024 frames (hop 80, z-score) -> model posteriors
        -> Viterbi decode (softmax obs, band-12 transition, uniform init)
        -> weighted-average cents in a +/-4-bin window -> periodicity
        -> median filter 3 -> A-weighted -60 dB silence gate
        -> periodicity threshold -> NaN-aware mean filter 3 -> NaN->0
        -> linear interp of voiced f0 onto mel frame times -> coarse bins

against an INDEPENDENT transcription of torchcrepe's chain: torch ops for
the model, plain numpy loops for viterbi/filters/interp, written from the
torchcrepe algorithm spec — never calling the repo's implementations.
Weights are random (repo init), so only the real weight file remains
untested (not obtainable in this environment; see VERDICT r2).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from diffsvc_tpu.config import HParams  # noqa: E402
from diffsvc_tpu.ops import crepe  # noqa: E402

SR, HOP, WINDOW, N_BINS = 16000, 80, 1024, 360


# ---------------------------------------------------------------------------
# independent torch/numpy transcription of the torchcrepe chain
# ---------------------------------------------------------------------------

def torch_frames(wav: np.ndarray) -> torch.Tensor:
    x = torch.from_numpy(wav.astype(np.float32))
    x = F.pad(x[None, None], (WINDOW // 2, WINDOW // 2))[0, 0]
    n = 1 + len(wav) // HOP
    frames = x.unfold(0, WINDOW, HOP)[:n]
    mean = frames.mean(dim=1, keepdim=True)
    std = frames.std(dim=1, keepdim=True, unbiased=False).clamp_min(1e-10)
    return (frames - mean) / std


def torch_model(params, frames: torch.Tensor) -> torch.Tensor:
    """torchcrepe full model: 6 conv layers (relu -> BN -> maxpool2) then
    a 2048 -> 360 linear + sigmoid; 'same' zero padding, low-side-first."""
    x = frames[:, None, :, None]  # [N, 1, 1024, 1]
    for lp, k, s in zip(params["layers"], crepe.KERNELS, crepe.STRIDES):
        w = torch.from_numpy(np.asarray(lp["conv"]["w"]))      # [k, in, out]
        wt = w.permute(2, 1, 0)[:, :, :, None].contiguous()    # [out, in, k, 1]
        b = torch.from_numpy(np.asarray(lp["conv"]["b"]))
        pad_lo = (k - s) // 2 if s > 1 else (k - 1) // 2
        pad_hi = k - s - pad_lo if s > 1 else k // 2
        x = F.pad(x, (0, 0, pad_lo, pad_hi))
        x = F.conv2d(x, wt, b, stride=(s, 1))
        x = F.relu(x)
        bn = lp["bn"]
        x = F.batch_norm(x, torch.from_numpy(np.asarray(bn["mean"])),
                         torch.from_numpy(np.asarray(bn["var"])),
                         torch.from_numpy(np.asarray(bn["scale"])),
                         torch.from_numpy(np.asarray(bn["bias"])), eps=1e-5)
        x = F.max_pool2d(x, (2, 1), (2, 1))
    x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)          # time-major
    wl = torch.from_numpy(np.asarray(params["classifier"]["w"]))
    bl = torch.from_numpy(np.asarray(params["classifier"]["b"]))
    return torch.sigmoid(x @ wl + bl)


def np_viterbi(probs: np.ndarray) -> np.ndarray:
    """librosa.sequence.viterbi as torchcrepe uses it: observations =
    softmax(posteriors), transition = normalized max(12 - |i-j|, 0),
    uniform initial; max-product in log domain with backtracking."""
    n_frames, n = probs.shape
    i = np.arange(n)
    trans = np.maximum(12 - np.abs(i[:, None] - i[None, :]), 0).astype(float)
    trans = trans / trans.sum(axis=1, keepdims=True)
    log_trans = np.log(np.maximum(trans, 1e-12))
    e = np.exp(probs - probs.max(axis=1, keepdims=True))
    obs = np.log(e / e.sum(axis=1, keepdims=True))
    score = obs[0] + np.log(1.0 / n)
    back = np.zeros((n_frames, n), np.int64)
    for t in range(1, n_frames):
        total = score[:, None] + log_trans
        back[t] = total.argmax(axis=0)
        score = total.max(axis=0) + obs[t]
    path = np.zeros(n_frames, np.int64)
    path[-1] = score.argmax()
    for t in range(n_frames - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path


def np_decode(probs: np.ndarray):
    """Viterbi bins -> weighted-average cents over +/-4 bins (sigmoid
    probs as weights) -> Hz; periodicity = prob at the decoded bin."""
    bins = np_viterbi(probs)
    f0 = np.zeros(len(bins))
    pd = np.zeros(len(bins))
    for t, b in enumerate(bins):
        lo, hi = max(0, b - 4), min(N_BINS - 1, b + 4)
        idx = np.arange(b - 4, b + 5)
        idx = np.clip(idx, 0, N_BINS - 1)
        w = probs[t, idx]
        cents = 20.0 * idx + 1997.3794084376191
        f0[t] = 10.0 * 2 ** ((w * cents).sum() / w.sum() / 1200.0)
        pd[t] = probs[t, b]
        del lo, hi
    return f0, pd


def np_median3(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=float)
    for t in range(len(x)):
        vals = [v for v in x[max(0, t - 1): t + 2] if not np.isnan(v)]
        out[t] = np.median(vals) if vals else np.nan
    return out


def np_mean3(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=float)
    for t in range(len(x)):
        vals = [v for v in x[max(0, t - 1): t + 2] if not np.isnan(v)]
        out[t] = np.mean(vals) if vals else np.nan
    return out


def np_a_weighted(wav: np.ndarray) -> np.ndarray:
    """torchcrepe loudness.a_weighted: dB STFT magnitude + A-weighting
    - 20 dB ref, floored at -100, averaged over bins."""
    pad = WINDOW // 2
    w = np.pad(wav.astype(np.float64), (pad, pad))
    n = 1 + len(wav) // HOP
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(WINDOW) / WINDOW)
    frames = np.stack([w[t * HOP: t * HOP + WINDOW] * hann for t in range(n)])
    mag = np.abs(np.fft.rfft(frames, axis=1))
    ref = mag.max()
    db = 20 * np.log10(np.maximum(mag, 1e-5))
    db = np.maximum(db, 20 * np.log10(max(ref, 1e-5)) - 80.0)
    freqs = np.fft.rfftfreq(WINDOW, 1.0 / SR)
    f2 = freqs ** 2
    c = [12194.217 ** 2, 20.598997 ** 2, 107.65265 ** 2, 737.86223 ** 2]
    with np.errstate(divide="ignore"):
        aw = 2.0 + 20.0 * (np.log10(c[0]) + 2 * np.log10(np.maximum(f2, 0))
                           - np.log10(f2 + c[0]) - np.log10(f2 + c[1])
                           - 0.5 * np.log10(f2 + c[2])
                           - 0.5 * np.log10(f2 + c[3]))
    aw = np.maximum(aw, -80.0)
    return np.maximum(db + aw - 20.0, -100.0).mean(axis=1)


def torchcrepe_chain(params, wav: np.ndarray, mel_len: int, hp,
                     threshold=0.05):
    probs = torch_model(params, torch_frames(wav)).numpy()
    f0, pd = np_decode(probs)
    pd = np_median3(pd)
    pd[np_a_weighted(wav)[: len(pd)] < -60.0] = 0.0
    f0 = np.where(pd < threshold, np.nan, f0)
    f0 = np_mean3(f0)
    f0 = np.where(np.isnan(f0), 0.0, f0)
    nz = np.nonzero(f0)[0]
    tf = np.arange(mel_len) * hp["hop_size"] / hp["audio_sample_rate"]
    if len(nz) == 0:
        return np.zeros(mel_len)
    return np.interp(tf, 0.005 * nz, f0[nz], left=f0[nz[0]],
                     right=f0[nz[-1]])


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    import jax

    params = crepe.init(jax.random.PRNGKey(3))
    # make BN stats non-trivial so the parity isn't BN-degenerate
    rng = np.random.RandomState(5)
    import jax.numpy as jnp
    for lp in params["layers"]:
        f = lp["bn"]["mean"].shape[0]
        lp["bn"]["mean"] = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
        lp["bn"]["var"] = jnp.asarray(
            (0.5 + rng.rand(f).astype(np.float32)))
        lp["bn"]["scale"] = jnp.asarray(
            (0.8 + 0.4 * rng.rand(f).astype(np.float32)))
        lp["bn"]["bias"] = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)

    # 1.0 s @ 16 kHz: harmonic voice + silence gap + noise floor
    t = np.arange(SR) / SR
    f0c = 220.0 * 2 ** (0.05 * np.sin(2 * np.pi * 5 * t))
    ph = np.cumsum(2 * np.pi * f0c / SR)
    wav = (0.4 * np.sin(ph) + 0.2 * np.sin(2 * ph)
           + 0.02 * rng.randn(len(t))).astype(np.float32)
    wav[int(0.45 * SR): int(0.55 * SR)] *= 0.001
    hp = HParams(audio_sample_rate=SR, hop_size=160, f0_bin=256,
                 f0_min=40.0, f0_max=1100.0, crepe_path="/nonexistent")
    return params, wav, hp


def test_full_chain_parity(setup):
    params, wav, hp = setup
    mel_len = len(wav) // hp["hop_size"] + 1
    mel = np.zeros((mel_len, 8), np.float32)

    got_f0, got_coarse = crepe.get_pitch_crepe(wav, mel, hp, params=params)
    want_f0 = torchcrepe_chain(params, wav, mel_len, hp)

    assert got_f0.shape == want_f0.shape
    # voicing (zero/nonzero pattern) must agree exactly
    np.testing.assert_array_equal(got_f0 > 0, want_f0 > 0)
    voiced = want_f0 > 0
    if voiced.any():
        np.testing.assert_allclose(got_f0[voiced], want_f0[voiced],
                                   rtol=2e-4)

    from diffsvc_tpu.ops.pitch import f0_to_coarse
    want_coarse = f0_to_coarse(want_f0.astype(np.float32), hp["f0_bin"],
                               hp["f0_min"], hp["f0_max"])
    np.testing.assert_array_equal(got_coarse, want_coarse)


def test_stage_parity_posteriors(setup):
    """Posterior parity in isolation pins the frame/z-score conventions in
    addition to the already-covered conv numerics."""
    params, wav, _ = setup
    import jax.numpy as jnp

    frames_np = crepe.frame_audio(wav)
    frames_t = torch_frames(wav).numpy()
    np.testing.assert_allclose(frames_np, frames_t, atol=1e-5)
    probs_jax = np.asarray(crepe.forward(params, jnp.asarray(frames_np)))
    probs_t = torch_model(params, torch_frames(wav)).numpy()
    np.testing.assert_allclose(probs_jax, probs_t, atol=2e-5)


def test_stage_parity_decode(setup):
    params, wav, _ = setup
    import jax.numpy as jnp

    probs = np.asarray(crepe.forward(params, jnp.asarray(
        crepe.frame_audio(wav))))
    f0_j, pd_j = (np.asarray(a) for a in crepe.decode(jnp.asarray(probs)))
    f0_n, pd_n = np_decode(probs.astype(np.float64))
    np.testing.assert_allclose(f0_j, f0_n, rtol=1e-4)
    np.testing.assert_allclose(pd_j, pd_n, atol=1e-6)

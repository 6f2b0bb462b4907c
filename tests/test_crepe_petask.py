import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.ops import crepe


def test_crepe_forward_shapes():
    params = crepe.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(np.random.RandomState(0).randn(4, 1024), jnp.float32)
    probs = crepe.forward(params, frames)
    assert probs.shape == (4, 360)
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1).all()


def test_crepe_frame_grid():
    wav = np.zeros(16000, np.float32)
    frames = crepe.frame_audio(wav)
    assert frames.shape == (1 + 16000 // 80, 1024)


def test_crepe_decode_peaked_posteriors():
    """A posterior sharply peaked at a bin must decode to that bin's
    frequency."""
    n = 50
    target_bin = 180
    probs = np.full((n, 360), 1e-4, np.float32)
    probs[:, target_bin] = 0.95
    f0, pd = (np.asarray(a) for a in crepe.decode(jnp.asarray(probs)))
    expect = crepe.cents_to_frequency(crepe.bins_to_cents(target_bin))
    np.testing.assert_allclose(f0, expect, rtol=1e-3)
    assert (pd > 0.9).all()


def test_crepe_bin_frequency_mapping():
    # bin 0 -> 10*2^(1997.38/1200) ~= 31.70 Hz (CREPE's published offset)
    f = crepe.cents_to_frequency(crepe.bins_to_cents(0.0))
    np.testing.assert_allclose(f, 31.70, atol=0.01)
    # 60 bins = 1200 cents = 1 octave
    f2 = crepe.cents_to_frequency(crepe.bins_to_cents(60.0))
    np.testing.assert_allclose(f2 / f, 2.0, rtol=1e-6)


def test_pe_task_train_step():
    from diffsvc_tpu.training.pe_task import PitchExtractionTask

    hp = HParams(
        audio_num_mel_bins=16, hidden_size=32, predictor_hidden=-1,
        predictor_kernel=5, pitch_type="frame", use_uv=True,
        pitch_norm="log", lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0,
        lambda_f0=1.0, lambda_uv=1.0, pitch_loss="l2",
        pitch_extractor_conv_layers=2,
    )
    task = PitchExtractionTask(hp)
    state = task.init_state()
    rng = np.random.RandomState(0)
    batch = {
        "mels": rng.randn(2, 32, 16).astype(np.float32),
        "f0": np.full((2, 32), 7.78, np.float32),
        "uv": np.zeros((2, 32), np.float32),
        "pitch": np.full((2, 32), 100, np.int64),
    }
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(5):
        state, metrics = task.train_step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learns the constant target quickly


def test_crepe_filters_are_nan_aware():
    """torchcrepe filter parity: NaN neighbors are missing values, not
    zeros — a voiced frame next to an unvoiced gap must keep its pitch."""
    from diffsvc_tpu.ops.crepe import mean_filter, median_filter

    f0 = np.array([np.nan, 440.0, 442.0, np.nan, np.nan], np.float64)
    m = mean_filter(f0, 3)
    np.testing.assert_allclose(m[1], 441.0)       # mean of {440, 442}
    np.testing.assert_allclose(m[2], 441.0)       # mean of {440, 442}
    assert np.isnan(m[4])                         # all-NaN window stays NaN
    md = median_filter(np.array([1.0, 9.0, 2.0, 3.0, 8.0]), 3)
    np.testing.assert_allclose(md[1:4], [2.0, 3.0, 3.0])


def test_crepe_viterbi_matches_bruteforce():
    import itertools

    import jax.numpy as jnp

    from diffsvc_tpu.ops.crepe import _viterbi

    rng = np.random.RandomState(0)
    n_frames, n_bins = 4, 6
    probs = rng.uniform(0.01, 1.0, (n_frames, n_bins)).astype(np.float32)

    # oracle: max-product over log_softmax obs + band transition prior
    d = np.abs(np.arange(n_bins)[:, None] - np.arange(n_bins)[None, :])
    trans = np.maximum(12 - d, 0).astype(np.float64)
    trans = trans / trans.sum(axis=1, keepdims=True)
    lt = np.log(np.maximum(trans, 1e-12))
    lo = probs - probs.max(axis=1, keepdims=True)
    lo = lo - np.log(np.exp(lo).sum(axis=1, keepdims=True))
    best, best_s = None, -np.inf
    for path in itertools.product(range(n_bins), repeat=n_frames):
        s = lo[0, path[0]] - np.log(n_bins)
        for i in range(1, n_frames):
            s += lt[path[i - 1], path[i]] + lo[i, path[i]]
        if s > best_s:
            best_s, best = s, path
    got = np.asarray(_viterbi(jnp.asarray(probs)))
    np.testing.assert_array_equal(got, np.asarray(best))


def test_crepe_conv_padding_torch_parity():
    """The full conv stack (asymmetric same-padding + pooling + flatten)
    must match an independent torch implementation of torchcrepe's
    layer()/forward() wiring with the SAME converted weights."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from diffsvc_tpu.ops import crepe as C

    rng = np.random.RandomState(1)
    params = C.init(jax.random.PRNGKey(0))
    x_np = rng.randn(2, 1024).astype(np.float32)
    ours = np.asarray(C.forward(params, jnp.asarray(x_np)))

    x = torch.from_numpy(x_np)[:, None, :, None]  # [N, 1, 1024, 1]
    for lp, k, s in zip(params["layers"], C.KERNELS, C.STRIDES):
        w = torch.from_numpy(np.asarray(lp["conv"]["w"]))  # [k, in, out]
        w4 = w.permute(2, 1, 0)[..., None]  # [out, in, k, 1]
        b = torch.from_numpy(np.asarray(lp["conv"]["b"]))
        if s > 1:
            pad = ((k - s) // 2, k - s - (k - s) // 2)
        else:
            pad = ((k - 1) // 2, k // 2)
        x = F.pad(x, (0, 0, pad[0], pad[1]))
        x = F.conv2d(x, w4, b, stride=(s, 1))
        x = F.relu(x)
        bn = lp["bn"]
        x = F.batch_norm(x, torch.from_numpy(np.asarray(bn["mean"])),
                         torch.from_numpy(np.asarray(bn["var"])),
                         torch.from_numpy(np.asarray(bn["scale"])),
                         torch.from_numpy(np.asarray(bn["bias"])), eps=1e-5)
        x = F.max_pool2d(x, (2, 1), (2, 1))
    x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)  # torchcrepe flatten
    w = torch.from_numpy(np.asarray(params["classifier"]["w"]))
    b = torch.from_numpy(np.asarray(params["classifier"]["b"]))
    theirs = torch.sigmoid(x @ w + b).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_a_weighting_curve_standard_values():
    """IEC 61672 A-weighting reference points (0 dB at 1 kHz by definition;
    -19.1 dB at 100 Hz, +1.2 dB at 2 kHz, -1.1 dB at 8 kHz per the
    standard's tables)."""
    from diffsvc_tpu.ops.crepe import a_weighting_db

    vals = a_weighting_db(np.array([100.0, 1000.0, 2000.0, 8000.0]))
    assert abs(vals[1]) < 0.02, vals[1]
    assert abs(vals[0] - (-19.1)) < 0.15, vals[0]
    assert abs(vals[2] - 1.2) < 0.1, vals[2]
    assert abs(vals[3] - (-1.1)) < 0.15, vals[3]
    # DC is floored at the librosa min_db
    assert a_weighting_db(np.array([0.0]))[0] == -80.0


def test_a_weighted_silence_gate_loud_vs_quiet():
    """The -60 dB gate must keep a loud mid-band tone voiced and gate a
    quiet one and true silence. (Note torchcrepe's loudness mean is
    dominated by amplitude_to_db's top_db=80 relative floor, so same-peak
    signals of different frequency read alike — we replicate that, not an
    idealized perceptual meter.)"""
    from diffsvc_tpu.ops.crepe import HOP, a_weighted_loudness

    sr, dur = 16000, 0.5
    t = np.arange(int(sr * dur)) / sr
    loud = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    quiet = (2e-5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)

    n = 1 + len(loud) // HOP
    l_loud = a_weighted_loudness(loud)
    l_quiet = a_weighted_loudness(quiet)
    l_sil = a_weighted_loudness(np.zeros_like(loud))
    assert l_loud.shape == (n,)
    mid = slice(10, n - 10)  # ignore STFT edge frames
    assert np.all(l_loud[mid] > -60.0), l_loud[mid].min()
    assert np.all(l_quiet[mid] < -60.0), l_quiet[mid].max()
    # all-zero input: every weighted bin hits the MIN_DB=-100 floor exactly
    assert np.allclose(l_sil, -100.0)

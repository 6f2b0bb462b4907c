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

"""wav -> log-mel spectrogram as a single jittable stage.

Two numerically distinct variants exist in the reference and both are kept
(they are the vocoders' compatibility surface):

- **pwg** (24 kHz HiFi-GAN path): center-padded constant STFT, |STFT|,
  Slaney-mel, ``log10(max(eps, mel))``  — reference
  ``preprocessing/data_gen_utils.py:96-149``.
- **nsf** (44.1 kHz NSF-HiFiGAN path): reflect pad of (n_fft-hop)/2, no
  center, ``sqrt(re^2+im^2+1e-9)``, Slaney-mel, ``ln(clip(x, 1e-5))`` then
  converted to log10 by ``* 0.434294`` — reference
  ``modules/nsf_hifigan/nvSTFT.py:74-106``, ``network/vocoders/nsf_hifigan.py:91``.

The mel filterbank is an in-repo implementation of the Slaney-style
triangular filterbank (librosa-compatible: htk=False, norm='slaney').

Everything below runs under ``jax.jit`` with static shapes; the STFT is a
strided reshape + windowed rFFT, which XLA fuses into the downstream mel
matmul (MXU) without a custom kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LOG10_E = 0.4342944819032518  # 1/ln(10)
LN_10 = 2.302585092994046


def hz_to_mel(freq, htk: bool = False):
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=16)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
                   htk: bool = False, norm: str = "slaney") -> np.ndarray:
    """Triangular mel filterbank [n_mels, 1+n_fft//2] (librosa-compatible)."""
    if fmax is None or fmax <= 0:
        fmax = sr / 2.0
    if fmin == -1:
        # reference process_utterance: 'fmin = 0 if fmin == -1 else fmin'
        # (data_gen_utils.py:130)
        fmin = 0.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (matches scipy fftbins=True / torch.hann_window)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _use_dft_matmul() -> bool:
    """DFT-as-matmul beats XLA's FFT on TPU; CPU/GPU keep the real FFT."""
    import jax as _jax

    return _jax.default_backend() == "tpu"


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame a padded 1-D signal into [n_frames, n_fft] (no further padding).

    When hop divides n_fft (every shipped profile: 2048/512, 512/128) the
    frames are built gather-free — reshape into [*, hop] blocks and
    concatenate q = n_fft/hop shifted block views — which XLA lowers to
    cheap slices instead of a multi-million-element gather (the same trick
    as ops/resample.py's windows)."""
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    q, rem = divmod(n_fft, hop)
    if rem == 0:
        need = (n_frames - 1 + q) * hop
        blocks = y[:need].reshape(-1, hop)
        return jnp.concatenate([blocks[k: k + n_frames] for k in range(q)],
                               axis=1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[idx]


def _basis_support(basis: np.ndarray):
    """[first, last+1) column range with any filterbank weight: rDFT bins
    outside it multiply a zero basis column, so skipping them is exact."""
    nz = np.nonzero(basis.sum(axis=0) > 0)[0]
    if len(nz) == 0:
        return 0, basis.shape[1]
    return int(nz[0]), int(nz[-1] + 1)


def stft_mag(y: jnp.ndarray, n_fft: int, hop: int, win_length: int,
             center: bool = True, pad_mode: str = "constant",
             mag_eps: float = 0.0, power_floor: float = 0.0,
             bin_lo: int = 0, bin_hi: int = -1,
             dft_precision: str = "highest") -> jnp.ndarray:
    """Magnitude STFT [n_frames, bin_hi-bin_lo] of a 1-D signal.

    ``center=True`` pads n_fft//2 on both sides (librosa semantics); a
    win_length window is zero-padded centered inside the n_fft frame.
    ``bin_lo``/``bin_hi`` restrict the computed rDFT bins (default: all
    1+n_fft//2) — the mel paths pass the filterbank's support so the DFT
    matmul skips bins that would be multiplied by a zero basis row anyway
    (exact same mel, ~25% fewer DFT FLOPs at the 44.1k/fmax=16k profile).
    """
    if bin_hi < 0:
        bin_hi = n_fft // 2 + 1
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode=pad_mode)
    win = hann_window(win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    frames = frame_signal(y, n_fft, hop) * win[None, :]
    if _use_dft_matmul():
        # XLA's TPU FFT is an order of magnitude slower than the MXU for
        # these shapes (~90 ms vs ~5 ms for 862x2048 frames): compute the
        # rDFT as two fp32-highest matmuls against device-generated
        # cos/sin matrices (no large constants in the HLO).
        # range-reduce n*k mod N in int32 BEFORE the float conversion:
        # raw angles reach ~2pi*1e6 rad and large-argument sin/cos
        # range reduction is catastrophically slow on the VPU (measured
        # seconds per call)
        nk = (jnp.arange(n_fft, dtype=jnp.int32)[:, None]
              * jnp.arange(bin_lo, bin_hi, dtype=jnp.int32)[None, :]) % n_fft
        # optimization_barrier: without it XLA constant-folds the 2x2M-entry
        # trig tables at COMPILE time (~55 s extra per bucket); computing
        # them on device each call costs ~1 ms
        nk = jax.lax.optimization_barrier(nk.astype(jnp.float32))
        ang = (2.0 * np.pi / n_fft) * nk
        prec = {"default": jax.lax.Precision.DEFAULT,
                "high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST}[str(dft_precision)]
        re = jnp.matmul(frames, jnp.cos(ang), precision=prec)
        im = -jnp.matmul(frames, jnp.sin(ang), precision=prec)
        power = re**2 + im**2
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)[:, bin_lo:bin_hi]
        power = spec.real**2 + spec.imag**2
    if mag_eps > 0:
        return jnp.sqrt(power + mag_eps)
    if power_floor > 0:
        # parallel_wavegan-style clamp: sqrt(max(power, floor)) — finite
        # gradient at exactly-zero bins (stft_loss.py:25)
        return jnp.sqrt(jnp.maximum(power, power_floor))
    return jnp.sqrt(power)


@functools.partial(jax.jit, static_argnames=(
    "sr", "n_fft", "hop", "win_length", "n_mels", "fmin", "fmax", "eps",
    "dft_precision"))
def wav2mel_pwg(wav: jnp.ndarray, *, sr: int, n_fft: int, hop: int,
                win_length: int, n_mels: int, fmin: float, fmax: float,
                eps: float = 1e-6, dft_precision: str = "highest") -> jnp.ndarray:
    """24 kHz 'pwg'-style log10-mel [T, n_mels].

    Parity target: reference ``process_utterance`` (data_gen_utils.py:96-149).
    """
    basis_np = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    b_lo, b_hi = _basis_support(basis_np)
    spc = stft_mag(wav, n_fft, hop, win_length, center=True,
                   pad_mode="constant", bin_lo=b_lo, bin_hi=b_hi,
                   dft_precision=dft_precision)
    basis = jnp.asarray(basis_np[:, b_lo:b_hi])
    mel = spc @ basis.T  # [T, n_mels] — framewise matmul rides the MXU
    return jnp.log10(jnp.maximum(eps, mel))


@functools.partial(jax.jit, static_argnames=(
    "sr", "n_fft", "hop", "win_length", "n_mels", "fmin", "fmax", "clip_val",
    "dft_precision"))
def wav2mel_nsf(wav: jnp.ndarray, *, sr: int, n_fft: int, hop: int,
                win_length: int, n_mels: int, fmin: float, fmax: float,
                clip_val: float = 1e-5, dft_precision: str = "highest") -> jnp.ndarray:
    """44.1 kHz NSF-style mel, returned in **log10** domain [T, n_mels].

    Parity target: ``nvSTFT.get_mel`` (reflect pad (n_fft-hop)/2, center=False,
    sqrt(power+1e-9), ln(clip(x,1e-5))) followed by the wrapper's *0.434294.
    """
    pad = (n_fft - hop) // 2
    y = jnp.pad(wav, (pad, pad), mode="reflect")
    basis_np = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    b_lo, b_hi = _basis_support(basis_np)
    spc = stft_mag(y, n_fft, hop, win_length, center=False, mag_eps=1e-9,
                   bin_lo=b_lo, bin_hi=b_hi, dft_precision=dft_precision)
    basis = jnp.asarray(basis_np[:, b_lo:b_hi])
    mel = spc @ basis.T
    ln_mel = jnp.log(jnp.clip(mel, clip_val, None))
    return ln_mel * LOG10_E


def librosa_pad_lr(x_len: int, fsize: int, fshift: int, pad_sides: int = 1):
    """Padding so wav length becomes a hop multiple covering all mel frames
    (reference ``utils/audio.py:38-47``)."""
    assert pad_sides in (1, 2)
    pad = (x_len // fshift + 1) * fshift - x_len
    if pad_sides == 1:
        return 0, pad
    return pad // 2, pad // 2 + pad % 2


def wav2spec(wav: np.ndarray, hp) -> tuple:
    """Full reference-compatible wav2spec: returns (wav_padded, mel [T, M]).

    Dispatches on the configured vocoder family exactly like the reference
    (``network/vocoders/pwg.py:105-122`` vs ``nsf_hifigan.py:75-92``).
    """
    vocoder = str(hp.get("vocoder", "")).lower()
    is_nsf = "nsf" in vocoder
    wav = np.asarray(wav, dtype=np.float32)
    if is_nsf:
        mel = np.asarray(wav2mel_nsf(
            jnp.asarray(wav), sr=hp["audio_sample_rate"], n_fft=hp["fft_size"],
            hop=hp["hop_size"], win_length=hp["win_size"],
            n_mels=hp["audio_num_mel_bins"], fmin=float(hp["fmin"]), fmax=float(hp["fmax"])))
        return wav, mel
    if hp.get("loud_norm"):
        # reference process_utterance loud_norm: BS.1770 normalize to
        # -22 LUFS + peak protection (data_gen_utils.py:117-122; the
        # pwg wav2spec is the one caller that passes it, pwg.py:116)
        from .loudness import normalize_loudness

        wav = normalize_loudness(wav, hp["audio_sample_rate"], -22.0)
        if len(wav) and np.abs(wav).max() > 1.0:
            wav = wav / np.abs(wav).max()
    mel = np.asarray(wav2mel_pwg(
        jnp.asarray(wav), sr=hp["audio_sample_rate"], n_fft=hp["fft_size"],
        hop=hp["hop_size"], win_length=hp["win_size"],
        n_mels=hp["audio_num_mel_bins"], fmin=float(hp["fmin"]), fmax=float(hp["fmax"]),
        eps=float(hp.get("wav2spec_eps", 1e-6))))
    l_pad, r_pad = librosa_pad_lr(len(wav), hp["fft_size"], hp["hop_size"], 1)
    wav_out = np.pad(wav, (l_pad, r_pad), mode="constant")
    wav_out = wav_out[: mel.shape[0] * hp["hop_size"]]
    return wav_out, mel


def energy_from_mel(mel):
    """Frame energy sqrt(sum(exp(mel)^2)) (reference fs2_utils.py:65; note the
    natural exp applied to log10-mel is a reference quirk kept for parity)."""
    xp = jnp if isinstance(mel, jnp.ndarray) else np
    return xp.sqrt((xp.exp(mel) ** 2).sum(-1))

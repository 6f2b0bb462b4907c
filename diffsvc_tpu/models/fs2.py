"""FastSpeech2-style condition encoder.

Parity target: reference ``modules/fastspeech/fs2.py:21-255``. With the
default ``no_fs2: true`` the transformer encoder/decoder are skipped and the
condition is::

    cond = gather(pad(hubert, 1), mel2ph)            # frame-aligned units
         + pitch_embed[f0_to_coarse(denorm_f0(f0, uv))]
         (+ energy_embed[coarse(energy)])            # if use_energy_embed
         (+ spk_embed)                               # if use_spk_*
    cond *= (mel2ph > 0)                             # target nonpadding

With ``no_fs2: false`` the hubert features first run through an FFT-block
encoder and a decoder head can produce an auxiliary mel (``skip_decoder``
mirrors the reference flag).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import nn, tts_modules
from ..ops.pitch import denorm_f0, f0_to_coarse, energy_to_coarse


class FS2Config(NamedTuple):
    hidden_size: int = 256
    out_dims: int = 80
    no_fs2: bool = True
    use_pitch_embed: bool = True
    use_energy_embed: bool = False
    use_spk_id: bool = False
    use_spk_embed: bool = False
    num_spk: int = 1
    use_uv: bool = False
    pitch_norm: str = "log"
    f0_mean: float = 0.0   # pitch_norm: standard stats (binarizer
    f0_std: float = 1.0    # train_f0s_mean_std.npy; identity under log)
    f0_bin: int = 256
    f0_min: float = 50.0
    f0_max: float = 1100.0
    # fs2-full path
    enc_layers: int = 4
    dec_layers: int = 4
    enc_ffn_kernel_size: int = 9
    dec_ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1

    @classmethod
    def from_hparams(cls, hp):
        return cls(
            hidden_size=hp["hidden_size"],
            out_dims=hp["audio_num_mel_bins"],
            no_fs2=bool(hp.get("no_fs2", True)),
            use_pitch_embed=bool(hp.get("use_pitch_embed", True)),
            use_energy_embed=bool(hp.get("use_energy_embed", False)),
            use_spk_id=bool(hp.get("use_spk_id", False)),
            use_spk_embed=bool(hp.get("use_spk_embed", False)),
            num_spk=int(hp.get("num_spk", 1)),
            use_uv=bool(hp.get("use_uv", False)),
            pitch_norm=hp.get("pitch_norm", "log"),
            f0_mean=float(hp.get("f0_mean", 0.0) or 0.0),
            f0_std=float(hp.get("f0_std", 1.0) or 1.0),
            f0_bin=int(hp.get("f0_bin", 256)),
            f0_min=float(hp.get("f0_min", 50.0)),
            f0_max=float(hp.get("f0_max", 1100.0)),
            enc_layers=int(hp.get("enc_layers", 4)),
            dec_layers=int(hp.get("dec_layers", 4)),
            enc_ffn_kernel_size=int(hp.get("enc_ffn_kernel_size", 9)),
            dec_ffn_kernel_size=int(hp.get("dec_ffn_kernel_size", 9)),
            num_heads=int(hp.get("num_heads", 2)),
            dropout=float(hp.get("dropout", 0.1)),
        )


def init(key, cfg: FS2Config):
    keys = jax.random.split(key, 8)
    h = cfg.hidden_size
    params = {"mel_out": nn.init_linear(keys[0], h, cfg.out_dims)}
    if cfg.use_pitch_embed:
        params["pitch_embed"] = nn.normal_embedding(keys[1], 300, h, padding_idx=0)
    if cfg.use_energy_embed:
        params["energy_embed"] = nn.normal_embedding(keys[2], 256, h, padding_idx=0)
    if cfg.use_spk_id:
        params["spk_embed_proj"] = nn.normal_embedding(keys[3], cfg.num_spk + 1, h)
    elif cfg.use_spk_embed:
        params["spk_embed_proj"] = nn.init_linear(keys[3], 256, h)
    if not cfg.no_fs2:
        params["encoder"] = tts_modules.init_fft_blocks(
            keys[4], h, cfg.enc_layers, cfg.enc_ffn_kernel_size, cfg.num_heads)
        params["decoder"] = tts_modules.init_fft_blocks(
            keys[5], h, cfg.dec_layers, cfg.dec_ffn_kernel_size, cfg.num_heads)
    return params


def gather_units(encoder_out: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Frame-align unit features: out[b, t] = pad(enc,1)[b, mel2ph[b, t]].

    mel2ph==0 selects the zero pad row (padding frames)."""
    padded = jnp.pad(encoder_out, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(padded, mel2ph[:, :, None], axis=1)


def apply(params, cfg: FS2Config, hubert, mel2ph, f0, uv=None, energy=None,
          spk_embed=None, skip_decoder: bool = True, deterministic: bool = True,
          rng=None):
    """Build the per-mel-frame condition.

    :param hubert: [B, T_ph, H] content units
    :param mel2ph: [B, T_mel] int alignment (0 = padding)
    :param f0: [B, T_mel] normalized (log2, interpolated) f0
    :param uv: [B, T_mel] unvoiced mask
    :param energy: [B, T_mel]
    :return: dict with 'decoder_inp' [B, T_mel, H], 'f0_denorm', 'mel2ph',
        and 'mel_out' when the fs2-full decoder runs.
    """
    ret = {}
    if cfg.no_fs2:
        encoder_out = hubert
    else:
        src_padding_mask = jnp.all(hubert == 0, axis=-1)
        x = hubert * jnp.sqrt(cfg.hidden_size).astype(hubert.dtype)
        x = x + tts_modules.positional_encoding_for(x)
        encoder_out = tts_modules.apply_fft_blocks(
            params["encoder"], x, src_padding_mask, cfg.num_heads,
            cfg.enc_ffn_kernel_size, dropout=0.0 if deterministic else cfg.dropout,
            rng=None if rng is None else jax.random.fold_in(rng, 0))

    if cfg.use_spk_id and spk_embed is not None:
        spk = nn.embedding(params["spk_embed_proj"], spk_embed)[:, None, :]
    elif cfg.use_spk_embed and spk_embed is not None:
        spk = nn.linear(params["spk_embed_proj"], spk_embed)[:, None, :]
    else:
        spk = 0.0

    ret["mel2ph"] = mel2ph
    decoder_inp = gather_units(encoder_out, mel2ph)
    tgt_nonpadding = (mel2ph > 0).astype(decoder_inp.dtype)[:, :, None]

    if cfg.use_pitch_embed:
        pitch_padding = mel2ph == 0
        f0_denorm = denorm_f0(f0, uv, pitch_norm=cfg.pitch_norm,
                              use_uv=cfg.use_uv, pitch_padding=pitch_padding,
                              f0_mean=cfg.f0_mean, f0_std=cfg.f0_std)
        ret["f0_denorm"] = f0_denorm
        # N.B. padded frames carry f0=0 -> coarse bin 1 (not the 0 padding
        # row) exactly like the reference; the tgt_nonpadding multiply below
        # zeroes their contribution.
        pitch = f0_to_coarse(f0_denorm, cfg.f0_bin, cfg.f0_min, cfg.f0_max)
        ret["pitch_pred"] = pitch[..., None]
        decoder_inp = decoder_inp + nn.embedding(params["pitch_embed"], pitch)
    if cfg.use_energy_embed and energy is not None:
        e_coarse = energy_to_coarse(energy)
        decoder_inp = decoder_inp + nn.embedding(params["energy_embed"], e_coarse)

    decoder_inp = (decoder_inp + spk) * tgt_nonpadding
    ret["decoder_inp"] = decoder_inp

    if not cfg.no_fs2 and not skip_decoder:
        x = decoder_inp + tts_modules.positional_encoding_for(decoder_inp)
        dec_padding_mask = mel2ph == 0
        x = tts_modules.apply_fft_blocks(
            params["decoder"], x, dec_padding_mask, cfg.num_heads,
            cfg.dec_ffn_kernel_size, dropout=0.0 if deterministic else cfg.dropout,
            rng=None if rng is None else jax.random.fold_in(rng, 1))
        ret["mel_out"] = nn.linear(params["mel_out"], x) * tgt_nonpadding
    return ret

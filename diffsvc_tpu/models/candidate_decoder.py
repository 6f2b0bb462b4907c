"""FFT candidate denoiser — transformer alternative to DiffNet.

Parity target: reference ``network/diff/candidate_decoder.py:34-98``
(``diff_decoder_type: 'fft'``): concat [x_proj, cond, t_emb] -> linear ->
FFT-block decoder stack -> mel head.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import nn, tts_modules


class FFTDecoderConfig(NamedTuple):
    in_dims: int = 80
    hidden_size: int = 256
    residual_channels: int = 256
    dec_layers: int = 4
    dec_ffn_kernel_size: int = 9
    num_heads: int = 2

    @classmethod
    def from_hparams(cls, hp):
        return cls(
            in_dims=hp["audio_num_mel_bins"],
            hidden_size=hp["hidden_size"],
            residual_channels=hp["residual_channels"],
            dec_layers=int(hp.get("dec_layers", 4)),
            dec_ffn_kernel_size=int(hp.get("dec_ffn_kernel_size", 9)),
            num_heads=int(hp.get("num_heads", 2)),
        )


def init(key, cfg: FFTDecoderConfig):
    keys = jax.random.split(key, 6)
    dim = cfg.residual_channels
    h = cfg.hidden_size
    return {
        "input_projection": nn.init_conv1d(keys[0], 1, cfg.in_dims, dim,
                                           init="kaiming_normal"),
        "mlp": {"w1": nn.init_linear(keys[1], dim, dim * 4),
                "w2": nn.init_linear(keys[2], dim * 4, dim)},
        "get_decode_inp": nn.init_linear(keys[3], h + dim + dim, h),
        "blocks": tts_modules.init_fft_blocks(
            keys[4], h, cfg.dec_layers, cfg.dec_ffn_kernel_size, cfg.num_heads),
        "get_mel_out": nn.init_linear(keys[5], h, cfg.in_dims),
        "pos_embed_alpha": jnp.ones((1,)),
    }


def apply(params, cfg: FFTDecoderConfig, spec, diffusion_step, cond):
    """spec [B, T, M], diffusion_step [B], cond [B, T, H] -> [B, T, M]."""
    x = nn.conv1d(params["input_projection"], spec)  # [B, T, dim]
    step = nn.sinusoidal_pos_emb(diffusion_step, cfg.residual_channels)
    step = nn.linear(params["mlp"]["w1"], step)
    step = nn.mish(step)
    step = nn.linear(params["mlp"]["w2"], step)  # [B, dim]
    t_emb = jnp.broadcast_to(step[:, None, :], (x.shape[0], x.shape[1], step.shape[-1]))
    dec_inp = jnp.concatenate([x, cond, t_emb], axis=-1)
    h = nn.linear(params["get_decode_inp"], dec_inp)  # [B, T, H]

    padding_mask = jnp.abs(h).sum(-1) == 0
    pos = nn.sinusoidal_positional_embedding(h.shape[1], h.shape[2], offset=1)
    h = h + params["pos_embed_alpha"][0] * pos[None]
    h = tts_modules.apply_fft_blocks(params["blocks"], h, padding_mask,
                                     cfg.num_heads, cfg.dec_ffn_kernel_size)
    return nn.linear(params["get_mel_out"], h)

"""HiFi-GAN discriminators + GAN losses (vocoder training support).

Parity targets: reference ``modules/hifigan/hifigan.py:181-365`` and
``modules/nsf_hifigan/models.py:398-548`` — multi-period (2/3/5/7/11) and
multi-scale discriminators, LSGAN adversarial losses, feature matching.

The reference ships these but never wires vocoder training; here they are
first-class so the vocoder can be fine-tuned on-TPU with the same losses.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..models import nn

LRELU_SLOPE = 0.1
PERIODS = (2, 3, 5, 7, 11)


def _get_padding(k: int, d: int = 1) -> int:
    return (k * d - d) // 2


# ---------------------------------------------------------------------------
# Weight reparameterizations. The reference wraps every discriminator conv
# in weight_norm (spectral_norm for the first MSD scale):
# hifigan.py:186-206,258-280; models.py:402-410,461-471. These change the
# training dynamics, so GAN fine-tuning must reparameterize the same way.
# ---------------------------------------------------------------------------

def wn_init(conv):
    """Split a plain conv {'w': [k,in,out], 'b'} into weight-norm (v, g):
    w = g * v / ||v||, with the norm per OUTPUT channel (torch dim=0)."""
    w = conv["w"]
    norm = jnp.sqrt((w**2).sum(axis=(0, 1)) + 1e-12)  # [out]
    return {"v": w, "g": norm, "b": conv["b"]}


def wn_weight(p):
    v = p["v"]
    norm = jnp.sqrt((v**2).sum(axis=(0, 1), keepdims=True) + 1e-12)
    return {"w": v / norm * p["g"][None, None, :], "b": p["b"]}


def sn_init(conv):
    """Spectral norm: only the raw weight is stored (torch keeps a
    persistent power-iteration u buffer; here a few stop-gradient power
    iterations run per apply from a fixed seed, so no optimizer-visible
    state is needed)."""
    return {"w_bar": conv["w"], "b": conv["b"]}


def sn_weight(p, n_iter: int = 5):
    w = p["w_bar"]
    k, ci, co = w.shape
    m = w.reshape(k * ci, co)
    u = jnp.ones((co,), w.dtype) / jnp.sqrt(co)
    u = jax.lax.stop_gradient(u)
    for _ in range(n_iter):
        v = m @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = m.T @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(m @ u / (jnp.linalg.norm(m @ u) + 1e-12))
    sigma = v @ (m @ u)
    return {"w": w / sigma, "b": p["b"]}


def _conv(c, x, **kw):
    """Apply a conv in whichever parameterization it is stored."""
    if "v" in c:
        return nn.conv1d(wn_weight(c), x, **kw)
    if "w_bar" in c:
        return nn.conv1d(sn_weight(c), x, **kw)
    return nn.conv1d(c, x, **kw)


# ---------------------------------------------------------------------------
# Multi-period discriminator
# ---------------------------------------------------------------------------

def init_discriminator_p(key, kernel_size: int = 5, stride: int = 3):
    keys = iter(jax.random.split(key, 8))
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    convs = []
    for i, (ci, co) in enumerate(chans):
        # torch uses Conv2d((k,1),(s,1)) on the period-folded [T//p, p] map;
        # folding p into the batch axis makes each one a plain 1-D conv
        convs.append(wn_init(nn.init_conv1d(next(keys), kernel_size, ci, co)))
    return {"convs": convs,
            "conv_post": wn_init(nn.init_conv1d(next(keys), 3, 1024, 1))}


def apply_discriminator_p(p, x, period: int, kernel_size: int = 5,
                          stride: int = 3):
    """x: [B, T] -> (score [B, n], fmap list). 1d->2d folding by period;
    convs run on the folded time axis."""
    b, t = x.shape
    n_pad = (period - t % period) % period
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    # [B, T//p, p] -> treat p as batch: [B*p, T//p, 1]
    xf = x.reshape(b, t // period, period).transpose(0, 2, 1)
    xf = xf.reshape(b * period, t // period, 1)
    fmap = []
    h = xf
    for i, c in enumerate(p["convs"]):
        s = stride if i < 4 else 1
        h = _conv(c, h, stride=s, padding=_get_padding(5, 1))
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = _conv(p["conv_post"], h, padding=1)
    fmap.append(h)
    return h.reshape(b, -1), fmap


def init_mpd(key):
    keys = jax.random.split(key, len(PERIODS))
    return [init_discriminator_p(k) for k in keys]


def apply_mpd(params, y, y_hat):
    rs, gs, fr, fg = [], [], [], []
    for p, period in zip(params, PERIODS):
        r, fmap_r = apply_discriminator_p(p, y, period)
        g, fmap_g = apply_discriminator_p(p, y_hat, period)
        rs.append(r)
        gs.append(g)
        fr.append(fmap_r)
        fg.append(fmap_g)
    return rs, gs, fr, fg


# ---------------------------------------------------------------------------
# Multi-scale discriminator
# ---------------------------------------------------------------------------

_MSD_SPECS = [  # (kernel, stride, groups, c_in, c_out)
    (15, 1, 1, 1, 128), (41, 2, 4, 128, 128), (41, 2, 16, 128, 256),
    (41, 4, 16, 256, 512), (41, 4, 16, 512, 1024), (41, 1, 16, 1024, 1024),
    (5, 1, 1, 1024, 1024)]


def init_discriminator_s(key, use_spectral_norm: bool = False):
    # first MSD scale uses spectral_norm, the rest weight_norm
    # (models.py:461-471)
    wrap = sn_init if use_spectral_norm else wn_init
    keys = iter(jax.random.split(key, 9))
    convs = [wrap(nn.init_conv1d(next(keys), k, ci, co, groups=g))
             for (k, s, g, ci, co) in _MSD_SPECS]
    return {"convs": convs,
            "conv_post": wrap(nn.init_conv1d(next(keys), 3, 1024, 1))}


def apply_discriminator_s(p, x):
    h = x[:, :, None]
    fmap = []
    for c, (k, s, g, ci, co) in zip(p["convs"], _MSD_SPECS):
        h = _conv(c, h, stride=s, padding=k // 2, groups=g)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = _conv(p["conv_post"], h, padding=1)
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


def init_msd(key, n_scales: int = 3):
    return [init_discriminator_s(k, use_spectral_norm=(i == 0))
            for i, k in enumerate(jax.random.split(key, n_scales))]


def _avg_pool(x, k: int = 4, s: int = 2):
    # torch AvgPool1d(4, 2, padding=2) semantics (reference
    # models.py:494-497): pad (2, 2), divisor k even at the padded edges
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k), (1, s), [(0, 0), (2, 2)]) / k


def apply_msd(params, y, y_hat):
    rs, gs, fr, fg = [], [], [], []
    for i, p in enumerate(params):
        if i > 0:
            y = _avg_pool(y)
            y_hat = _avg_pool(y_hat)
        r, fmap_r = apply_discriminator_s(p, y)
        g, fmap_g = apply_discriminator_s(p, y_hat)
        rs.append(r)
        gs.append(g)
        fr.append(fmap_r)
        fg.append(fmap_g)
    return rs, gs, fr, fg


# ---------------------------------------------------------------------------
# Losses (reference models.py:509-548)
# ---------------------------------------------------------------------------

def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.abs(rl - gl).mean()
    return loss * 2.0


def discriminator_loss(disc_real, disc_generated):
    loss = 0.0
    for dr, dg in zip(disc_real, disc_generated):
        loss += ((1 - dr) ** 2).mean() + (dg**2).mean()
    return loss


def generator_loss(disc_outputs):
    loss = 0.0
    for dg in disc_outputs:
        loss += ((1 - dg) ** 2).mean()
    return loss

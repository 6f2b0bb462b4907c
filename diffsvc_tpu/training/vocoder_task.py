"""Vocoder (NSF-)HiFi-GAN adversarial fine-tuning on TPU.

The reference vendors the MPD/MSD discriminators and GAN losses but never
wires vocoder training (SURVEY.md §2.6); this task completes it:

    G loss = LSGAN adv + 2*feature-matching + 45*mel-L1 (+ multi-res STFT)
    D loss = LSGAN real/fake on MPD+MSD

One jitted step updates D then G (standard HiFi-GAN recipe, AdamW betas
(0.8, 0.99), exponential decay 0.999/epoch expressed per-step). Batches are
random fixed-size crops (``segment_size`` samples) of binarized items that
kept their waveforms (``binarization_args.with_wav: true``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.hparams import HParams
from ..ops import mel as mel_ops
from ..ops.stft_loss import multi_resolution_stft_loss
from ..vocoders import discriminators as D
from ..vocoders import generator as gen


def _factor_scales(hop: int):
    """Greedy 4/2 factorization of hop_size into PWG upsample scales
    (e.g. 128 -> (4,4,4,2), 256 -> (4,4,4,4), 512 -> (4,4,4,4,2))."""
    scales = []
    while hop > 1:
        for f in (4, 2, 3, 5, 7):
            if hop % f == 0:
                scales.append(f)
                hop //= f
                break
        else:
            scales.append(hop)
            hop = 1
    return tuple(scales)


class VocoderTask:
    def __init__(self, hp: HParams, mesh=None, voc_cfg: Optional[gen.HifiGanConfig] = None):
        self.hp = hp
        self.mesh = mesh
        # generator family: the HiFi-GAN/NSF upsampler (reference parity),
        # the TPU-first iSTFT-head model (vocoders/istft_head.py), or the
        # legacy ParallelWaveGAN generator + its own discriminator
        # (vocoder_family: pwg — the reference vendors the PWG package but
        # never trains it, parallel_wavegan.py:207-435)
        voc_str = str(hp.get("vocoder", "")).lower()
        fam = str(hp.get("vocoder_family", "")).lower()
        if fam == "pwg" or (not fam and "pwg" in voc_str):
            self.family = "pwg"
        elif "istft" in voc_str:
            self.family = "istft"
        else:
            self.family = "hifigan"
        if self.family == "istft":
            from ..vocoders import istft_head

            self._istft = istft_head
            self.icfg = istft_head.IstftVocoderConfig.from_hparams(hp)
        elif self.family == "pwg":
            from ..vocoders import pwg as pwg_mod

            self._pwg = pwg_mod
            hop = int(hp["hop_size"])
            scales = tuple(hp.get("pwg_upsample_scales") or
                           _factor_scales(hop))
            assert int(np.prod(scales)) == hop, \
                f"pwg_upsample_scales {scales} must multiply to hop {hop}"
            self.pcfg = pwg_mod.PWGConfig(
                aux_channels=hp["audio_num_mel_bins"],
                upsample_scales=scales,
                layers=int(hp.get("pwg_layers", 30)),
                stacks=int(hp.get("pwg_stacks", 3)),
                residual_channels=int(hp.get("pwg_residual_channels", 64)),
                gate_channels=int(hp.get("pwg_gate_channels", 128)),
                skip_channels=int(hp.get("pwg_skip_channels", 64)))
            self.pdisc_residual = str(
                hp.get("pwg_discriminator", "")).lower() == "residual"
            self.pdcfg = (
                pwg_mod.ResidualPWGDiscriminatorConfig(
                    layers=int(hp.get("pwg_disc_layers", 30)),
                    stacks=int(hp.get("pwg_disc_stacks", 3)))
                if self.pdisc_residual
                else pwg_mod.PWGDiscriminatorConfig(
                    layers=int(hp.get("pwg_disc_layers", 10)),
                    conv_channels=int(hp.get("pwg_disc_channels", 64))))
        self.cfg = voc_cfg or gen.HifiGanConfig(
            num_mels=hp["audio_num_mel_bins"],
            upsample_initial_channel=int(hp.get("upsample_initial_channel", 512)),
            upsample_rates=tuple(hp.get("upsample_rates", (8, 8, 2, 2, 2))),
            upsample_kernel_sizes=tuple(hp.get("upsample_kernel_sizes", (16, 16, 4, 4, 4))),
            resblock=str(hp.get("resblock", "1")),
            resblock_kernel_sizes=tuple(hp.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilation_sizes=tuple(tuple(d) for d in hp.get(
                "resblock_dilation_sizes", ((1, 3, 5),) * 3)),
            sampling_rate=hp["audio_sample_rate"],
            use_nsf=bool(hp.get("use_nsf", True)))
        lr = float(hp.get("vocoder_lr", 2e-4))
        sched = optax.exponential_decay(lr, transition_steps=1000, decay_rate=0.999)
        self.tx_g = optax.adamw(sched, b1=0.8, b2=0.99)
        self.tx_d = optax.adamw(sched, b1=0.8, b2=0.99)
        self.lambda_mel = float(hp.get("lambda_mel", 45.0))
        self.lambda_fm = 1.0
        self.use_stft_loss = bool(hp.get("use_stft_loss", False))
        self._step_fn = None

    def init_state(self, seed: Optional[int] = None) -> Dict:
        seed = seed if seed is not None else self.hp.get("seed", 1234)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        if self.family == "istft":
            g_params = self._istft.init(k1, self.icfg)
        elif self.family == "pwg":
            g_params = self._pwg.init(k1, self.pcfg)
        else:
            g_params = gen.init(k1, self.cfg)
        if self.family == "pwg":
            d_init = (self._pwg.init_residual_discriminator
                      if self.pdisc_residual else self._pwg.init_discriminator)
            d_params = {"pwg": d_init(k2, self.pdcfg)}
        else:
            d_params = {"mpd": D.init_mpd(k2), "msd": D.init_msd(k3)}
        return {
            "g_params": g_params, "d_params": d_params,
            "g_opt": self.tx_g.init(g_params), "d_opt": self.tx_d.init(d_params),
            "step": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------
    def _mel_for_loss(self, wav):
        hp = self.hp
        voc = str(hp.get("vocoder", "nsf")).lower()
        # NSF nvSTFT mel for BOTH the nsf-hifigan family and the iSTFT head:
        # IstftVocoder.wav2spec delegates to NsfHifiGAN.wav2spec, so the GAN
        # mel-L1 must be computed in the same geometry the model is
        # conditioned and served with (reflect pad (n_fft-hop)/2,
        # center=False, S frames for an S-frame segment). PWG log10-mel
        # (center=True constant pad, S+1 frames) only for the legacy
        # pwg/hifigan wrappers.
        fn = mel_ops.wav2mel_nsf if ("nsf" in voc or "istft" in voc) \
            else mel_ops.wav2mel_pwg
        return jax.vmap(lambda w: fn(
            w, sr=hp["audio_sample_rate"], n_fft=hp["fft_size"],
            hop=hp["hop_size"], win_length=hp["win_size"],
            n_mels=hp["audio_num_mel_bins"], fmin=float(hp["fmin"]),
            fmax=float(hp["fmax"])))(wav)

    def _make_step(self):
        cfg = self.cfg
        is_nsf = cfg.use_nsf
        tx_g, tx_d = self.tx_g, self.tx_d
        lam_mel, lam_fm = self.lambda_mel, self.lambda_fm
        use_stft = self.use_stft_loss

        family = self.family

        def gen_forward(g_params, batch, rng):
            if family == "istft":
                # the iSTFT head consumes log10-mel directly
                return self._istft.apply(g_params, self.icfg, batch["mels"],
                                         batch.get("f0"))
            if family == "pwg":
                # PWG: noise at sample rate + edge-padded mel context
                # (reference network/vocoders/pwg.py:90-95 pads acw frames)
                mel = batch["mels"]
                acw = self.pcfg.aux_context_window
                mel = jnp.pad(mel, ((0, 0), (acw, acw), (0, 0)), mode="edge")
                hop = int(np.prod(self.pcfg.upsample_scales))
                z = jax.random.normal(
                    rng, (batch["mels"].shape[0],
                          batch["mels"].shape[1] * hop), jnp.float32)
                return self._pwg.apply(g_params, self.pcfg, z, mel)
            mel_in = batch["mels"] * (mel_ops.LN_10 if is_nsf else 1.0)
            return gen.apply(g_params, cfg, mel_in,
                             batch.get("f0") if is_nsf else None, rng)

        def pwg_disc(d_params, y):
            fn = (self._pwg.apply_residual_discriminator if self.pdisc_residual
                  else self._pwg.apply_discriminator) if family == "pwg" else None
            return fn(d_params["pwg"], self.pdcfg, y)

        def d_loss_fn(d_params, y, y_hat):
            if family == "pwg":
                return D.discriminator_loss([pwg_disc(d_params, y)],
                                            [pwg_disc(d_params, y_hat)])
            rs, gs, _, _ = D.apply_mpd(d_params["mpd"], y, y_hat)
            loss = D.discriminator_loss(rs, gs)
            rs2, gs2, _, _ = D.apply_msd(d_params["msd"], y, y_hat)
            return loss + D.discriminator_loss(rs2, gs2)

        def g_loss_fn(g_params, d_params, batch, rng):
            y = batch["wav"]
            y_hat = gen_forward(g_params, batch, rng)
            mel_pred = self._mel_for_loss(y_hat)
            mel_gt = self._mel_for_loss(y)
            mel_l1 = jnp.abs(mel_pred - mel_gt).mean()
            if family == "pwg":
                # official PWG recipe: multi-res STFT + 4.0 * LSGAN adv
                # (no feature matching / mel term; mel_l1 kept as a metric)
                adv = D.generator_loss([pwg_disc(d_params, y_hat)])
                sc, mag = multi_resolution_stft_loss(
                    y_hat.reshape(-1), y.reshape(-1))
                loss = sc + mag + 4.0 * adv
                return loss, (y_hat, {"g_adv": adv, "g_mel": mel_l1,
                                      "g_stft": sc + mag})
            _, gs, fr, fg = D.apply_mpd(d_params["mpd"], y, y_hat)
            _, gs2, fr2, fg2 = D.apply_msd(d_params["msd"], y, y_hat)
            adv = D.generator_loss(gs) + D.generator_loss(gs2)
            fm = D.feature_loss(fr, fg) + D.feature_loss(fr2, fg2)
            loss = adv + lam_fm * fm + lam_mel * mel_l1
            extras = {"g_adv": adv, "g_fm": fm, "g_mel": mel_l1}
            if use_stft:
                sc, mag = multi_resolution_stft_loss(y_hat.reshape(-1), y.reshape(-1))
                loss = loss + sc + mag
                extras["g_stft"] = sc + mag
            return loss, (y_hat, extras)

        def step(state, batch, rng):
            rng_g = jax.random.fold_in(rng, state["step"])
            # --- discriminator update ---
            y_hat = jax.lax.stop_gradient(
                gen_forward(state["g_params"], batch, rng_g))
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                state["d_params"], batch["wav"], y_hat)
            d_updates, d_opt = tx_d.update(d_grads, state["d_opt"],
                                           state["d_params"])
            d_params = optax.apply_updates(state["d_params"], d_updates)
            # --- generator update (vs updated D, standard recipe) ---
            (g_loss, (_, extras)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state["g_params"], d_params, batch, rng_g)
            g_updates, g_opt = tx_g.update(g_grads, state["g_opt"],
                                           state["g_params"])
            g_params = optax.apply_updates(state["g_params"], g_updates)
            metrics = {"d_loss": d_loss, "g_loss": g_loss, **extras}
            new_state = {"g_params": g_params, "d_params": d_params,
                         "g_opt": g_opt, "d_opt": d_opt,
                         "step": state["step"] + 1}
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state, batch: Dict, rng):
        if self._step_fn is None:
            self._step_fn = self._make_step()
        return self._step_fn(state, batch, rng)


def crop_batch(items, hp: HParams, rng: np.random.RandomState,
               segment_frames: int = 32) -> Dict:
    """Random fixed-size crops for vocoder training: returns mel [B, S, M],
    wav [B, S*hop], f0 [B, S]."""
    hop = hp["hop_size"]
    mels, wavs, f0s = [], [], []
    for item in items:
        mel = np.asarray(item["mel"], np.float32)
        wav = np.asarray(item["wav"], np.float32)
        f0 = np.asarray(item["f0"], np.float32)
        max_start = max(mel.shape[0] - segment_frames, 0)
        s = rng.randint(0, max_start + 1)
        m = mel[s: s + segment_frames]
        if m.shape[0] < segment_frames:
            m = np.pad(m, ((0, segment_frames - m.shape[0]), (0, 0)))
        w = wav[s * hop: (s + segment_frames) * hop]
        if len(w) < segment_frames * hop:
            w = np.pad(w, (0, segment_frames * hop - len(w)))
        f = f0[s: s + segment_frames]
        if len(f) < segment_frames:
            f = np.pad(f, (0, segment_frames - len(f)))
        mels.append(m)
        wavs.append(w)
        f0s.append(f)
    return {"mels": np.stack(mels), "wav": np.stack(wavs), "f0": np.stack(f0s)}


def train_vocoder(hp: HParams):
    """CLI driver for vocoder fine-tuning (run.py routes here when
    ``task_cls`` names a vocoder task).

    Requires the dataset binarized with ``binarization_args.with_wav: true``
    (items must keep their waveforms). Checkpoints rotate in ``work_dir``
    like the SVC trainer.
    """
    import os

    from ..data.dataset import FastSpeechDataset
    from . import checkpoint as ckpt_lib

    from ..utils.compile_cache import enable as _cc

    _cc()
    task = VocoderTask(hp)
    state = task.init_state()
    restored = ckpt_lib.restore_checkpoint(hp["work_dir"])
    step = 0
    if restored is not None:
        st, _, step, _ = restored
        state = st
        print(f"| resumed vocoder training at step {step}")

    ds = FastSpeechDataset("train", hp, shuffle=False)
    # raw binarized items (mel, wav, f0 in Hz) — crop_batch's input
    items = [ds._get_item(i) for i in range(len(ds))]
    for it in items:
        assert "wav" in it, ("vocoder training needs waveforms: binarize "
                             "with binarization_args.with_wav: true")

    rng_np = np.random.RandomState(hp.get("seed", 1234) + step)
    rng = jax.random.PRNGKey(hp.get("seed", 1234))
    batch_size = int(hp.get("max_sentences", 8) or 8)
    seg = int(hp.get("vocoder_segment_frames", 32))
    max_updates = int(hp.get("max_updates", 100000))
    log_interval = int(hp.get("log_interval", 100))
    ckpt_interval = int(hp.get("val_check_interval", 2000))
    while step < max_updates:
        picks = [items[rng_np.randint(len(items))] for _ in range(batch_size)]
        batch = crop_batch(picks, hp, rng_np, segment_frames=seg)
        state, metrics = task.train_step(state, batch,
                                         jax.random.fold_in(rng, step))
        step += 1
        if step % log_interval == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"| voc step {step} {m}")
        if step % ckpt_interval == 0 or step >= max_updates:
            ckpt_lib.save_checkpoint(
                hp["work_dir"], state, 0, step,
                num_ckpt_keep=int(hp.get("num_ckpt_keep", 10)))
    print("| VOCODER TRAINING FINISHED")
    return state

"""Host-loop training throughput: steady-state Trainer.fit it/s on the
real chip, with and without prefetch-to-device, in the SAME run/window.

Protocol notes (learned the hard way): a throwaway warmup fit runs
first so neither timed mode eats the 20-70 s remote compile, and
steady-state is (steps - skip) / (first post-warmup dispatch -> final
block_until_ready) — dispatch timestamps alone overstate the async
mode because the queue backs up. Finding (runs/train_loop/): at small
batches the loop is upload+RTT bound (~310 ms/step vs a ~6 ms compute
share) and prefetch_to_device is throughput-NEUTRAL (0.93x) — jax's
async dispatch already pipelines the upload and the tunnel serializes
transfers either way. The fix for upload-bound loops is the
device-resident dataset mode (`resident_dataset`).

Usage: python tools/bench_train_loop.py [--steps 60] [--cpu] [--out FILE]
Stdout: one JSON line. Logs to stderr.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--skip", type=int, default=5,
                    help="steps to drop from the front (compile/warmup)")
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--steps_per_dispatch", type=int, default=10,
                    help="chunk size for the resident_scan mode")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="toy dims for the CPU smoke")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffsvc_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax
    import numpy as np
    import yaml

    from tools.train_demo_tpu import make_dataset

    log(f"| device: {jax.devices()[0]}")
    scratch = tempfile.mkdtemp(prefix="bench_train_loop_")
    sr, hop = 44100, 512
    dims = dict(hidden_size=256, residual_layers=20, residual_channels=384)
    if args.tiny:
        dims = dict(hidden_size=64, residual_layers=4, residual_channels=32)
    make_dataset(f"{scratch}/raw", sr=sr, n_clips=args.clips,
                 hidden=dims["hidden_size"])

    hp_dict = dict(
        audio_sample_rate=sr, audio_num_mel_bins=128, fft_size=2048,
        hop_size=hop, win_size=2048, fmin=40, fmax=16000,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=128, spec_min=[-5.0], spec_max=[0.0],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_spk_id=False, use_spk_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=40.0, f0_max=1100.0,
        use_nsf=True, use_crepe=False, use_vec=False,
        # the binarizer needs the vocoder CLASS for its canonical wav2spec;
        # an empty ckpt means the Trainer skips building validation audio
        vocoder="NsfHifiGAN", vocoder_ckpt="",
        hubert_path=f"{scratch}/nonexistent_hubert", pe_ckpt="",
        pe_enable=False, max_frames=42000, max_input_tokens=60000,
        mel_vmin=-6.0, mel_vmax=1.5, num_spk=1,
        binarization_args=dict(with_f0=True, with_hubert=True,
                               with_align=True),
        pndm_speedup=20, debug=False,
        raw_data_dir=f"{scratch}/raw", binary_data_dir=f"{scratch}/binary",
        speaker_id="bench", binarizer_cls="preprocessing.SVCpre.SVCBinarizer",
        task_cls="training.task.SVC_task.SVCTask",
        max_sentences=8, max_tokens=100000,
        val_check_interval=10_000_000, log_interval=10_000_000,
        num_sanity_val_steps=0, num_valid_plots=0, num_ckpt_keep=1,
        lr=8e-4, scheduler="step_lr", decay_steps=50000,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=1234,
        save_ckpt=True, endless_ds=True, ds_workers=0, test_num=2,
        valid_num=0, train_set_name="train", valid_set_name="valid",
        test_set_name="test", **dims,
    )
    cfg_path = f"{scratch}/config.yaml"
    hp_dict["work_dir"] = f"{scratch}/work_seed"  # overwritten per mode
    with open(cfg_path, "w") as f:
        yaml.safe_dump(hp_dict, f)

    from diffsvc_tpu.config.hparams import set_hparams

    log("| binarizing ...")
    hp = set_hparams(config=cfg_path, exp_name="bench", reset=True,
                     print_hparams=False)
    from diffsvc_tpu.data.binarizer import binarize

    binarize(hp)

    from diffsvc_tpu.training.trainer import Trainer

    def run_mode(name, put_flag, resident=False, spd=1):
        hp_m = dict(hp)
        hp_m["work_dir"] = f"{scratch}/work_{name}"
        hp_m["prefetch_to_device"] = put_flag
        hp_m["resident_dataset"] = resident
        hp_m["train_steps_per_dispatch"] = spd
        hp_m["max_updates"] = args.steps
        from diffsvc_tpu.config.hparams import HParams

        trainer = Trainer(HParams(**hp_m), log_writer=None)
        step_attr = ("train_chunk_resident" if resident and spd > 1
                     else "train_step_resident" if resident
                     else "train_step")
        orig = getattr(trainer.task, step_attr)
        stamps, host_ms = [], []  # (t0, t1, steps_in_dispatch)

        def timed(state, batch, rng):
            t0 = time.perf_counter()
            out = orig(state, batch, rng)
            t1 = time.perf_counter()
            n = len(batch) if step_attr == "train_chunk_resident" else 1
            stamps.append((t0, t1, n))
            host_ms.append((t1 - t0) * 1e3)
            return out

        setattr(trainer.task, step_attr, timed)
        t0 = time.time()
        state = trainer.fit()
        # drain: dispatch is async, so the queue may hold many steps of
        # device work — throughput is only real once the params are ready
        jax.block_until_ready(state["params"])
        t_drained = time.perf_counter()
        wall = time.time() - t0
        # skip is counted in DISPATCHES (the first carries the compile)
        k = min(-(-args.skip // spd), max(len(stamps) - 2, 0))
        nsteps = sum(s[2] for s in stamps[k:])
        # steady-state = steps after warmup / (first post-warmup dispatch
        # -> fully drained). Using the last DISPATCH stamp instead would
        # credit work still in flight and overstate the async mode.
        span = t_drained - stamps[k][0]
        steady = nsteps / span if span > 0 else float("nan")
        gaps = [1e3 * (stamps[i + 1][0] - stamps[i][1])
                for i in range(k, len(stamps) - 1)]
        res = {
            "steps": sum(s[2] for s in stamps),
            "wall_s": round(wall, 2),
            "steady_it_s": round(steady, 3),
            "steady_ms_per_step": round(1e3 / steady, 2),
            "host_dispatch_ms_p50": round(float(np.median(host_ms[k:])), 2),
            "host_gap_ms_p50": round(float(np.median(gaps)), 2) if gaps else 0.0,
        }
        log(f"| {name}: {res}")
        return res

    # Warm the jit cache first: both modes trace the SAME step program and
    # Trainer instances share this process's jit cache, so without a
    # throwaway warmup the first-run mode eats the (remote, 20-70 s)
    # compile and the wall comparison measures compile order, not the loop.
    log("| warmup fit (compile) ...")
    hp_w = dict(hp)
    hp_w["work_dir"] = f"{scratch}/work_warm"
    hp_w["max_updates"] = 3
    from diffsvc_tpu.config.hparams import HParams as _HP

    jax.block_until_ready(Trainer(_HP(**hp_w), log_writer=None).fit()["params"])

    # off first, then on — same window ordering bias favors OFF if anything
    res_off = run_mode("off", False)
    res_on = run_mode("on", True)
    res_resident = run_mode("resident", False, resident=True)
    res_scan = run_mode("resident_scan", False, resident=True,
                        spd=args.steps_per_dispatch)
    out = {
        "metric": "train_loop_it_s",
        "device": str(jax.devices()[0]),
        "dims": ("tiny" if args.tiny else
                 "prod 128mel 384x20 K=1000, batch 8 x 2s clips"),
        "prefetch_to_device_off": res_off,
        "prefetch_to_device_on": res_on,
        "resident_dataset": res_resident,
        "resident_scan": dict(res_scan,
                              steps_per_dispatch=args.steps_per_dispatch),
        "speedup_x": round(res_on["steady_it_s"]
                           / max(res_off["steady_it_s"], 1e-9), 3),
        "resident_speedup_x": round(res_resident["steady_it_s"]
                                    / max(res_off["steady_it_s"], 1e-9), 3),
        "resident_scan_speedup_x": round(res_scan["steady_it_s"]
                                         / max(res_off["steady_it_s"],
                                               1e-9), 3),
        # pure-device floor is 65-77 ms at 24x1024 frames (tools/
        # bench_train.py) = ~330k mel-frames/s; this loop's batches are
        # 8 x ~256 frames, so steady ms/step here is dominated by the
        # per-step batch upload + tunnel round-trips, not compute
        "device_floor_note": "65-77 ms @ 24x1024 frames (bench_train.py)",
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

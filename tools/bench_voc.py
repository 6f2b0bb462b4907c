"""Vocoder-only A/B: plain vs channel-packed NSF-HiFiGAN on TPU.

Times generator.apply vs generator.apply_packed at production openvpi dims
(512ch, rates 8/8/2/2/2, 128 mel) on ~10 s of 44.1 kHz output, fp32 and
bf16, and reports XLA cost_analysis FLOPs for both programs so the packed
kernels' structural-zero overhead is visible next to the wall-clock win.

Usage: python tools/bench_voc.py [--secs 10] [--runs 5] [--lanes 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--ts", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    from diffsvc_tpu.vocoders import generator as gen

    dev = jax.devices()[0]
    log(f"| device: {dev}")

    SR, HOP, NMEL = 44100, 512, 128
    T = int(args.secs * SR) // HOP
    cfg = gen.HifiGanConfig(
        num_mels=NMEL, upsample_initial_channel=512,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4),
        resblock="1", resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=SR,
        use_nsf=True)
    params = gen.init(jax.random.PRNGKey(0), cfg)
    packed = gen.pack_params(params, cfg, args.lanes)
    log(f"| schedule (lane target {args.lanes}): {gen.pack_schedule(cfg, args.lanes)}")

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, T, NMEL) * 2 - 5, jnp.float32)
    f0 = jnp.asarray(np.abs(rng.randn(1, T)) * 80 + 180, jnp.float32)
    key = jax.random.PRNGKey(7)

    def bench(name, fn, p, dtype):
        f = jax.jit(lambda pp, m, f0v, k: fn(pp, cfg, m, f0v, k, dtype=dtype))
        t0 = time.time()
        out = f(p, mel, f0, key)
        np.asarray(out[0, -4:])  # force a fetch (tunnel-safe sync)
        log(f"| {name}: compile+run {time.time()-t0:.1f}s")
        try:
            cost = f.lower(p, mel, f0, key).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            log(f"| {name}: {float(cost.get('flops', 0))/1e12:.3f} TFLOP")
        except Exception as e:
            log(f"| {name}: cost_analysis unavailable: {e}")
        # Amortize the ~30 ms tunnel round-trip (measured: a no-op dispatch
        # costs that much): launch K async dispatches, sync once, divide.
        K = 8
        times = []
        for i in range(args.runs):
            t0 = time.time()
            for j in range(K):
                out = f(p, mel, f0, jax.random.fold_in(key, i * K + j))
            np.asarray(out[0, -4:])
            times.append((time.time() - t0) / K)
        best = min(times)
        log(f"| {name}: min {best*1e3:.1f} ms/call over {K} async calls "
            "(runs: " + " ".join(f"{t*1e3:.0f}" for t in times) + ")")
        return best, out

    import functools

    def apply_packed(pp, c, m, f0v, k, dtype=None):
        return gen.apply_packed(pp, c, m, f0v, k, dtype=dtype,
                                lane_target=args.lanes)

    t_plain, o_plain = bench("plain fp32", gen.apply, params, None)
    t_pack, o_pack = bench("packed fp32", apply_packed, packed, None)
    err_pack = float(np.max(np.abs(np.asarray(o_plain) - np.asarray(o_pack))))
    log(f"| fp32 max abs delta plain vs packed: {err_pack:.2e}")
    t_tail = float("nan")
    built = gen.build_tail_params(params, packed, cfg, args.lanes)
    if built is not None:
        plan, tp = built
        log(f"| tail plan: s0={plan.s0} taps={plan.n_taps} convs={plan.n_convs}"
            f" halo={plan.halo} p_fin={plan.p_fin} ts={args.ts}")

        def apply_tail(pp, c, m, f0v, k, dtype=None):
            return gen.apply_tail(pp, c, m, f0v, k, plan=plan, ts=args.ts)

        t_tail, o_tail = bench("pallas tail", apply_tail, tp, None)
        err_tail = float(np.max(np.abs(np.asarray(o_pack) - np.asarray(o_tail))))
        log(f"| max abs delta packed fp32 vs pallas tail (bf16 taps): {err_tail:.2e}")
    t_plain_bf, _ = bench("plain bf16", gen.apply, params, jnp.bfloat16)
    t_pack_bf, _ = bench("packed bf16", apply_packed, packed, jnp.bfloat16)
    log(f"| SPEEDUP fp32: {t_plain/t_pack:.2f}x   bf16: {t_plain_bf/t_pack_bf:.2f}x")
    print(f'{{"plain_fp32_ms": {t_plain*1e3:.1f}, "packed_fp32_ms": {t_pack*1e3:.1f}, '
          f'"plain_bf16_ms": {t_plain_bf*1e3:.1f}, "packed_bf16_ms": {t_pack_bf*1e3:.1f}, '
          + (f'"pallas_tail_ms": {t_tail*1e3:.1f}, ' if t_tail == t_tail
             else '"pallas_tail_ms": null, ')
          + f'"max_abs_delta_fp32": {err_pack:.3e}}}')


if __name__ == "__main__":
    main()

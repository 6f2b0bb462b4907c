"""Stage-by-stage NSF-HiFiGAN timing on TPU: where do the ~80 ms go?

Times, at production openvpi dims on ~10 s of 44.1 kHz output:
- the NSF harmonic source (sine_gen cumsum + threefry noise) alone,
- each upsample ConvT, plain vs channel-packed,
- each stage's resblock triplet, plain vs channel-packed,
- conv_post + tanh.

Usage: python tools/bench_voc_stages.py [--secs 10] [--runs 3]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    from diffsvc_tpu.models import nn
    from diffsvc_tpu.ops import packed_conv as pc
    from diffsvc_tpu.vocoders import generator as gen

    log(f"| device: {jax.devices()[0]}")
    SR, HOP, NMEL = 44100, 512, 128
    T0 = int(args.secs * SR) // HOP
    cfg = gen.HifiGanConfig(
        num_mels=NMEL, upsample_initial_channel=512,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4),
        resblock="1", resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=SR,
        use_nsf=True)
    params = gen.init(jax.random.PRNGKey(0), cfg)
    packed = gen.pack_params(params, cfg, 128)
    sched = gen.pack_schedule(cfg, 128)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    log(f"| dtype: {args.dtype}")
    cast = lambda tree: jax.tree.map(
        lambda a: a.astype(dt) if getattr(a, "dtype", None) == jnp.float32 else a, tree)
    params, packed = cast(params), cast(packed)

    def timeit(name, fn, *xs):
        f = jax.jit(fn)

        def sync(o):
            # slice on device, fetch 4 floats — NOT the whole tensor (a full
            # np.asarray would drag MBs through the tunnel and swamp timing)
            np.asarray(jax.tree.leaves(o)[0].ravel()[:4])

        sync(f(*xs))
        K = 8  # amortize the ~30 ms tunnel round-trip: K async calls, 1 sync
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            for _ in range(K):
                o = f(*xs)
            sync(o)
            ts.append((time.time() - t0) / K)
        log(f"| {name:46s} {min(ts)*1e3:7.1f} ms")
        return min(ts)

    key = jax.random.PRNGKey(3)
    rng = np.random.RandomState(0)

    # --- NSF source alone ---
    L = T0 * int(np.prod(cfg.upsample_rates))
    f0 = jnp.asarray(np.abs(rng.randn(1, T0)) * 80 + 180, jnp.float32).astype(dt)
    timeit("upsample_nearest f0", lambda f: gen.upsample_nearest(f, 512), f0)
    f0_up = gen.upsample_nearest(f0, 512)
    timeit("source_module (sine_gen + linear)",
           lambda p, f, k: gen.source_module(p, k, f, SR, cfg.harmonic_num),
           params["m_source"], f0_up, key)
    har = gen.source_module(params["m_source"], key, f0_up, SR,
                            cfg.harmonic_num)[0]

    # --- per-stage ConvT + resblocks, plain vs packed ---
    t_len = T0
    c_prev = cfg.upsample_initial_channel
    total_plain = total_packed = 0.0
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_cur = gen._stage_channels(cfg, i)
        p_in, p_stage = sched[i]
        x = jnp.asarray(rng.randn(1, t_len, c_prev) * 0.1, jnp.float32).astype(dt)
        tp = timeit(f"stage{i} ConvT {c_prev}->{c_cur} u{u} plain",
                    lambda p, xx: nn.conv_transpose1d(p, xx, stride=u,
                                                      padding=(k - u) // 2),
                    params["ups"][i], x)
        total_plain += tp
        if p_stage > 1:
            xp = pc.pack(x, p_in)
            tq = timeit(f"stage{i} ConvT packed (P {p_in}->{p_stage})",
                        lambda p, xx: pc.packed_conv_transpose(
                            p, xx, k=k, u=u, pad=(k - u) // 2, P_in=p_in),
                        packed["ups"][i], xp)
        else:
            tq = tp
        total_packed += tq

        t_len *= u
        y = jnp.asarray(rng.randn(1, t_len, c_cur) * 0.1, jnp.float32).astype(dt)

        def resblocks_plain(blks, xx):
            xs = 0.0
            for j, (k_rb, d_rb) in enumerate(zip(cfg.resblock_kernel_sizes,
                                                 cfg.resblock_dilation_sizes)):
                xs = xs + gen._resblock1(blks[j], xx, k_rb, d_rb)
            return xs / 3

        tp = timeit(f"stage{i} resblocks C{c_cur} T{t_len} plain",
                    resblocks_plain, params["resblocks"][i], y)
        total_plain += tp
        if p_stage > 1:
            yp = pc.pack(y, p_stage)

            def resblocks_packed(blks, xx):
                xs = 0.0
                for j, (k_rb, d_rb) in enumerate(zip(
                        cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
                    xt0 = xx
                    for c1, c2, d in zip(blks[j]["convs1"], blks[j]["convs2"],
                                         d_rb):
                        xt = jax.nn.leaky_relu(xt0, gen.LRELU_SLOPE)
                        xt = pc.packed_conv1d(c1, xt, k=k_rb, dilation=d,
                                              pad=(k_rb * d - d) // 2,
                                              P=p_stage)
                        xt = jax.nn.leaky_relu(xt, gen.LRELU_SLOPE)
                        xt = pc.packed_conv1d(c2, xt, k=k_rb, dilation=1,
                                              pad=(k_rb - 1) // 2, P=p_stage)
                        xt0 = xt + xt0
                    xs = xs + xt0
                return xs / 3

            tq = timeit(f"stage{i} resblocks packed P{p_stage}",
                        resblocks_packed, packed["resblocks"][i], yp)
        else:
            tq = tp
        total_packed += tq
        c_prev = c_cur

    # --- conv_post ---
    y = jnp.asarray(rng.randn(1, t_len, c_prev) * 0.1, jnp.float32).astype(dt)
    tp = timeit("conv_post + tanh plain",
                lambda p, xx: jnp.tanh(nn.conv1d(p, xx, padding=3)),
                params["conv_post"], y)
    total_plain += tp
    p_fin = sched[-1][1]
    yp = pc.pack(y, p_fin)
    tq = timeit(f"conv_post packed P{p_fin}",
                lambda p, xx: jnp.tanh(pc.packed_conv1d(
                    p, xx, k=7, dilation=1, pad=3, P=p_fin)),
                packed["conv_post"], yp)
    total_packed += tq

    log(f"| SUM conv stages: plain {total_plain*1e3:.1f} ms, "
        f"packed {total_packed*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""ACF kernel experiment harness: ms/step + accuracy for kernel variants.

Timing per docs/PERF.md rules: chained dependent dispatches (pipelined
through the axon relay), device-side scalar accumulator, ONE final fetch,
warm-up round discarded.

Usage: python tools/exp_acf.py v1 v2h v2s
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

N_REP, N_FRAMES, N_RES = 8, 1000, 1024
N_DELTAS = N_FRAMES // 2


def variants():
    from spinrelax_tpu.ops.pallas_acf import acf_sums_pallas

    def acf_sums_pallas2(v, d, **kw):
        # explicit-config entry (modes default to the production
        # cat64c/split4/pcenter; variants override everything)
        kw.setdefault("cinv", "same")
        kw.setdefault("pcenter", False)
        kw.setdefault("mode", "highest")
        return acf_sums_pallas(v, d, **kw)
    from spinrelax_tpu.ops.autocorr import _acf_sums_xla

    from spinrelax_tpu.ops import autocorr as _ac

    return {
        "xla": _acf_sums_xla,
        # full ct_palmer (kernel + Palmer statistics): isolates the
        # post-kernel stats cost vs the bare "v1" kernel (bench.py shape)
        "v1stats": lambda v, d: jnp.stack(
            _ac.ct_palmer(jnp.swapaxes(v, 1, 2))
        ),
        "v1": lambda v, d: acf_sums_pallas(v, d),  # production default
        "v2h": lambda v, d: acf_sums_pallas2(v, d, mode="highest"),
        "v2s": lambda v, d: acf_sums_pallas2(v, d, mode="split3"),
        "v3": lambda v, d: acf_sums_pallas2(v, d, mode="split3c"),
        # accuracy levers on the CINV contraction
        "v3p": lambda v, d: acf_sums_pallas2(v, d, mode="split3c",
                                             pcenter=True),
        "v3p4": lambda v, d: acf_sums_pallas2(v, d, mode="split3c",
                                              pcenter=True, cinv="split4"),
        "v3hc": lambda v, d: acf_sums_pallas2(v, d, mode="split3c",
                                              cinv="highest"),
        # radix sweep at the best accuracy config
        "v3p4_64": lambda v, d: acf_sums_pallas2(v, d, mode="split3c",
                                                 pcenter=True, cinv="split4",
                                                 n1=64),
        "v3p4_96": lambda v, d: acf_sums_pallas2(v, d, mode="split3c",
                                                 pcenter=True, cinv="split4",
                                                 n1=96),
        # ablation ladder of v3 (timing only; accuracy is meaningless)
        **{f"abl{k}": (lambda k=k: lambda v, d: acf_sums_pallas2(
            v, d, mode="split3c", ablate=k))() for k in range(1, 6)},
        "abl0": lambda v, d: acf_sums_pallas2(v, d, mode="split3",
                                              ablate=-1),
        "abl1nc": lambda v, d: acf_sums_pallas2(v, d, mode="split3",
                                                ablate=1),
        # all-HIGHEST at better radix
        "vh96": lambda v, d: acf_sums_pallas2(v, d, mode="highest", n1=96),
        "vh128": lambda v, d: acf_sums_pallas2(v, d, mode="highest", n1=128),
        # split3 at radix 96 without centering (speed reference)
        "v2s_96": lambda v, d: acf_sums_pallas2(v, d, mode="split3", n1=96),
        # K-packed compensated dots (split terms ride the K padding)
        "v4": lambda v, d: acf_sums_pallas2(v, d, mode="cat3c",
                                            cinv="split4", pcenter=True),
        # cat6 stage-1 (the accuracy limiter), cat4 stage-2
        "v10": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                             cinv="split4", pcenter=True),
        # production-config variants of the round-3 parked levers
        "v10t": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                              cinv="split4", pcenter=True,
                                              fuse_transpose=True),
        # stage-2 via dot_general on the (N1, N2, 128) view (corner turn
        # folded into MXU operand staging instead of a Mosaic relayout)
        "v10dg": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                               cinv="split4", pcenter=True,
                                               dg2=True),
        "v10_t2": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                                cinv="split4", pcenter=True,
                                                tiles=2),
        # 256-lane tile: half the grid programs, double-width dots (the
        # round-4 lever the 64 MiB VMEM unlock made possible)
        "v10_l256": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                                  cinv="split4",
                                                  pcenter=True, lanes=256),
        "v10_l512": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                                  cinv="split4",
                                                  pcenter=True, lanes=512),
        "v10_t4": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                                cinv="split4", pcenter=True,
                                                tiles=4),
        # cat4 = cat3 + lo*lo term: same K-tile count (192 pads like 144)
        "v7": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                            cinv="split4", pcenter=True),
        "v7h": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                             cinv="highest", pcenter=True),
        "v7_64": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                               cinv="split4", pcenter=True,
                                               n1=64),
        "v7_96": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                               cinv="split4", pcenter=True,
                                               n1=96),
        # ablation ladder of the cat4c production candidate
        **{f"cabl{k}": (lambda k=k: lambda v, d: acf_sums_pallas2(
            v, d, mode="cat4c", cinv="split4", ablate=k))()
           for k in range(1, 6)},
        "cabl0": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                               ablate=-1),
        # ablation ladder of the PRODUCTION config (cat64c+split4+pcenter)
        # at --nrep 32: device-resolved per-stage costs (VERDICT r2 #4)
        **{f"pabl{k}": (lambda k=k: lambda v, d: acf_sums_pallas2(
            v, d, mode="cat64c", cinv="split4", pcenter=True,
            ablate=k))() for k in range(1, 6)},
        "pabl0": lambda v, d: acf_sums_pallas2(v, d, mode="cat64c",
                                               ablate=-1),
        # fused in-kernel input transpose (kills the XLA pre-pass)
        "v7t": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                             cinv="split4", pcenter=True,
                                             fuse_transpose=True),
        # per-stage split: cat4 stage-1, cat6 stage-2 (accuracy limiter)
        "v8nt": lambda v, d: acf_sums_pallas2(v, d, mode="cat46c",
                                              cinv="split4", pcenter=True),
        "v8": lambda v, d: acf_sums_pallas2(v, d, mode="cat46c",
                                            cinv="split4", pcenter=True,
                                            fuse_transpose=True),
        "v8h": lambda v, d: acf_sums_pallas2(v, d, mode="highest",
                                             fuse_transpose=True),
        # DMA + in-kernel transpose only
        "tabl0": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                               ablate=-1,
                                               fuse_transpose=True),
        # dispatch-throughput floor of the tunnel (trivial jitted op)
        "null": lambda v, d: jnp.zeros((v.shape[0], v.shape[1], d),
                                       v.dtype) + v[..., 0, 0][..., None],
        # multi-tile programs (amortise per-grid-step overhead)
        "cabl0_t4": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                                  ablate=-1, tiles=4),
        "v7_t2": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                               cinv="split4", pcenter=True,
                                               tiles=2),
        "v7_t4": lambda v, d: acf_sums_pallas2(v, d, mode="cat4c",
                                               cinv="split4", pcenter=True,
                                               tiles=4),
        "v8_t2": lambda v, d: acf_sums_pallas2(v, d, mode="cat46c",
                                               cinv="split4", pcenter=True,
                                               tiles=2),
        "v5": lambda v, d: acf_sums_pallas2(v, d, mode="cat6c",
                                            cinv="split4", pcenter=True),
        "v5nc": lambda v, d: acf_sums_pallas2(v, d, mode="cat6c",
                                              cinv="split4"),
        # cat6 WITHOUT time-domain centering (cat6 handles the DC at
        # HIGHEST-like quality on its own)
        "v6": lambda v, d: acf_sums_pallas2(v, d, mode="cat6",
                                            cinv="split4", pcenter=True),
    }


def bench(fn, iters=40):
    @jax.jit
    def gen(key):
        v = jax.random.normal(key, (N_REP, N_FRAMES, N_RES, 3),
                              dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    @jax.jit
    def step(x, acc):
        s = fn(jnp.swapaxes(x, 1, 2), N_DELTAS)
        return acc + s[0, 0, 0] + s[-1, -1, -1]

    x = gen(jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF))
    acc = step(x, jnp.zeros((), jnp.float32))
    for _ in range(10):
        acc = step(x, acc)
    float(acc)  # warm-up + steady state
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = step(x, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def accuracy(fn):
    """Max abs error vs f64 direct lag sums on a small workload."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=(256, 200, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    d = 100
    # f64 reference on host
    ref = np.zeros((256, d))
    for delta in range(1, d + 1):
        dots = np.einsum("bfi,bfi->bf", v[:, :-delta], v[:, delta:])
        ref[:, delta - 1] = np.sum(dots**2, axis=1)
    got = np.asarray(fn(jnp.asarray(v, jnp.float32), d))
    # C(t)-scale error: the statistic is -0.5 + 1.5*s/n_vals
    n_vals = 200 - np.arange(1, d + 1)
    return np.abs(1.5 * (got - ref) / n_vals).max()


def main():
    global N_REP
    args = sys.argv[1:]
    # --nrep N: floor-amortising batch (0.79 ms relay floor is ~25% of a
    # canonical 8-chunk step but ~7% at 32 — sub-0.5 ms kernel deltas are
    # only resolvable at the larger batch, docs/PERF.md).
    if "--nrep" in args:
        i = args.index("--nrep")
        N_REP = int(args[i + 1])
        del args[i : i + 2]
    names = args or ["v1", "v2h", "v2s"]
    vs = variants()
    for name in names:
        fn = vs[name]
        skip_acc = "abl" in name or name in ("null", "v1stats")
        err = float("nan") if skip_acc else accuracy(fn)
        ms = bench(fn) * 1e3
        fv = N_REP * N_FRAMES * N_RES / (ms / 1e3)
        print(f"{name}: {ms:.2f} ms/step  {fv:.3g} fv/s  Ct_err={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()

"""Standing ON-HARDWARE program sweep (VERDICT round-4 #3).

Compiles AND RUNS every device entry point of the shipped pipeline at
(small instances of) its production shapes, on whatever backend the
process gets — on this container that is the real TPU v5e through the
axon tunnel.  One JSON line per program:

    {"program": ..., "ok": true/false, "compile_s": ..., "run_s": ...,
     "shapes": ..., "error": ...}

plus a final summary line; exit status is non-zero when any program
fails.  Rationale: the CPU-backend driver checks and the test suite
cannot see Mosaic/TPU-only lowering failures — entry()'s flagship
forward failed to compile on the REAL chip for three rounds (the
zero-row stage-1 pad, ops/pallas_acf.py) while every CPU check stayed
green.  This sweep is the regression net for that class of bug: run it
every round before the snapshot (CLAUDE.md), record the result in
docs/PERF.md.

Programs covered (the complete jit/Pallas production surface):
  entry_forward           __graft_entry__.entry() — flagship forward
  acf_pallas_canonical    fused ACF kernel, canonical F=1000 (zpad>0)
  acf_pallas_zpadfree     fused ACF kernel at F %% N2 == 0 (the round-4
                          Mosaic regression shape family)
  acf_pallas_pretiled     production streamed group step on tile layout
  acf_xla_fallback        the XLA matmul-DFT chain (VMEM-overflow route)
  streamed_update         stage_ct_streamed's fused per-group program
                          (ACF + Palmer + S2 + vec-avg + histogram)
  dq_streamed             _dq_chunk_sums + fused _finalise_device
  dq_multi_streamed       per-replica streamed sums + multi finalise
  ladder_default          fit_ct_ladder DEFAULT flags (every rung LM
                          program incl. the packed fetch wrappers)
  ladder_stacked          the one-jit all-rungs stacked LM
  cycle_device            GlobalFitter fused alternating device cycle
  rates_newapi            batched J(omega) -> R1/R2/NOE prediction

Usage (TPU, from the repo root — do NOT force the CPU platform):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py
First run of a fresh cache pays remote-AOT compiles (minutes); the
persistent compile cache makes re-runs seconds.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

RESULTS = []


def check(name):
    """Decorator registering a sweep program; each returns a shape note."""

    def deco(fn):
        fn._sweep_name = name
        CHECKS.append(fn)
        return fn

    return deco


CHECKS = []


@check("entry_forward")
def _entry(jax, jnp):
    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # Primary physics outputs must be finite; fit-uncertainty fields may
    # legitimately NaN on degenerate random components at this tiny size.
    for fld in ("Ct", "S2", "R1", "R2", "NOE", "rho"):
        x = np.asarray(getattr(out, fld))
        assert np.all(np.isfinite(x)), fld
    return "flagship forward, (4,64,16,3)"


@check("acf_pallas_canonical")
def _acf_canonical(jax, jnp):
    from spinrelax_tpu.ops.pallas_acf import acf_sums_pallas

    rng = np.random.default_rng(int(time.time()) % 2**31)
    v = rng.normal(size=(256, 1000, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    s = jax.jit(lambda x: acf_sums_pallas(x, 500))(jnp.asarray(v))
    s = np.asarray(s)
    assert s.shape == (256, 500) and np.all(np.isfinite(s))
    # cross-check the first lag against numpy at f32 tolerance
    want = np.sum(np.einsum("bfd,bfd->bf", v[:, :-1], v[:, 1:]) ** 2, axis=1)
    np.testing.assert_allclose(s[:, 0], want, rtol=2e-4)
    return "(256,1000,3) f32, n_deltas=500"


@check("acf_pallas_zpadfree")
def _acf_zpadfree(jax, jnp):
    # F an exact multiple of the stage-1 split: the zero-row-pad branch
    # Mosaic rejected for three rounds (fixed round 4; pinned here ON
    # the chip, not just in interpret mode).
    from spinrelax_tpu.ops.pallas_acf import _kernel_constants, acf_sums_pallas

    F = 64
    nd = 32
    _nfft, _n1, n2, _nd_pad = _kernel_constants(F, nd, "float32")[:4]
    assert F % n2 == 0, (F, n2)  # guard: still the zpad-free family
    rng = np.random.default_rng(int(time.time()) % 2**31 + 1)
    v = rng.normal(size=(128, F, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    s = np.asarray(jax.jit(lambda x: acf_sums_pallas(x, nd))(jnp.asarray(v)))
    assert s.shape == (128, nd) and np.all(np.isfinite(s))
    want = np.sum(np.einsum("bfd,bfd->bf", v[:, :-1], v[:, 1:]) ** 2, axis=1)
    np.testing.assert_allclose(s[:, 0], want, rtol=2e-4)
    return f"(128,{F},3) f32, F %% N2 == 0 (N2={n2})"


@check("acf_pallas_pretiled")
def _acf_pretiled(jax, jnp):
    from spinrelax_tpu.ops.autocorr import (
        palmer_group_update_pretiled, palmer_pooled_stats,
    )

    n_group, n_frames, n_res = 8, 1000, 128
    n_deltas = n_frames // 2
    n_tiles = (n_group * n_res) // 128
    rng = np.random.default_rng(int(time.time()) % 2**31 + 2)
    v = rng.normal(size=(n_tiles, 3, n_frames, 128)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    acc_s = jnp.zeros((n_deltas, n_res), jnp.float32)
    acc_s2 = jnp.zeros((n_deltas, n_res), jnp.float32)
    step = jax.jit(
        lambda vt, a, b: palmer_group_update_pretiled(vt, a, b, n_group, n_res)
    )
    acc_s, acc_s2 = step(jnp.asarray(v), acc_s, acc_s2)
    ct, dct = palmer_pooled_stats(acc_s, acc_s2, n_group)
    ct = np.asarray(ct)
    assert np.all(np.isfinite(ct)) and np.all(np.abs(ct) <= 1.0 + 1e-3)
    return f"tiles ({n_tiles},3,{n_frames},128), group={n_group}"


@check("acf_xla_fallback")
def _acf_xla(jax, jnp):
    from spinrelax_tpu.ops import autocorr

    old = autocorr.ACF_IMPL
    autocorr.ACF_IMPL = "xla"
    try:
        rng = np.random.default_rng(int(time.time()) % 2**31 + 3)
        v = rng.normal(size=(128, 1000, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        s = np.asarray(jax.jit(
            lambda x: autocorr._acf_sums(x, 500)
        )(jnp.asarray(v)))
        assert s.shape == (128, 500) and np.all(np.isfinite(s))
        want = np.sum(
            np.einsum("bfd,bfd->bf", v[:, :-1], v[:, 1:]) ** 2, axis=1
        )
        np.testing.assert_allclose(s[:, 0], want, rtol=2e-4)
    finally:
        autocorr.ACF_IMPL = old
    return "(128,1000,3) f32 via matmul-DFT"


@check("streamed_update")
def _streamed_update(jax, jnp):
    from spinrelax_tpu.pipeline.stages import _streamed_update_program
    from spinrelax_tpu.ops import autocorr

    fpc, g, n_bonds = 200, 4, 64
    nbx, nby = 36, 18
    prog = _streamed_update_program(
        fpc, True, True, True, True, "Histogram", nbx, nby,
        autocorr.ACF_IMPL,
    )
    n_deltas = fpc // 2
    acc = {}
    for key in ("ext", "int"):
        acc[f"ct_{key}_s"] = jnp.zeros((n_bonds, n_deltas), jnp.float32)
        acc[f"ct_{key}_s2"] = jnp.zeros((n_bonds, n_deltas), jnp.float32)
    acc["s2_s"] = jnp.zeros((n_bonds,), jnp.float32)
    acc["s2_s2"] = jnp.zeros((n_bonds,), jnp.float32)
    acc["vec_sum"] = jnp.zeros((n_bonds, 3), jnp.float32)
    acc["hist"] = jnp.zeros((n_bonds, nbx, nby), jnp.int32)
    rng = np.random.default_rng(int(time.time()) % 2**31 + 4)
    vr = rng.normal(size=(g, fpc, n_bonds, 3)).astype(np.float32)
    vr /= np.linalg.norm(vr, axis=-1, keepdims=True)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)  # padded tail
    out, extras = prog(jnp.asarray(vr), jnp.asarray(vr), w, None, acc)
    jax.block_until_ready(out)
    ct_s = np.asarray(out["ct_int_s"])
    assert np.all(np.isfinite(ct_s))
    assert int(np.asarray(out["hist"]).sum()) == 3 * fpc * n_bonds
    return f"fused group step g={g}, fpc={fpc}, bonds={n_bonds}, hist"


def _np_qmult(a, b):
    """Hamilton product, numpy, (4,) x (4,) -> (4,)."""
    w = a[0] * b[0] - np.dot(a[1:], b[1:])
    v = a[0] * b[1:] + b[0] * a[1:] + np.cross(a[1:], b[1:])
    return np.concatenate([[w], v])


def _walk_quats(n, rng, step=0.02):
    """Small-step random walk on SO(3): realistic decaying dq stats."""
    ax = rng.normal(size=(n, 3)) * step
    ang = np.linalg.norm(ax, axis=-1)
    half = ang / 2.0
    qs = np.concatenate(
        [np.cos(half)[:, None],
         ax * (np.sin(half) / np.maximum(ang, 1e-12))[:, None]], axis=1
    )
    q = np.empty((n, 4))
    q[0] = [1.0, 0, 0, 0]
    for i in range(1, n):
        q[i] = _np_qmult(qs[i], q[i - 1])
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@check("dq_streamed")
def _dq_streamed(jax, jnp):
    from spinrelax_tpu.ops import dq

    rng = np.random.default_rng(int(time.time()) % 2**31 + 5)
    n = 20000
    q = _walk_quats(n, rng)

    def chunks():
        for off in range(0, n, 4096):
            yield q[off: off + 4096]

    res = dq.analyse_dq_streamed(chunks(), 1.0, 5.0, 200.0, 5.0,
                                 chunk_frames=4096, n_chunks=4, n_total=n)
    assert np.isfinite(float(np.asarray(res.D_iso)))
    return f"stream n={n}, chunk 4096, n_chunks=4"


@check("dq_multi_streamed")
def _dq_multi(jax, jnp):
    from spinrelax_tpu.ops import dq

    rng = np.random.default_rng(int(time.time()) % 2**31 + 6)
    n = 6000
    # two independent replica walks
    q = np.concatenate([_walk_quats(n, rng), _walk_quats(n, rng)])

    def rep_chunks():
        for r in range(2):
            rq = q[r * n: (r + 1) * n]
            for off in range(0, n, 2048):
                yield r, rq[off: off + 2048]

    res = dq.analyse_dq_multi_streamed(rep_chunks(), 1.0, 5.0, 100.0, 5.0,
                                       chunk_frames=2048, n_chunks=2)
    assert np.isfinite(float(np.asarray(res.D_iso)))
    return f"2 replicas x {n}, chunk 2048"


@check("lm_engine")
def _lm_engine(jax, jnp):
    # Fused Pallas LM engine vs the vmapped XLA path ON the chip (the
    # interpret-mode parity test runs on CPU; this is the Mosaic arm).
    import spinrelax_tpu.fit.engine as eng

    dt, y, dy = _ladder_cohort(B=1024)
    a = eng.fit_multiexp_engine(dt, y, dy, K=2, s2_free=True)
    import spinrelax_tpu.fit.lm as lm

    b = lm._fit_multiexp_xla(jnp.asarray(dt, jnp.float32), jnp.asarray(y),
                             jnp.asarray(dy), K=2, s2_free=True)
    ca, cb = np.asarray(a.chisq), np.asarray(b.chisq)
    assert np.all(np.isfinite(ca))
    rel = np.abs(ca - cb) / np.maximum(cb, 1e-12)
    assert np.median(rel) < 1e-4, np.median(rel)
    return f"engine vs XLA on-chip, B=1024 K=2 (median rel {np.median(rel):.1e})"


def _ladder_cohort(B=512, T=500):
    rng = np.random.default_rng(int(time.time()) % 2**31 + 7)
    dt = np.arange(1, T + 1, dtype=float)
    S2 = rng.uniform(0.6, 0.9, B)
    C1 = rng.uniform(0.05, 0.2, B)
    tau1 = rng.uniform(5, 30, B)
    C2 = 1.0 - S2 - C1
    tau2 = rng.uniform(100, 400, B)
    y = (S2[:, None] + C1[:, None] * np.exp(-dt / tau1[:, None])
         + C2[:, None] * np.exp(-dt / tau2[:, None]))
    y += rng.normal(scale=2e-3, size=y.shape)
    dy = np.full_like(y, 2e-3)
    return dt, y.astype(np.float32), dy.astype(np.float32)


@check("ladder_default")
def _ladder(jax, jnp):
    from spinrelax_tpu.fit.expfit import fit_ct_ladder

    dt, y, dy = _ladder_cohort()
    names = [str(i) for i in range(y.shape[0])]
    res = fit_ct_ladder(names, dt, y, dy)
    S2 = np.asarray(res.S2)
    assert np.all(np.isfinite(S2)) and S2.shape == (y.shape[0],)
    return f"B={y.shape[0]}, T={dt.size}, default flags (all rung LMs)"


@check("ladder_stacked")
def _ladder_stacked(jax, jnp):
    from spinrelax_tpu.fit.expfit import fit_ct_ladder

    dt, y, dy = _ladder_cohort(B=128)
    names = [str(i) for i in range(y.shape[0])]
    res = fit_ct_ladder(names, dt, y, dy, stacked=True, warm_retry=False,
                        retry_starts=1)
    assert np.all(np.isfinite(np.asarray(res.S2)))
    return "B=128 one-jit stacked all-rungs LM"


@check("cycle_device")
def _cycle(jax, jnp):
    from spinrelax_tpu.constants import NucleusPair, field_from_mhz
    from spinrelax_tpu.fit.globalfit import GlobalFitter
    from spinrelax_tpu.models.ctmodel import CtModelSet
    from spinrelax_tpu.models.diffusion import Diffusion
    from spinrelax_tpu.models.experiments import ExperimentData, ExperimentSet
    from spinrelax_tpu.ops import observables as obs

    rng = np.random.default_rng(int(time.time()) % 2**31 + 8)
    n_res, n_samp = 8, 16
    names = [str(i + 2) for i in range(n_res)]
    S2 = rng.uniform(0.6, 0.9, n_res)
    C = rng.uniform(0.02, 0.1, (n_res, 2))
    tau = np.stack(
        [rng.uniform(5, 30, n_res), rng.uniform(100, 800, n_res)], axis=-1
    )
    cts = CtModelSet.from_lists(names, S2, list(C), list(tau),
                                s2fast=[True] * n_res, zeta=0.89, sort=False)
    v = rng.normal(size=(n_res, n_samp, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    w = rng.uniform(0.5, 2.0, (n_res, n_samp))
    diff = Diffusion.axisymmetric(diso=4e-5, aniso=1.5)
    expts = []
    for f in (600.133, 850.13):
        pair = NucleusPair(B0=field_from_mhz(f), time_unit="ps")
        rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v, weights=w)
        for t, vals, errs in (("R1", rates.R1, rates.dR1),
                              ("R2", rates.R2, rates.dR2),
                              ("NOE", rates.NOE, rates.dNOE)):
            y = np.asarray(vals).copy()
            expts.append(ExperimentData(
                expt_type=t, nuclei_a="15N", nuclei_b="1H", frequency=f,
                freq_unit="MHz", names=np.array(names), values=y,
                errors=np.maximum(np.asarray(errs), 0.02 * np.abs(y)),
            ))
    es = ExperimentSet.build(expts, cts, diff.with_diso(4.6e-5),
                             vecs=v, weights=w)
    fitter = GlobalFitter(es, ["Diso", "rsCSA"])
    state = fitter.run(max_cycles=2, method="device")
    assert np.isfinite(state.chisq)
    return f"nRes={n_res}, 2 fields, Diso+rsCSA fused cycle x2"


@check("rates_newapi")
def _rates(jax, jnp):
    from spinrelax_tpu.constants import NucleusPair, field_from_mhz
    from spinrelax_tpu.models.ctmodel import CtModelSet
    from spinrelax_tpu.models.diffusion import Diffusion
    from spinrelax_tpu.ops import observables as obs

    rng = np.random.default_rng(int(time.time()) % 2**31 + 9)
    n_res = 1024
    names = [str(i) for i in range(n_res)]
    S2 = rng.uniform(0.6, 0.9, n_res)
    C = rng.uniform(0.02, 0.1, (n_res, 2))
    tau = np.stack(
        [rng.uniform(5, 30, n_res), rng.uniform(100, 800, n_res)], axis=-1
    )
    cts = CtModelSet.from_lists(names, S2, list(C), list(tau),
                                s2fast=[True] * n_res, zeta=0.89, sort=False)
    diff = Diffusion.axisymmetric(diso=4e-5, aniso=1.5)
    v = rng.normal(size=(n_res, 8, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v)
    r1 = np.asarray(rates.R1)
    assert r1.shape == (n_res,) and np.all(np.isfinite(r1))
    return f"nRes={n_res} symmtop-ensemble R1/R2/NOE"


def main():
    try:
        from spinrelax_tpu.utils.compile_cache import enable_default

        enable_default()
    except Exception:
        pass
    import jax

    if "--cpu" in sys.argv:
        # Shakeout mode: run the sweep harness on the host CPU (API /
        # shape errors surface in seconds).  The REAL sweep must run on
        # the TPU backend — that is its entire point.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    n_fail = 0
    for fn in CHECKS:
        name = fn._sweep_name
        rec = {"program": name, "platform": platform}
        t0 = time.perf_counter()
        try:
            shapes = fn(jax, jnp)
            rec["ok"] = True
            rec["shapes"] = shapes
            rec["wall_s"] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 - report and continue
            rec["ok"] = False
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["wall_s"] = round(time.perf_counter() - t0, 3)
            rec["traceback"] = traceback.format_exc()[-2000:]
            n_fail += 1
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "program": "SUMMARY", "platform": platform,
        "n_programs": len(CHECKS), "n_fail": n_fail,
        "ok": n_fail == 0,
    }), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

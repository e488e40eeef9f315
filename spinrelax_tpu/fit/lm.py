"""Batched bounded Levenberg-Marquardt in pure JAX.

Replaces the reference's sequential per-residue ``scipy.optimize.curve_fit``
calls (fitting_Ct_functions.py:306-345) with one vmapped trust-region LM:
all residues (and all ladder rungs) fit in parallel on the accelerator.

Box constraints are enforced with a smooth sigmoid reparameterisation;
parameter uncertainties are evaluated in the *original* parameter space at
the solution (cov = inv(J^T J) * reduced-chi-square, matching
``curve_fit(..., absolute_sigma=False)`` semantics used by the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# Precision of the IN-LOOP normal-equation matmuls (J^T J, J^T r).  The
# loop's H only shapes trust-region steps — solution accuracy is set by
# convergence — but bf16-pass H on TPU f32 measurably degraded step
# quality in round-2 testing, so this stays HIGHEST by default; module
# knob so benchmarks can A/B.  NOTE: captured at TRACE time — set it
# BEFORE the first jitted fit of a given shape in the process, or the
# stale jit cache silently keeps the old precision.  The covariance
# TAIL is pinned HIGHEST unconditionally (uncertainties are reported
# values).
LM_INLOOP_PRECISION = jax.lax.Precision.HIGHEST


class LMResult(NamedTuple):
    params: jnp.ndarray  # (P,) best-fit parameters (original space)
    perr: jnp.ndarray  # (P,) 1-sigma uncertainties
    cost: jnp.ndarray  # () final 0.5*sum(r^2)
    n_iter: jnp.ndarray  # () iterations used
    converged: jnp.ndarray  # () bool


def _to_unconstrained(p, lo, hi):
    """Inverse sigmoid map into R (clipped slightly inside the box)."""
    span = hi - lo
    f = jnp.clip((p - lo) / span, 1e-6, 1.0 - 1e-6)
    return jnp.log(f / (1.0 - f))


def _to_constrained(t, lo, hi):
    return lo + (hi - lo) * jax.nn.sigmoid(t)


def _chol_factor_small(A):
    """Lower-triangular Cholesky factor of a TINY static-P SPD matrix,
    unrolled at trace time; returned as a list-of-lists of scalars (per
    batch lane under vmap).  Non-PD input produces NaNs — the honest
    failure every consumer is guarded for."""
    P = A.shape[-1]
    L = [[None] * P for _ in range(P)]
    for j in range(P):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, P):
            s2 = A[..., i, j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 * inv
    return L


def _chol_solve_small(A, b):
    """Solve the SPD system A x = b for a TINY static P by a Cholesky
    factorisation unrolled at trace time.

    ``jnp.linalg.solve`` lowers batched small systems to scalar LU loops
    on TPU — measured 82% of the whole vmapped LM iteration at the ladder
    workload (P=9, B=1e4: 1.76 s vs 0.31 s per 60 iterations without the
    solve; docs/PERF.md round 3).  Unrolling P statically turns the solve
    into ~P^3/3 fused elementwise ops that vmap cleanly over the batch.

    A must be symmetric positive definite (the LM damping A = J^T J +
    lam*diag guarantees it for finite inputs).  A non-PD A produces NaNs
    — exactly the honest failure the LM's `improved` guard expects, which
    then raises lambda (making A more diagonal) and retries.
    """
    L = _chol_factor_small(A)
    P = len(L)
    y = []
    for i in range(P):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _spd_inv_diag_small(A):
    """diag(A^-1) for a TINY static-P SPD matrix via the unrolled
    Cholesky: A^-1 = L^-T L^-1, so (A^-1)_ii = ||column i of L^-1||^2 —
    one forward substitution against e_i per diagonal element, ~P^3/6
    fused elementwise ops total.

    This replaces ``jnp.linalg.pinv`` in the covariance tail of the
    DENSE LM paths (pinv's batched tiny SVD measured 210 ms of each
    ~570 ms ladder rung on the v5e, docs/PERF.md round 3).  Exact for
    invertible A.  The sigmoid box keeps parameters strictly interior,
    but a dead component's C_i can still UNDERFLOW to exactly 0, zeroing
    its tau column — lm_solve's cov="chol" branch pre-handles exact-zero
    diagonals by identity-substituting dead rows/cols and zeroing their
    variances, matching scipy curve_fit's truncated-SVD pcov (which
    ZEROES degenerate directions rather than reporting inf, so the
    reference ACCEPTS such fits).  A NEAR-singular A (nonzero but tiny
    pivots) yields huge/NaN variances here where scipy's rcond cutoff
    might truncate — callers flag those via the dPar>Par check;
    cov="pinv" reproduces the truncation window exactly.  The STACKED
    solver (exact zero columns by masking design) keeps pinv — its
    null-space-zeroing semantics are what freeze the masked parameters.
    """
    L = _chol_factor_small(A)
    P = len(L)
    diag = []
    for i in range(P):
        y = {i: 1.0 / L[i][i]}
        acc = y[i] * y[i]
        for r in range(i + 1, P):
            s = 0.0
            for k in range(i, r):
                s = s - L[r][k] * y[k]
            y[r] = s / L[r][r]
            acc = acc + y[r] * y[r]
        diag.append(acc)
    return jnp.stack(diag, axis=-1)


def lm_solve(
    residual_fn: Callable,
    p0: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    max_iter: int = 60,
    lam0: float = 1e-3,
    xtol: float = 1e-10,
    n_par_eff=None,
    ftol=None,
    xtol_rel=None,
    stall_window: int = 8,
    lam_stuck: float = 1e6,
    cov: str = "pinv",
    residual_jac_fn: Callable | None = None,
    skip=None,
) -> LMResult:
    """Minimise 0.5*||residual_fn(p)||^2 subject to lo <= p <= hi.

    ``residual_fn`` maps (P,) -> (N,).  Designed to be vmapped over a batch
    of independent problems (each with its own p0/lo/hi closure data).

    ``n_par_eff``: effective (traced) parameter count for the
    reduced-chi-square DoF when some of the P parameters are frozen masks
    (their Jacobian columns are exactly zero, which decouples them from
    the LM step); defaults to the static P.

    Convergence (per vmapped lane; the batched while_loop runs until
    EVERY lane is done, so lane-level exits are what bound wall time):

    - accepted step with max|step| < ``xtol`` (the classic criterion —
      in f32 this effectively never fires, which is why the next two
      exist);
    - accepted step whose relative cost improvement is below ``ftol``
      (default 10 ulp of the working dtype: f64 ~2e-15 — far beyond
      scipy's 1e-8, so curve_fit-parity results are unchanged — while
      f32 gets ~1.2e-6, the smallest improvement distinguishable from
      rounding noise in a single f32 subtraction);
    - accepted step with ||step|| < ``xtol_rel`` * (``xtol_rel`` +
      ||t||) in the unconstrained space, tested only while the damping
      is at/below its starting value (step ~ Gauss-Newton) — scipy
      TRF's xtol criterion.  Default sqrt(eps) of the working dtype:
      1.5e-8 in f64 (scipy's own 1e-8 scale, so curve_fit parity is
      unchanged) and 3.5e-4 in f32;
    - a whole ``stall_window`` of iterations (accepted or not) that
      together improved the best-seen cost by less than
      ``stall_window * ftol`` relative.  This is the criterion that
      actually releases overparameterised lanes (VERDICT round 4: K>=3
      ladder rungs burned all 60 lockstep iterations): a collapsed
      component wanders in a near-flat direction finding ~tens-of-ulp
      improvements per ACCEPTED step with large t-space steps, so
      neither per-step test above ever fires, while the windowed rate
      — under 10 ulp/iteration sustained — is indistinguishable from
      rounding noise.  ``ftol`` scaling makes it dtype-aware: ~1e-14
      relative per window in f64 (true stagnation only — curve_fit
      parity unchanged) vs ~1e-5 in f32, where cost is genuinely
      pinned at its rounding floor;
    - ``lam`` has grown past ``lam_stuck`` (a lane whose trust region
      has collapsed through ~17 net rejected steps cannot move again:
      rejections only shrink the region further).

    ``skip``: optional traced bool — a lane created already-done (its
    while_loop body is select-masked from iteration 0 and the returned
    state is the unmodified p0 projection).  The in-graph ladder walk
    passes broken lanes here so dead rungs cost no iterations.

    ``cov``: "pinv" (default; null-space-zeroing uncertainties — required
    when residual_fn freezes parameters via exactly-zero Jacobian
    columns, as the stacked ladder does) or "chol"
    (:func:`_spd_inv_diag_small`; exact for invertible J^T J and ~200 ms
    cheaper per 1e4-residue rung on TPU; exactly-zero Jacobian columns
    get zero variance like scipy's truncated-SVD pcov, but NEAR-singular
    systems yield huge/NaN variances where pinv/scipy would truncate).

    ``residual_jac_fn``: optional ``p -> (r, J)`` returning the residual
    AND its analytic Jacobian wrt the ORIGINAL (constrained) parameters
    in one evaluation.  When given it replaces the in-loop
    ``jax.jacfwd`` (which costs a primal re-run plus one tangent pass
    per parameter); the box chain rule (dp/dt = span * s * (1 - s)) is
    applied here.  The supplied J must equal the AD Jacobian — it is the
    same mathematical derivative, pinned by tests — and the covariance
    tail reuses it.
    """
    if cov not in ("chol", "pinv"):
        raise ValueError(f"unknown cov {cov!r} (chol|pinv)")
    t0 = _to_unconstrained(p0, lo, hi)
    ftol_v = 10.0 * jnp.finfo(t0.dtype).eps if ftol is None else ftol
    xtol_rel_v = (
        float(np.sqrt(jnp.finfo(t0.dtype).eps)) if xtol_rel is None
        else xtol_rel
    )

    def r_of_t(t):
        return residual_fn(_to_constrained(t, lo, hi))

    def cost_of_t(t):
        r = r_of_t(t)
        return 0.5 * jnp.sum(r * r)

    n_par = p0.shape[0]

    _hi = LM_INLOOP_PRECISION  # TPU f32 matmuls default to bf16

    def r_and_J_of_t(t):
        if residual_jac_fn is None:
            return r_of_t(t), jax.jacfwd(r_of_t)(t)
        p = _to_constrained(t, lo, hi)
        r, Jp = residual_jac_fn(p)
        s = jax.nn.sigmoid(t)
        return r, Jp * ((hi - lo) * s * (1.0 - s))[None, :]

    def body(state):
        t, lam, it, done, _, c_best, c_mark = state
        r, J = r_and_J_of_t(t)  # (N,), (N, P)
        g = jnp.matmul(J.T, r, precision=_hi)
        H = jnp.matmul(J.T, J, precision=_hi)
        A = H + lam * jnp.eye(n_par, dtype=t.dtype) * jnp.maximum(jnp.diag(H), 1e-12)
        step = -_chol_solve_small(A, g)
        t_new = t + step
        c_old = 0.5 * jnp.sum(r * r)
        c_new = cost_of_t(t_new)
        improved = (c_new < c_old) & jnp.isfinite(c_new)
        t_next = jnp.where(improved, t_new, t)
        lam_next = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-12), jnp.minimum(lam * 3.0, 1e10))
        small = jnp.max(jnp.abs(step)) < xtol
        flat = improved & ((c_old - c_new) <= ftol_v * c_old)
        # scipy-TRF xtol: checked on ACCEPTED steps only, and only when
        # the damping is at/below its starting value (trust region wide
        # open, step ~ Gauss-Newton).  A tiny accepted step under LARGE
        # lambda reflects the damping, not the curvature — lanes stopped
        # there mid-backtrack measured up to 50% worse cost in A/B.
        small_rel = improved & (lam <= lam0) & (
            jnp.linalg.norm(step)
            < xtol_rel_v * (xtol_rel_v + jnp.linalg.norm(t))
        )
        # Windowed stall: every stall_window iterations, compare the
        # best-seen cost against its value a window ago; an entire
        # window advancing less than stall_window * ftol relative is
        # rounding-noise grinding (the overparameterised-lane release —
        # see the docstring; per-step tests cannot catch it because the
        # per-step improvements stay tens of ulp with large steps).
        c_best_next = jnp.minimum(
            jnp.minimum(c_best,
                        jnp.where(jnp.isfinite(c_old), c_old, c_best)),
            jnp.where(jnp.isfinite(c_new), c_new, c_best),
        )
        at_window = (it + 1) % stall_window == 0
        # The lam gate separates "grinding at the noise floor" (accepts
        # every few steps, lam hovers around lam0) from a REJECTION
        # plateau (lam grows 3x per rejection — a no-progress window
        # there just means the trust region is still adapting, and the
        # lane may yet recover; un-gated, such lanes stopped with up to
        # 33% worse cost in A/B).
        stalled = (
            at_window & jnp.isfinite(c_mark) & (lam_next <= 100.0 * lam0)
            & ((c_mark - c_best_next)
               <= stall_window * ftol_v * c_best_next)
        )
        c_mark_next = jnp.where(at_window, c_best_next, c_mark)
        done_next = (done | (improved & small) | flat | small_rel
                     | stalled | (lam_next >= lam_stuck))
        # FREEZE a converged lane.  JAX's batched-while_loop lowering
        # already per-lane-masks the carry once a lane's own cond is
        # false (loops.py _pred_bcast_select_hlo), so lane results are
        # batch-composition-independent either way; this explicit freeze
        # makes that property LOCALLY visible (early_stop bucket
        # gathering and padded sharded batches rely on it) rather than
        # resting on a lowering detail, at the cost of three cheap
        # selects per iteration.
        t_next = jnp.where(done, t, t_next)
        lam_next = jnp.where(done, lam, lam_next)
        it_next = jnp.where(done, it, it + 1)
        return (t_next, lam_next, it_next, done_next, c_new,
                c_best_next, c_mark_next)

    def cond(state):
        _, _, it, done, _, _, _ = state
        return (it < max_iter) & (~done)

    done0 = jnp.asarray(False) if skip is None else skip
    inf0 = jnp.asarray(jnp.inf, t0.dtype)
    t_fin, _, it_fin, done_fin, _, _, _ = jax.lax.while_loop(
        cond, body, (t0, jnp.asarray(lam0, t0.dtype), jnp.asarray(0),
                     done0, jnp.asarray(0.0, t0.dtype), inf0, inf0)
    )
    p_fin = _to_constrained(t_fin, lo, hi)
    # Uncertainties in original space (curve_fit absolute_sigma=False).
    if residual_jac_fn is None:
        r_fin = residual_fn(p_fin)
        Jp = jax.jacfwd(residual_fn)(p_fin)  # (N, P)
    else:
        r_fin, Jp = residual_jac_fn(p_fin)
    cost = 0.5 * jnp.sum(r_fin * r_fin)
    H = jnp.matmul(Jp.T, Jp, precision=jax.lax.Precision.HIGHEST)
    n_data = r_fin.shape[0]
    dof = jnp.maximum(n_data - (n_par if n_par_eff is None else n_par_eff), 1)
    red_chisq = jnp.sum(r_fin * r_fin) / dof
    if cov == "chol":
        # scipy curve_fit's pcov comes from a TRUNCATED SVD of the final
        # Jacobian: an exactly-dead direction (zero column — e.g. a dead
        # component whose C_i underflowed to exactly 0, zeroing its tau
        # column) gets ZERO variance, not inf, so the reference's
        # dPar>Par check ACCEPTS such fits.  Reproduce that for exact
        # zeros by replacing dead rows/cols with identity before the
        # Cholesky and zeroing their variances; NEAR-singular (nonzero
        # but below scipy's rcond cutoff) still yields huge/NaN here
        # where scipy would truncate — callers needing scipy's exact
        # truncation window use cov="pinv".
        dead = jnp.diag(H) == 0.0
        eye = jnp.eye(n_par, dtype=H.dtype)
        Hs = jnp.where(dead[:, None] | dead[None, :], eye, H)
        var = jnp.where(dead, 0.0, _spd_inv_diag_small(Hs)) * red_chisq
    else:
        var = jnp.diag(jnp.linalg.pinv(H)) * red_chisq
    perr = jnp.sqrt(jnp.clip(var, 0.0))
    return LMResult(p_fin, perr, cost, it_fin, done_fin)


# ---------------------------------------------------------------------------
# Multi-exponential C(t) model fitting
# ---------------------------------------------------------------------------


def _multiexp_residual(p, dt, decay, sigma, K: int, s2_free: bool):
    """Residuals of C(t) = S2 + sum C_i exp(-t/tau_i); when S2 is not free
    it is the closure 1 - sum(C) (fitting_Ct_functions.py:419-427)."""
    C = p[:K]
    tau = p[K : 2 * K]
    S2 = p[-1] if s2_free else 1.0 - jnp.sum(C)
    model = S2 + jnp.sum(C[:, None] * jnp.exp(-dt[None, :] / tau[:, None]), axis=0)
    return (model - decay) / sigma


def _multiexp_res_jac(p, dt, decay, sigma, K: int, s2_free: bool):
    """Residual AND analytic Jacobian of :func:`_multiexp_residual` in one
    evaluation, sharing the K exponential planes.

    ``jax.jacfwd`` costs a primal re-run plus one tangent pass per
    parameter (P = 2K[+1]); here the model's closed-form derivatives need
    only the E_i = exp(-t/tau_i) already computed for the residual:

        d r / d C_i  = E_i / sigma        (E_i - 1 when S2 = 1 - sum C)
        d r / d tau_i = C_i t / tau_i^2 * E_i / sigma
        d r / d S2   = 1 / sigma          (free-S2 rungs only)

    This is the same mathematical derivative AD produces (pinned against
    jacfwd by tests/test_lm_chol.py), so LM trajectories agree to fp
    rounding; it cuts the iteration's dominant jacfwd cost (docs/PERF.md
    round 3: ~5-6 ms/iteration at P=9, B=1e4 after the Cholesky fix)."""
    C = p[:K]
    tau = p[K : 2 * K]
    E = jnp.exp(-dt[None, :] / tau[:, None])  # (K, T)
    S2 = p[-1] if s2_free else 1.0 - jnp.sum(C)
    model = S2 + jnp.sum(C[:, None] * E, axis=0)
    r = (model - decay) / sigma
    dC = E if s2_free else E - 1.0  # (K, T)
    dtau = (C / (tau * tau))[:, None] * dt[None, :] * E  # (K, T)
    cols = [dC, dtau]
    if s2_free:
        cols.append(jnp.ones((1, dt.shape[0]), p.dtype))
    J = jnp.concatenate(cols, axis=0).T / sigma[:, None]  # (T, P)
    return r, J


class MultiExpFit(NamedTuple):
    C: jnp.ndarray  # (B, K)
    tau: jnp.ndarray  # (B, K)
    S2: jnp.ndarray  # (B,)
    dC: jnp.ndarray
    dtau: jnp.ndarray
    dS2: jnp.ndarray
    chisq: jnp.ndarray  # (B,) reference-style selection chi-square
    ok_fit: jnp.ndarray  # (B,) fit produced finite params
    ok_err: jnp.ndarray  # (B,) no dParam > param (overfitting flag)
    ok_sum: jnp.ndarray  # (B,) S2 + sum(C) <= 1


def _init_multiexp(dt, decay, K: int, s2_free: bool, n_sample: int = 10):
    """Initial guesses following initialise_for_fit_advanced
    (fitting_Ct_functions.py:359-374): log-spaced taus, equal C."""
    step = jnp.mean(dt[1:] - dt[:-1])
    taus = jnp.logspace(jnp.log10(step), jnp.log10(dt[-1] * 2.0), K + 2)[1:-1]
    avg_beg = jnp.mean(decay[:n_sample])
    avg_end = jnp.mean(decay[-n_sample:])
    Cs = jnp.full((K,), jnp.abs(avg_beg - avg_end) / K)
    S2 = avg_end if s2_free else 1.0 - jnp.mean(Cs)
    return Cs, taus, S2


def _finalise_multiexp(dt, y, sg, C, tau, S2, dC, dtau, dS2, C0, S20,
                       s2_free: bool):
    """Shared finalisation of one dense multi-exp solution — THE single
    home of the sort/selection-chisq/validity-flag logic: the DoF ladder
    (expfit.fit_ct_ladder) keys model selection on these outputs, so
    fit_multiexp and fit_multiexp_varpro must produce them identically
    or selection diverges between optimisers.

    - Sort fast-to-slow (fitting_Ct_functions.py:203-209).
    - Reference-style selection chi-square (fitting_Ct_functions.py:
      272-276): mean(sq) unweighted or mean(sq / dDecay) [sic: sigma not
      squared]; mean(sq/sg) IS mean(sq) when sg == 1 (the unweighted
      case the reference reaches via dDecay=None) — no branch needed.
    - "Fit failed" mirrors the reference's criterion — curve_fit
      raising / returning non-finite params (fitting_Ct_functions.py:
      321-325) — NOT the optimiser's convergence flag: scipy happily
      returns unconverged-but-finite fits and the reference accepts
      them, so LM convergence must not enter this flag.
    - Replicated reference quirk (fitting_Ct_functions.py:332-341): the
      sum>1 check runs BEFORE set_params_from_list, i.e. on the PRE-fit
      values — exactly 1.0 for non-S2fast rungs (S2 was just recomputed
      as 1-sum(stale C)) and the initial guesses otherwise — so
      marginally-over-1 FITTED sums are accepted and the DoF ladder
      does not stop a rung early.
    """
    order = jnp.argsort(tau)
    C, tau, dC, dtau = C[order], tau[order], dC[order], dtau[order]

    model = S2 + jnp.sum(
        C[:, None] * jnp.exp(-dt[None, :] / tau[:, None]), axis=0
    )
    chisq = jnp.mean((model - y) ** 2 / sg)

    params_vec = jnp.concatenate(
        [C, tau, jnp.atleast_1d(S2) if s2_free else jnp.zeros(0)]
    )
    perr_vec = jnp.concatenate(
        [dC, dtau, jnp.atleast_1d(dS2) if s2_free else jnp.zeros(0)]
    )
    ok_fit = jnp.all(jnp.isfinite(params_vec))
    # Non-finite uncertainties (numerically singular J^T J under the
    # Cholesky covariance) must reject like scipy's inf pcov does via
    # the dPar > Par check — NaN comparisons are False, so guard
    # explicitly.
    ok_err = ~jnp.any((perr_vec > params_vec) | ~jnp.isfinite(perr_vec))
    if s2_free:
        ok_sum = (S20 + jnp.sum(C0)) <= 1.0 + 1e-12
    else:
        ok_sum = jnp.asarray(True)
    return C, tau, S2, dC, dtau, dS2, chisq, ok_fit, ok_err, ok_sum


def _fit_one_dense(dt, y, sg, K: int, s2_free: bool, n_starts: int = 1,
                   skip=None):
    """One lane of :func:`fit_multiexp`: cold-initialised (optionally
    multi-start) bounded LM -> :func:`_finalise_multiexp` tuple.

    Factored out so the in-graph DoF-ladder walk (fit.walk) runs the
    IDENTICAL per-rung computation the per-rung dense path vmaps —
    selection parity between the two paths rests on this sharing.
    ``skip`` (traced bool) freezes the lane's while_loop from iteration
    0 (see lm_solve); the returned values are then the projected initial
    guess and must be discarded by the caller."""
    tau_max = dt[-1] * 10.0
    C0, tau0, S20 = _init_multiexp(dt, y, K, s2_free)

    def solve_from(tau_s):
        if s2_free:
            p0 = jnp.concatenate([C0, tau_s, jnp.asarray(S20)[None]])
            lo = jnp.concatenate([jnp.zeros(K), jnp.full(K, 1e-8), jnp.zeros(1)])
            hi = jnp.concatenate([jnp.ones(K), jnp.full(K, tau_max), jnp.ones(1)])
        else:
            p0 = jnp.concatenate([C0, tau_s])
            lo = jnp.concatenate([jnp.zeros(K), jnp.full(K, 1e-8)])
            hi = jnp.concatenate([jnp.ones(K), jnp.full(K, tau_max)])
        return lm_solve(
            lambda p: _multiexp_residual(p, dt, y, sg, K, s2_free), p0, lo, hi,
            cov="chol",
            residual_jac_fn=lambda p: _multiexp_res_jac(p, dt, y, sg, K, s2_free),
            skip=skip,
        )

    if n_starts > 1:
        step = jnp.mean(dt[1:] - dt[:-1])
        # Deterministic start draws, built in f64 NUMPY at trace
        # time: dtype-independent (jax.random draws differ between
        # f32 and f64, which made start quality depend on x64 mode)
        # and static under jit (n_starts and K are static args).
        u = jnp.asarray(
            np.random.default_rng(12345).uniform(size=(n_starts - 1, K)),
            dt.dtype,
        )
        lo_l, hi_l = jnp.log(step * 0.5), jnp.log(dt[-1] * 2.0)
        extra = jnp.sort(jnp.exp(lo_l + u * (hi_l - lo_l)), axis=1)
        starts = jnp.concatenate([tau0[None], extra], axis=0)
        sols = jax.vmap(solve_from)(starts)
        # argmin returns the FIRST minimal index: exact ties keep
        # the cold start (index 0) for n_starts=1 reproducibility.
        best = jnp.argmin(sols.cost)
        res = jax.tree_util.tree_map(lambda a: a[best], sols)
    else:
        res = solve_from(tau0)
    C = res.params[:K]
    tau = res.params[K : 2 * K]
    S2 = res.params[-1] if s2_free else 1.0 - jnp.sum(C)
    dC = res.perr[:K]
    dtau = res.perr[K : 2 * K]
    dS2 = res.perr[-1] if s2_free else jnp.asarray(0.0, C.dtype)
    return _finalise_multiexp(
        dt, y, sg, C, tau, S2, dC, dtau, dS2, C0, S20, s2_free
    )


def fit_multiexp(dt, decay, sigma, K: int, s2_free: bool,
                 n_starts: int = 1) -> MultiExpFit:
    """Fit a batch of decay curves with K transient components.

    dt    : (T,) shared lag times.
    decay : (B, T) target decays.
    sigma : (B, T) uncertainties (use ones for unweighted).
    Bounds follow the reference: C, S2 in [0, 1]; tau in [0, 10*t_max]
    (fitting_Ct_functions.py:412-416).

    n_starts : batched multi-start.  1 (default) reproduces the
        reference's single cold start (initialise_for_fit_advanced).
        n_starts > 1 additionally solves from n_starts-1 DETERMINISTIC
        extra tau starts (fixed-key log-uniform over
        [step/2, 2 t_max], sorted; same amplitude guesses) and keeps
        the lowest-cost solution per residue — ties go to the cold
        start, so residues where the cold LM already finds the minimum
        are bit-identical to n_starts=1.  Rationale: scipy's TRF is
        more robust than a damped box-LM on adjacent-timescale mixes
        (it escapes collapsed-component minima the cold start falls
        into); instead of replicating its Coleman-Li machinery, spend
        the TPU's batch parallelism — 8 starts recover BETTER fits
        than the reference on a 64-residue hard-mix cohort (mean
        truth-rms 6.4e-5 vs scipy 9.2e-5 vs cold 5.3e-4;
        tests/test_expfit.py multi-start cohort test).  The sum>1
        quality-gate quirk is still evaluated on the COLD initial
        guesses, exactly as the reference evaluates its own p0.
    """
    dt = jnp.asarray(dt)
    decay = jnp.asarray(decay)
    sigma = jnp.asarray(sigma)

    from .engine import fit_multiexp_engine, use_engine

    if use_engine(decay.dtype):
        # Production TPU f32 path: the fused-kernel batched engine (the
        # per-iteration H/g/cost evaluation never materialises the
        # Jacobian in HBM; ~6x per iteration at the ladder workload).
        # Semantics match to f32 rounding; CPU/f64/multi-chip keep the
        # vmapped XLA path below (byte-pinned by the parity suites).
        return fit_multiexp_engine(dt, decay, sigma, K, s2_free,
                                   n_starts=n_starts)
    return _fit_multiexp_xla(dt, decay, sigma, K, s2_free, n_starts)


@partial(jax.jit, static_argnames=("K", "s2_free", "n_starts"))
def _fit_multiexp_xla(dt, decay, sigma, K: int, s2_free: bool,
                      n_starts: int = 1) -> MultiExpFit:
    out = jax.vmap(
        lambda y, sg: _fit_one_dense(dt, y, sg, K, s2_free, n_starts)
    )(decay, sigma)
    return MultiExpFit(*out)


@partial(jax.jit, static_argnames=("K", "s2_free"))
def fit_multiexp_warm(dt, decay, sigma, C0, tau0, S20, K: int,
                      s2_free: bool) -> MultiExpFit:
    """:func:`fit_multiexp` with caller-provided PER-ROW initial
    parameters instead of the reference's cold initialiser.

    Used by the DoF ladder's warm-start retry (fit.expfit): scipy's TRF
    escapes local minima our joint LM can fall into from the cold
    log-spaced tau guess (e.g. two components collapsing onto one
    timescale while a barely-sampled fast component goes unmodelled);
    restarting the about-to-break rung from the PREVIOUS rung's accepted
    solution plus one fresh fast component recovers those fits.  All
    gates (bounds, dParam>param, the PRE-fit sum>1 quirk — evaluated on
    the provided C0/S20 exactly as the cold path evaluates its own
    guesses) are identical to fit_multiexp.

    C0 : (B, K), tau0 : (B, K), S20 : (B,).
    """
    dt = jnp.asarray(dt)
    decay = jnp.asarray(decay)
    sigma = jnp.asarray(sigma)
    C0 = jnp.asarray(C0, decay.dtype)
    tau0 = jnp.asarray(tau0, decay.dtype)
    S20 = jnp.asarray(S20, decay.dtype)
    tau_max = dt[-1] * 10.0

    def fit_one(y, sg, C0r, tau0r, S20r):
        if s2_free:
            p0 = jnp.concatenate([C0r, tau0r, S20r[None]])
            lo = jnp.concatenate([jnp.zeros(K), jnp.full(K, 1e-8), jnp.zeros(1)])
            hi = jnp.concatenate([jnp.ones(K), jnp.full(K, tau_max), jnp.ones(1)])
        else:
            p0 = jnp.concatenate([C0r, tau0r])
            lo = jnp.concatenate([jnp.zeros(K), jnp.full(K, 1e-8)])
            hi = jnp.concatenate([jnp.ones(K), jnp.full(K, tau_max)])
        res = lm_solve(
            lambda p: _multiexp_residual(p, dt, y, sg, K, s2_free), p0, lo, hi,
            cov="chol",
            residual_jac_fn=lambda p: _multiexp_res_jac(p, dt, y, sg, K, s2_free),
        )
        C = res.params[:K]
        tau = res.params[K : 2 * K]
        S2 = res.params[-1] if s2_free else 1.0 - jnp.sum(C)
        dC = res.perr[:K]
        dtau = res.perr[K : 2 * K]
        dS2 = res.perr[-1] if s2_free else jnp.asarray(0.0, C.dtype)
        return _finalise_multiexp(
            dt, y, sg, C, tau, S2, dC, dtau, dS2, C0r, S20r, s2_free
        )

    out = jax.vmap(fit_one)(decay, sigma, C0, tau0, S20)
    return MultiExpFit(*out)


@partial(jax.jit, static_argnames=("K", "s2_free", "max_iter"))
def fit_multiexp_varpro(
    dt, decay, sigma, K: int, s2_free: bool, max_iter: int = 30
) -> MultiExpFit:
    """Variable-projection fit of the K-component multi-exponential.

    OPT-IN alternative to :func:`fit_multiexp` (``fit_ct_ladder(
    optimiser="varpro")``): the model C(t) = S2 + sum C_i exp(-t/tau_i)
    is LINEAR in (C, S2), so for any tau the optimal amplitudes solve a
    (K+1)x(K+1) weighted normal system in closed form.  The outer LM then
    iterates over the K taus only.  Each varpro step is MORE expensive
    than a joint step (the normal-equation build is O(K^2 T) vs O(KT),
    and differentiating through the solve adds matmuls), but every step
    lands on the amplitude-optimal manifold, so a 10-15-iteration budget
    reaches the quality the joint solve needs ~60 iterations for —
    measured ~1.5x quality-adjusted win on CPU; see docs/PERF.md
    "VarPro ladder" (round 3).  ``max_iter`` defaults to 30 (quality at
    least the joint solve's; drop to ~15 for the speed point).

    Semantics differences from the reference's curve_fit path (why this
    is opt-in, not the default): amplitudes are solved UNconstrained
    (the reference boxes C, S2 into [0, 1]) and tau initialisation is the
    same log-spaced grid but the C/S2 start is exact rather than the
    reference's equal-split guess.  Parameter uncertainties are evaluated
    from the FULL joint Jacobian at the solution, so dC/dtau/dS2 remain
    comparable with the LM path.
    """
    dt = jnp.asarray(dt)
    decay = jnp.asarray(decay)
    sigma = jnp.asarray(sigma)
    tau_max = dt[-1] * 10.0
    n_par = 2 * K + (1 if s2_free else 0)
    _hi = jax.lax.Precision.HIGHEST

    def amplitudes(tau, y, sg):
        """Optimal (C, S2) for fixed taus: weighted linear LSQ."""
        E = jnp.exp(-dt[None, :] / tau[:, None])  # (K, T)
        if s2_free:
            A = jnp.concatenate([E, jnp.ones((1, dt.shape[0]))], axis=0)  # (K+1, T)
            tgt = y
        else:
            # S2 = 1 - sum(C)  =>  C(t) - 1 = sum C_i (e_i - 1)
            A = E - 1.0
            tgt = y - 1.0
        Aw = A / sg[None, :]
        yw = tgt / sg
        G = jnp.matmul(Aw, Aw.T, precision=_hi)
        b = jnp.matmul(Aw, yw, precision=_hi)
        # Tiny Tikhonov floor: degenerate tau pairs (tau_i == tau_j) make
        # G singular mid-iteration; the ridge keeps the solve finite
        # without measurably biasing well-posed solutions.  The floor is
        # scale-aware: an absolute 1e-10 is below one ulp of G's O(T)
        # entries in f32, which would let the Cholesky NaN on a
        # numerically singular G and freeze the lane (the old LU solve
        # returned finite garbage the next tau step could escape from).
        ridge = 1e-10 + 32.0 * jnp.finfo(G.dtype).eps * jnp.max(jnp.diag(G))
        G = G + ridge * jnp.eye(G.shape[0], dtype=G.dtype)
        coef = _chol_solve_small(G, b)
        C = coef[:K]
        S2 = coef[-1] if s2_free else 1.0 - jnp.sum(C)
        return C, S2

    def fit_one(y, sg):
        C0, tau0, S20 = _init_multiexp(dt, y, K, s2_free)

        def residual(tau):
            C, S2 = amplitudes(tau, y, sg)
            model = S2 + jnp.sum(
                C[:, None] * jnp.exp(-dt[None, :] / tau[:, None]), axis=0
            )
            return (model - y) / sg

        res = lm_solve(
            residual,
            tau0,
            jnp.full(K, 1e-8),
            jnp.full(K, tau_max),
            max_iter=max_iter,
        )
        tau = res.params
        C, S2 = amplitudes(tau, y, sg)

        # Joint-space uncertainties (same cov construction as lm_solve's
        # tail): J over the FULL (C, tau[, S2]) vector at the solution.
        if s2_free:
            p_full = jnp.concatenate([C, tau, jnp.atleast_1d(S2)])
        else:
            p_full = jnp.concatenate([C, tau])
        r_fin, Jp = _multiexp_res_jac(p_full, dt, y, sg, K, s2_free)
        H = jnp.matmul(Jp.T, Jp, precision=_hi)
        dof = jnp.maximum(r_fin.shape[0] - n_par, 1)
        var = _spd_inv_diag_small(H) * (jnp.sum(r_fin * r_fin) / dof)
        perr = jnp.sqrt(jnp.clip(var, 0.0))
        dC = perr[:K]
        dtau = perr[K : 2 * K]
        dS2 = perr[-1] if s2_free else jnp.asarray(0.0, C.dtype)
        return _finalise_multiexp(
            dt, y, sg, C, tau, S2, dC, dtau, dS2, C0, S20, s2_free
        )

    out = jax.vmap(fit_one)(decay, sigma)
    return MultiExpFit(*out)


@partial(jax.jit, static_argnames=("specs", "Kmax"))
def fit_multiexp_ladder(dt, decays, sigma, tau0_rows, specs, Kmax: int) -> MultiExpFit:
    """All ladder rungs over one (B, T) batch in ONE jit, with the
    rung-tiling done IN-GRAPH: the host ships decays/sigma once (not
    once per rung copy — through a remote-TPU link the 5x host tile was
    the dominant cost of the stacked ladder).

    specs : static tuple of (K, s2_free) per rung.
    tau0_rows : (R, Kmax) per-rung initial taus.
    Returns the stacked MultiExpFit with batch R*B (rung-major).
    """
    R = len(specs)
    B = decays.shape[0]
    dec_t = jnp.tile(decays, (R, 1))
    sig_t = jnp.tile(sigma, (R, 1))
    Kv = jnp.repeat(jnp.asarray([k for k, _ in specs]), B)
    s2 = jnp.repeat(jnp.asarray([s for _, s in specs]), B)
    t0 = jnp.repeat(jnp.asarray(tau0_rows), B, axis=0)
    return _fit_multiexp_stacked_core(dt, dec_t, sig_t, Kv, s2, t0, Kmax)


@partial(jax.jit, static_argnames=("Kmax",))
def fit_multiexp_stacked(dt, decay, sigma, Kvals, s2free, tau0, Kmax: int) -> MultiExpFit:
    """One batched LM over a HETEROGENEOUS batch of multi-exp problems.

    Every element may have its own component count K <= Kmax and its own
    S2-free flag — this is what lets ALL rungs of the reference's DoF
    ladder (fitting_Ct_functions.py:278-304) solve as ONE padded LM batch
    (one dispatch, one compile) instead of one ``fit_multiexp`` call per
    rung.  Inactive components are frozen by masking: their residual
    Jacobian columns are exactly zero, so the LM step never moves them and
    their uncertainties pinv to zero — the active sub-problem's trajectory
    is identical (in exact arithmetic) to the dense per-rung solve.

    dt     : (T,) shared lag times.
    decay  : (B, T) target decays (rungs already tiled into B).
    sigma  : (B, T) uncertainties.
    Kvals  : (B,) per-element component count (traced).
    s2free : (B,) per-element bool: S2 is a free parameter vs 1-sum(C).
    tau0   : (B, Kmax) per-element initial taus (host-precomputed
             log-spaced grid per rung, padding arbitrary positive).

    Returns MultiExpFit with (B, Kmax) component arrays; for an element
    with K components the ACTIVE ones occupy [:K] (fast-to-slow), padding
    is zero-C / inf-sorted-last.
    """
    return _fit_multiexp_stacked_core(dt, decay, sigma, Kvals, s2free,
                                      tau0, Kmax)


def _fit_multiexp_stacked_core(dt, decay, sigma, Kvals, s2free, tau0,
                               Kmax: int) -> MultiExpFit:
    dt = jnp.asarray(dt)
    decay = jnp.asarray(decay)
    sigma = jnp.asarray(sigma)
    tau_max = dt[-1] * 10.0
    P = 2 * Kmax + 1
    n_sample = 10
    karange = jnp.arange(Kmax)

    def fit_one(y, sg, K, s2f, t0):
        mask = (karange < K).astype(y.dtype)
        # initialise_for_fit_advanced semantics (fitting_Ct_functions.py:
        # 359-374), identical to _init_multiexp on the active slots.
        avg_beg = jnp.mean(y[:n_sample])
        avg_end = jnp.mean(y[-n_sample:])
        c0 = jnp.abs(avg_beg - avg_end) / K
        C0 = jnp.where(mask > 0, c0, 0.5)
        S20 = jnp.where(s2f, avg_end, 1.0 - c0)
        t0p = jnp.where(mask > 0, t0, dt[-1])
        p0 = jnp.concatenate([C0, t0p, S20[None]])
        lo = jnp.concatenate([jnp.zeros(Kmax), jnp.full(Kmax, 1e-8), jnp.zeros(1)])
        hi = jnp.concatenate([jnp.ones(Kmax), jnp.full(Kmax, tau_max), jnp.ones(1)])

        def residual(p):
            C = p[:Kmax] * mask
            tau = p[Kmax : 2 * Kmax]
            S2 = jnp.where(s2f, p[-1], 1.0 - jnp.sum(C))
            model = S2 + jnp.sum(
                C[:, None] * jnp.exp(-dt[None, :] / tau[:, None]), axis=0
            )
            return (model - y) / sg

        def res_jac(p):
            # Masked analytic counterpart of _multiexp_res_jac: inactive
            # components keep exactly-zero Jacobian columns (C column via
            # mask, tau column via C_i = 0), which is what freezes them.
            C = p[:Kmax] * mask
            tau = p[Kmax : 2 * Kmax]
            E = jnp.exp(-dt[None, :] / tau[:, None])  # (Kmax, T)
            S2 = jnp.where(s2f, p[-1], 1.0 - jnp.sum(C))
            model = S2 + jnp.sum(C[:, None] * E, axis=0)
            r = (model - y) / sg
            dC = mask[:, None] * jnp.where(s2f, E, E - 1.0)
            dtau = (C / (tau * tau))[:, None] * dt[None, :] * E
            dS2 = jnp.where(s2f, 1.0, 0.0) * jnp.ones((1, dt.shape[0]), p.dtype)
            J = jnp.concatenate([dC, dtau, dS2], axis=0).T / sg[:, None]
            return r, J

        n_eff = 2 * K + jnp.where(s2f, 1, 0)
        res = lm_solve(residual, p0, lo, hi, n_par_eff=n_eff,
                       residual_jac_fn=res_jac)
        C = res.params[:Kmax] * mask
        tau = res.params[Kmax : 2 * Kmax]
        S2 = jnp.where(s2f, res.params[-1], 1.0 - jnp.sum(C))
        dC = res.perr[:Kmax]
        dtau = res.perr[Kmax : 2 * Kmax]
        dS2 = jnp.where(s2f, res.perr[-1], 0.0)
        # Sort fast-to-slow with padding last, so [:K] are the active
        # components (fitting_Ct_functions.py:203-209).
        order = jnp.argsort(jnp.where(mask > 0, tau, jnp.inf))
        C, tau, dC, dtau, mask_s = (
            C[order], tau[order], dC[order], dtau[order], mask[order]
        )

        model = S2 + jnp.sum(
            (C * mask_s)[:, None] * jnp.exp(-dt[None, :] / tau[:, None]), axis=0
        )
        chisq = jnp.mean((model - y) ** 2 / sg)

        # Validity flags over ACTIVE parameters only, matching the dense
        # per-rung vectors (see fit_multiexp for the reference quirks).
        act = jnp.concatenate([mask_s, mask_s, jnp.where(s2f, 1.0, 0.0)[None]])
        params_vec = jnp.concatenate([C, tau, jnp.atleast_1d(S2)])
        perr_vec = jnp.concatenate([dC, dtau, jnp.atleast_1d(dS2)])
        ok_fit = jnp.all(jnp.isfinite(params_vec) | (act == 0))
        ok_err = ~jnp.any((perr_vec > params_vec) & (act > 0))
        ok_sum = jnp.where(s2f, (S20 + jnp.sum(C0 * mask)) <= 1.0 + 1e-12, True)
        return C, tau, S2, dC, dtau, dS2, chisq, ok_fit, ok_err, ok_sum

    out = jax.vmap(fit_one)(decay, sigma, jnp.asarray(Kvals),
                            jnp.asarray(s2free), jnp.asarray(tau0))
    return MultiExpFit(*out)

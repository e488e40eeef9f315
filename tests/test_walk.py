"""In-graph DoF-ladder walk (fit.walk) vs the per-rung host walk.

The walk is the production default (in_graph="auto"); these tests pin
byte-level selection/value parity against the host path across the flag
surface, the fallback semantics, and the escalation delegation."""

import numpy as np
import pytest

from spinrelax_tpu.fit.expfit import fit_ct_ladder

FIELDS = ("S2", "C", "tau", "mask", "chisq", "dS2", "dC", "dtau", "s2fast")


def _assert_same(a, b, fields=FIELDS):
    for fld in fields:
        va, vb = np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld))
        assert va.shape == vb.shape, (fld, va.shape, vb.shape)
        np.testing.assert_array_equal(va, vb, err_msg=fld)


def _hetero(rng, B=96, T=400, noise=2e-3):
    dt = np.arange(1, T + 1, dtype=float)
    y = np.empty((B, T))
    for b in range(B):
        k = b % 3 + 1
        S2 = rng.uniform(0.5, 0.9)
        C = rng.uniform(0.03, 0.15, k)
        C *= (1 - S2) / max(C.sum(), 1e-9) * rng.uniform(0.5, 1.0)
        tau = np.sort(rng.uniform(3, 600, k))
        y[b] = S2 + (C[:, None] * np.exp(-dt / tau[:, None])).sum(0)
    y += rng.normal(scale=noise, size=y.shape)
    return dt, y, np.full_like(y, noise)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(weighted=True),
    dict(weighted=True, use_s2fast=False),
    dict(weighted=True, n_starts=4),
    dict(warm_retry=False, retry_starts=1),
    dict(weighted=True, chisq_threshold=0.9),
    dict(weighted=True, n_components=2),
])
def test_walk_matches_host_walk(rng, kw):
    """Selection AND fitted values byte-identical between the one-dispatch
    in-graph walk and the per-rung host walk, across the flag surface.
    (The per-rung math is the shared _fit_one_dense lane function, so
    equality is exact, not just close.)"""
    kw = dict(kw)
    weighted = kw.pop("weighted", False)
    dt, y, dy = _hetero(rng)
    names = [str(i) for i in range(y.shape[0])]
    dd = dy if weighted else None
    host = fit_ct_ladder(names, dt, y, dd, in_graph=False, **kw)
    walk = fit_ct_ladder(names, dt, y, dd, in_graph=True, **kw)
    _assert_same(host, walk)


def test_walk_is_the_default():
    """in_graph='auto' routes the lm/non-stacked ladder through the walk
    (guard: the flag actually defaults on)."""
    import spinrelax_tpu.fit.expfit as expfit

    called = {}
    orig = expfit._ladder_via_walk

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    expfit._ladder_via_walk = spy
    try:
        rng = np.random.default_rng(0)
        dt, y, _ = _hetero(rng, B=8, T=100)
        fit_ct_ladder([str(i) for i in range(8)], dt, y)
    finally:
        expfit._ladder_via_walk = orig
    assert called.get("yes")


def test_walk_fallback_rows(rng):
    """Rows where no rung passes the checks keep the best-chisq rung
    (host nanargmin semantics) in both paths."""
    dt = np.arange(1, 201, dtype=float)
    # Pathological rows: pure noise around 0 (S2+sum(C) gates and
    # dPar>par checks fail everywhere) mixed with clean rows.
    B = 24
    y = np.empty((B, 200))
    for b in range(B):
        if b % 3 == 0:
            y[b] = rng.normal(scale=0.5, size=200)
        else:
            y[b] = 0.8 + 0.15 * np.exp(-dt / 50.0) \
                + rng.normal(scale=1e-3, size=200)
    names = [str(i) for i in range(B)]
    host = fit_ct_ladder(names, dt, y, in_graph=False)
    walk = fit_ct_ladder(names, dt, y, in_graph=True)
    _assert_same(host, walk)


def test_walk_delegation_fires_and_matches(rng):
    """A cohort engineered to quality-fail at a deep rung on a FEW rows
    (within the isolated-rows cap): the walk must flag them, delegate
    the host re-walk, and still match the pure host path byte-for-byte
    (warm-retry + multi-start escalation semantics preserved)."""
    dt, y, dy = _hetero(rng, B=64)
    # Adjacent-timescale hard rows (the warm-retry trigger cohort):
    for b in range(0, 8):
        S2 = 0.7
        y[b] = (S2 + 0.1 * np.exp(-dt / 8.0) + 0.08 * np.exp(-dt / 14.0)
                + 0.12 * np.exp(-dt / 300.0))
        y[b] += rng.normal(scale=1e-3, size=y.shape[1])
        dy[b] = 1e-3
    names = [str(i) for i in range(y.shape[0])]
    host = fit_ct_ladder(names, dt, y, dy, in_graph=False)
    walk = fit_ct_ladder(names, dt, y, dy, in_graph=True)
    _assert_same(host, walk)


def test_walk_sharded_matches_single(rng):
    """The walk program under an 8-device mesh equals the unsharded walk
    (residue-sharded GSPMD).  Selection and fitted values are exact;
    the covariance-tail uncertainties may differ at the last ulp (the
    per-shard batched matmul in the J^T J tail fuses differently at
    B/8 rows per device), so d* fields get a 1e-10 relative band."""
    import jax
    from spinrelax_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dt, y, dy = _hetero(rng, B=48)
    names = [str(i) for i in range(y.shape[0])]
    mesh = make_mesh(8)
    plain = fit_ct_ladder(names, dt, y, dy, in_graph=True)
    shard = fit_ct_ladder(names, dt, y, dy, in_graph=True, mesh=mesh)
    _assert_same(plain, shard,
                 fields=("S2", "C", "tau", "mask", "chisq", "s2fast"))
    for fld in ("dS2", "dC", "dtau"):
        np.testing.assert_allclose(
            np.asarray(getattr(plain, fld)), np.asarray(getattr(shard, fld)),
            rtol=1e-10, atol=1e-14, err_msg=fld,
        )


def test_walk_rejects_bad_combos():
    with pytest.raises(ValueError, match="in_graph=True"):
        fit_ct_ladder(["0"], np.arange(1, 9, dtype=float),
                      np.ones((1, 8)), in_graph=True, optimiser="varpro")

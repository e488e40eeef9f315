"""Statistical helpers (weighted averages, error pooling) as pure JAX.

Replaces ``general_maths.py:57-110`` and the ANOVA-style replica pooling
used by ``calculate-fitted-Ct.py:113-147``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_sqrt(var):
    """sqrt with a finite gradient at 0: jnp.sqrt's derivative is inf/NaN
    at var == 0 (a zero-variance ensemble — e.g. duplicated vectors —
    would NaN-poison any jacobian through the error bars)."""
    safe = jnp.where(var > 0, var, 1.0)
    return jnp.where(var > 0, jnp.sqrt(safe), 0.0)


def weighted_mean_std(values, weights=None, axis=-1):
    """Weighted mean and population-style weighted stdev along ``axis``
    (general_maths.py:100-110).  ``weights=None`` gives the plain
    mean / std pair."""
    values = jnp.asarray(values)
    if weights is None:
        avg = jnp.mean(values, axis=axis)
        var = jnp.mean(
            (values - jnp.expand_dims(avg, axis)) ** 2, axis=axis
        )
        return avg, _safe_sqrt(var)
    weights = jnp.asarray(weights)
    wsum = jnp.sum(weights, axis=axis)
    safe = jnp.where(wsum > 0, wsum, 1.0)
    avg = jnp.sum(values * weights, axis=axis) / safe
    var = jnp.sum((values - jnp.expand_dims(avg, axis)) ** 2 * weights, axis=axis) / safe
    return avg, _safe_sqrt(var)


def simple_total_mean_square(means, sigmas, axis=0):
    """Pooled mean-square across equally-sized samples
    (general_maths.py:89-98): (GSS + ESS) / copies."""
    means = jnp.asarray(means)
    sigmas = jnp.asarray(sigmas)
    copies = means.shape[axis]
    grand = jnp.mean(means, axis=axis, keepdims=True)
    gss = jnp.sum((means - grand) ** 2, axis=axis)
    ess = jnp.sum(sigmas**2, axis=axis)
    return (gss + ess) / copies


def anova_total_mean_square(Ns, means, sigmas):
    """ANOVA pooling with unequal sample sizes (general_maths.py:75-87,
    implementing its *intended* composite-stdev formula: the reference's
    grand_mean drops a sum; here grand_mean = sum(N*mean)/sum(N))."""
    Ns = jnp.asarray(Ns, dtype=means.dtype if hasattr(means, "dtype") else None)
    means = jnp.asarray(means)
    sigmas = jnp.asarray(sigmas)
    grand_total = jnp.sum(Ns)
    grand_mean = jnp.sum(Ns * means) / grand_total
    gss = jnp.sum(Ns * (means - grand_mean) ** 2)
    ess = jnp.sum((Ns - 1) * sigmas**2)
    return (gss + ess) / (grand_total - 1)


def central_moments(x, y, symmetric: bool = False):
    """First four central moments of a weighted 1D distribution
    (general_maths.py:57-73)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    ctot = jnp.sum(y)
    if symmetric:
        mu2 = jnp.sum(y * x**2) / ctot
        mu4 = jnp.sum(y * x**4) / ctot
        return jnp.stack([jnp.zeros_like(mu2), mu2, jnp.zeros_like(mu2), mu4])
    ex1 = jnp.sum(y * x) / ctot
    ex2 = jnp.sum(y * x**2) / ctot
    ex3 = jnp.sum(y * x**3) / ctot
    ex4 = jnp.sum(y * x**4) / ctot
    return jnp.stack(
        [
            ex1,
            ex2 - ex1**2,
            ex3 - 3 * ex1 * ex2 + 2 * ex1**3,
            ex4 - 4 * ex1 * ex3 + 6 * ex1**2 * ex2 - 3 * ex1**4,
        ]
    )

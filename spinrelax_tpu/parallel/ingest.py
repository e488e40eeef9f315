"""Multi-host ingest skeleton (ARCHITECTURE.md "Multi-host ingest").

Trajectories larger than one host's disk/RAM bandwidth shard by REPLICA
(Palmer chunk group) — chunk groups are statistically independent, so
hosts never exchange frame data.  Each host streams only its local
replica slice into fixed-size running sums; the ONLY cross-host traffic
is one reduction of those accumulators at finalisation (a few MB over
DCN once per run).

Because this container has a single host, hosts are *simulated*: each
"host" owns a disjoint chunk iterator and produces a :class:`CtPartial`.
The pooled statistics are exactly associative under (sum, sumsq, count)
addition — the same property a real multi-host deployment relies on —
and the reduction is ALSO expressed as a jax collective
(:func:`reduce_partials_collective`: partials laid out on the "rep" mesh
axis, one ``psum``), which is byte-for-byte the program a multi-host
mesh would run over DCN.

Reference scope note: the reference has no distributed computing at all
(SURVEY §2.5) — its closest analogue is multi-replica file aggregation
(calculate-fitted-Ct.py:113-147).
"""

from __future__ import annotations

from typing import Iterable, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import autocorr

# jitted psum collectives, keyed on the mesh (see reduce_partials_collective)
_REDUCE_CACHE: dict = {}


class CtPartial(NamedTuple):
    """One host's streamed contribution: per-(residue, lag) running sums.

    acc_s/acc_s2 : (nRes, nDeltas) sum and sum-of-squares of the SHIFTED
                   per-chunk lag means (e = per - 1; the
                   palmer_pooled_stats convention); count: () chunks
                   ingested.
    """

    acc_s: np.ndarray
    acc_s2: np.ndarray
    count: np.ndarray


def host_stream(chunk_iter: Iterable, n_frames_per_chunk: int) -> CtPartial:
    """Run one (simulated) host's ingest loop: stream local Palmer-chunk
    groups through the device, return the accumulator triple.

    Delegates to autocorr.stream_accumulate — the SAME loop
    ct_palmer_streamed runs, so the single-host and multi-host paths
    cannot drift apart; on a real multi-host deployment this is the
    per-process loop feeding the local mesh slice via
    jax.make_array_from_process_local_data."""
    try:
        acc_s, acc_s2, count = autocorr.stream_accumulate(
            chunk_iter, n_frames_per_chunk
        )
    except ValueError as e:
        if "empty chunk iterator" in str(e):
            raise ValueError("host ingested no chunks") from None
        raise
    return CtPartial(
        np.asarray(acc_s), np.asarray(acc_s2), np.asarray(float(count))
    )


def _pooled_stats(acc_s, acc_s2, count):
    mean, dct = autocorr.palmer_pooled_stats(
        jnp.asarray(acc_s), jnp.asarray(acc_s2), count
    )
    return np.asarray(mean).T, np.asarray(dct).T


def reduce_partials(partials: Sequence[CtPartial]):
    """Host-side tree reduction of per-host partials -> (Ct, dCt).

    (sum, sumsq, count) addition is associative and weight-correct: a
    host that ingested fewer chunks (truncated file, slow disk)
    contributes exactly its share."""
    acc_s = np.sum([p.acc_s for p in partials], axis=0)
    acc_s2 = np.sum([p.acc_s2 for p in partials], axis=0)
    count = float(np.sum([p.count for p in partials]))
    return _pooled_stats(acc_s, acc_s2, count)


def reduce_partials_collective(partials: Sequence[CtPartial], mesh: Mesh):
    """The same reduction expressed as the jax collective a multi-host
    mesh would execute: per-host partials laid out along the "rep" axis,
    ONE psum over "rep" (the DCN hop), result replicated.

    len(partials) must equal the "rep" axis size (one partial per host
    row; a real deployment gets this layout for free from
    process-local data placement)."""
    ax = dict(zip(mesh.axis_names, mesh.devices.shape))
    if len(partials) != ax["rep"]:
        raise ValueError(
            f"need one partial per 'rep' row: {len(partials)} partials "
            f"vs rep={ax['rep']}"
        )
    stacked_s = jnp.stack([jnp.asarray(p.acc_s) for p in partials])
    stacked_s2 = jnp.stack([jnp.asarray(p.acc_s2) for p in partials])
    counts = jnp.asarray([float(p.count) for p in partials])

    def reduce_local(s, s2, c):
        # s: (1, nRes, nDeltas) local slice on each rep row.
        return (
            jax.lax.psum(jnp.sum(s, axis=0), "rep"),
            jax.lax.psum(jnp.sum(s2, axis=0), "rep"),
            jax.lax.psum(jnp.sum(c), "rep"),
        )

    # Cache the jitted collective per (mesh): jax.jit keys its trace
    # cache on the WRAPPER object, so a fresh shard_map+jit per call
    # would re-pay the full remote-AOT compile on every pooling (the
    # same pattern parallel/streamed._JIT_CACHE documents).  jit's own
    # cache then specialises per input shape.
    key = ("ingest_reduce", mesh)
    jitted = _REDUCE_CACHE.get(key)
    if jitted is None:
        mapped = shard_map(
            reduce_local,
            mesh=mesh,
            in_specs=(P("rep"), P("rep"), P("rep")),
            out_specs=(P(), P(), P()),
        )
        jitted = _REDUCE_CACHE[key] = jax.jit(mapped)
    acc_s, acc_s2, count = jitted(stacked_s, stacked_s2, counts)
    return _pooled_stats(np.asarray(acc_s), np.asarray(acc_s2), float(count))

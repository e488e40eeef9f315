"""Regression tests for the round-3 fourth-review findings batch.

Each test pins one fixed behaviour:
- iter_colvar_chunks refuses multi-replica files (silent replica mixing);
- manifest params survive non-string keys + writes are atomic;
- load_trajectory/.npy and iter_trajectory timestep contracts;
- read_pdb fails clearly on empty / inhomogeneous-MODEL files;
- bond_indices repair is keyed on (chain, resSeq), not resSeq alone;
- lambert_histogram counts are integer (no f32 2^24 saturation);
- bond_vectors' rotate-only-differences fast path equals the full
  superpose computation.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from spinrelax_tpu.core import quaternion as qt
from spinrelax_tpu.core.geometry import lambert_histogram
from spinrelax_tpu.io import colvar, trajectory
from spinrelax_tpu.io.pdb import Topology, bond_indices, read_pdb, write_pdb
from spinrelax_tpu.ops import orient
from spinrelax_tpu.pipeline.manifest import record_stage, stage_is_current


def test_iter_colvar_chunks_rejects_multireplica(tmp_path):
    fn = str(tmp_path / "multi.colvar")
    with open(fn, "w") as fp:
        fp.write("#! FIELDS time q.w\n0.0 1.0\n1.0 0.9\n")
        fp.write("#! FIELDS time q.w\n0.0 1.0\n1.0 0.8\n")
    with pytest.raises(ValueError, match="repeated FIELDS"):
        for _ in colvar.iter_colvar_chunks(fn, chunk_frames=64):
            pass
    # Single-replica files stream fine.
    fn1 = str(tmp_path / "one.colvar")
    with open(fn1, "w") as fp:
        fp.write("#! FIELDS time q.w\n")
        for i in range(5):
            fp.write(f"{i}.0 1.0\n")
    chunks = list(colvar.iter_colvar_chunks(fn1, chunk_frames=2))
    assert sum(c.shape[0] for _, c in chunks) == 5


def test_manifest_nonstring_keys_stable(tmp_path):
    inp = tmp_path / "in.dat"
    inp.write_text("x")
    pref = str(tmp_path / "run")
    out = tmp_path / "out.dat"
    out.write_text("y")
    params = {1: "a", (2, 3): [4, 5]}
    record_stage(pref, "s", [str(inp)], params=params)
    # Same params must compare current forever (not a permanent miss).
    assert stage_is_current(pref, "s", [str(inp)], [str(out)], params=params)
    assert not stage_is_current(
        pref, "s", [str(inp)], [str(out)], params={1: "b", (2, 3): [4, 5]}
    )


def test_manifest_write_is_atomic(tmp_path):
    inp = tmp_path / "in.dat"
    inp.write_text("x")
    pref = str(tmp_path / "run")
    record_stage(pref, "s", [str(inp)], params={"k": 1})
    # No temp file left behind; manifest parses.
    assert not os.path.exists(pref + ".manifest.json.tmp")
    import json

    with open(pref + ".manifest.json") as fp:
        json.load(fp)


def test_load_trajectory_npy(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(4, 3, 3))
    fn = str(tmp_path / "t.npy")
    np.save(fn, xyz)
    got, dt = trajectory.load_trajectory(fn)
    np.testing.assert_array_equal(got, xyz)
    assert dt == 1.0


def test_iter_trajectory_npz_timestep_contract(tmp_path):
    xyz = np.zeros((6, 2, 3))
    # npz WITHOUT time info: explicit timestep param wins.
    fn = str(tmp_path / "no_time.npz")
    np.savez(fn, xyz=xyz)
    chunks = list(trajectory.iter_trajectory(fn, 4, timestep=2.5))
    assert all(dt == 2.5 for _, dt in chunks)
    # npz WITH a time axis: the file wins.
    fn2 = str(tmp_path / "with_time.npz")
    np.savez(fn2, xyz=xyz, time=np.arange(6) * 0.5)
    chunks = list(trajectory.iter_trajectory(fn2, 4, timestep=2.5))
    assert all(dt == 0.5 for _, dt in chunks)


def test_read_pdb_empty_and_inhomogeneous(tmp_path):
    empty = tmp_path / "empty.pdb"
    empty.write_text("REMARK nothing here\nEND\n")
    with pytest.raises(ValueError, match="no ATOM records"):
        read_pdb(str(empty))

    bad = tmp_path / "bad.pdb"
    bad.write_text(
        "MODEL     1\n"
        "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00           N\n"
        "ATOM      2  H   ALA A   1       1.000   0.000   0.000  1.00  0.00           H\n"
        "ENDMDL\n"
        "MODEL     2\n"
        "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00           N\n"
        "ENDMDL\n"
    )
    with pytest.raises(ValueError, match="inconsistent atom counts"):
        read_pdb(str(bad))


def _two_chain_top():
    """Chains A and B both number their residues 1..2; chain B residue 1
    is a PRO (no H-N pair)."""
    names, seqs, rnames, chains = [], [], [], []
    for ch, resn_by_seq in (("A", {1: "ALA", 2: "GLY"}), ("B", {1: "PRO", 2: "ALA"})):
        for seq, resn in resn_by_seq.items():
            for at in ("N", "H"):
                if resn == "PRO" and at == "H":
                    continue
                names.append(at)
                seqs.append(seq)
                rnames.append(resn)
                chains.append(ch)
    n = len(names)
    return Topology(
        atom_names=names,
        res_seqs=np.array(seqs),
        res_names=rnames,
        chain_ids=chains,
        occupancies=np.ones(n),
        elements=[a[0] for a in names],
    )


def test_bond_indices_repair_keys_on_chain(tmp_path):
    top = _two_chain_top()
    idx_h, idx_x, res = bond_indices(top, "name H", "name N and not resname PRO")
    # Chain B residue 1 is PRO: its N is excluded, and no H exists for it
    # either — the repair must drop that residue in BOTH chains' keyspace
    # without pairing chain-A atoms against chain-B atoms.
    assert len(idx_h) == len(idx_x) == 3
    chains = np.asarray(top.chain_ids)
    np.testing.assert_array_equal(chains[idx_h], chains[idx_x])
    np.testing.assert_array_equal(top.res_seqs[idx_h], top.res_seqs[idx_x])
    for h, x in zip(idx_h, idx_x):
        assert top.atom_names[h] == "H" and top.atom_names[x] == "N"


def test_lambert_histogram_integer_counts():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(2, 500, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    hist, ep, ec = lambert_histogram(jnp.asarray(v, dtype=jnp.float32), 24, 12)
    assert jnp.issubdtype(hist.dtype, jnp.integer)
    np.testing.assert_array_equal(np.asarray(hist).sum(axis=(-2, -1)), 500)


def test_bond_vectors_fast_path_matches_superpose(rng=np.random.default_rng(11)):
    """Rotating only the bond differences must equal differencing the
    fully superposed frames (rotation is linear; translation cancels)."""
    n_at = 24
    ref = rng.normal(size=(n_at, 3))
    ref -= ref.mean(axis=0)
    frames = []
    for _ in range(6):
        ax = rng.normal(size=3)
        ax /= np.linalg.norm(ax)
        ang = rng.uniform(0, np.pi)
        q = np.concatenate([[np.cos(ang / 2)], ax * np.sin(ang / 2)])
        frames.append(
            np.asarray(qt.rotate_vector(jnp.asarray(ref), jnp.asarray(q)))
            + rng.normal(size=3)  # translation
            + 0.01 * rng.normal(size=(n_at, 3))  # internal motion
        )
    frames = np.stack(frames)
    idx_h = np.arange(0, 12, 2)
    idx_x = np.arange(1, 13, 2)
    w = rng.uniform(0.5, 1.5, size=n_at)

    bv = orient.bond_vectors(
        frames, ref, jnp.asarray(idx_h), jnp.asarray(idx_x), jnp.asarray(w)
    )
    fitted_frames = np.asarray(orient.superpose(frames, ref, jnp.asarray(w)))
    expect = fitted_frames[:, idx_h, :] - fitted_frames[:, idx_x, :]
    expect /= np.linalg.norm(expect, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(bv.fitted), expect, atol=1e-6)

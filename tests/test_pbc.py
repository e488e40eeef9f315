"""PBC repair (unwrap, cluster pipeline) and the D_iso correction."""

import numpy as np

from spinrelax_tpu.io.pdb import Topology
from spinrelax_tpu.ops.pbc import (
    center_solute,
    minimum_image_distance,
    molecule_ids,
    solute_mask,
    unwrap_and_center,
)
from spinrelax_tpu.pipeline.corrections import convert_diso, water_viscosity


def test_unwrap_split_molecule(rng):
    box = np.array([5.0, 5.0, 5.0])
    # A compact molecule near the box edge, with some atoms wrapped.
    mol = rng.normal(scale=0.3, size=(20, 3)) + np.array([4.9, 2.5, 2.5])
    wrapped = np.mod(mol, box)
    out = np.asarray(unwrap_and_center(wrapped[None], box))[0]
    # After unwrap+centre the coordinates match the original up to a
    # rigid translation.
    mol_centered = mol - mol.mean(axis=0)
    np.testing.assert_allclose(out, mol_centered, atol=1e-6)


def test_unwrap_noop_for_whole_molecule(rng):
    box = np.array([10.0, 10.0, 10.0])
    mol = rng.normal(scale=0.5, size=(3, 15, 3)) + 5.0
    out = np.asarray(unwrap_and_center(mol, box))
    want = mol - mol.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_minimum_image():
    box = np.array([4.0, 4.0, 4.0])
    a = np.array([3.9, 0.0, 0.0])
    b = np.array([0.1, 0.0, 0.0])
    d = np.asarray(minimum_image_distance(a, b, box))
    np.testing.assert_allclose(d, [-0.2, 0.0, 0.0], atol=1e-12)


def _dimer_system(rng):
    """Two protein chains (a dimer) + waters + an ion in a 6 nm box.

    Returns (top, xyz_true (nAtoms, 3) whole/clustered, box).  Chain B
    sits 1.5 nm from chain A, so the clustered dimer spans < half box.
    """
    box = np.array([6.0, 6.0, 6.0])
    chain_a = np.cumsum(rng.normal(scale=0.08, size=(30, 3)), axis=0)
    chain_b = chain_a[::-1] + np.array([1.5, 0.2, -0.1])
    waters = []
    for k in range(40):
        o = rng.uniform(0, 6.0, size=3)
        waters.append(np.stack([o, o + [0.08, 0.02, 0], o + [0, 0.08, 0.02]]))
    ion = rng.uniform(0, 6.0, size=(1, 3))
    xyz = np.concatenate([chain_a, chain_b] + waters + [ion], axis=0)
    names = (
        ["CA"] * 60
        + [n for _ in range(40) for n in ("OW", "HW1", "HW2")]
        + ["NA"]
    )
    resn = (
        ["ALA"] * 60 + [r for _ in range(40) for r in ("SOL",) * 3] + ["NA"]
    )
    res_seqs = np.concatenate(
        [
            np.repeat(np.arange(1, 31), 1),
            np.repeat(np.arange(1, 31), 1),
            np.repeat(np.arange(100, 140), 3),
            [500],
        ]
    )
    chains = ["A"] * 30 + ["B"] * 30 + ["W"] * 120 + ["I"]
    top = Topology(
        atom_names=names,
        res_seqs=res_seqs,
        res_names=resn,
        chain_ids=chains,
        occupancies=np.ones(len(names)),
        elements=[""] * len(names),
    )
    return top, xyz, box


def test_molecule_inference():
    rng = np.random.default_rng(3)
    top, _, _ = _dimer_system(rng)
    mol = molecule_ids(top)
    # chain A, chain B, 40 waters, 1 ion = 43 molecules.
    assert mol.max() + 1 == 43
    assert len(np.unique(mol[:30])) == 1 and len(np.unique(mol[30:60])) == 1
    sol = solute_mask(top)
    assert sol[:60].all() and not sol[60:].any()


def test_center_solute_pipeline():
    """Native 3-stage repair (center-solute-gromacs.bash:70-80): scatter a
    dimer system across periodic images, then check every molecule is
    whole, the dimer is clustered (chain B's nearest image relation holds
    WITHOUT wrapping), the solute is centred, and all molecules are
    compact around the box centre."""
    rng = np.random.default_rng(7)
    top, xyz_true, box = _dimer_system(rng)
    mol = molecule_ids(top)
    # Break it: wrap atoms into the primary cell (splits molecules) after
    # shifting chain B by a whole box (splits the cluster).
    broken = xyz_true.copy()
    broken[30:60] += box * np.array([1.0, -1.0, 0.0])
    broken = np.mod(broken, box)
    frames = np.stack([broken, broken + 0.0])  # 2 identical frames
    out = center_solute(frames, box, top=top)
    assert out.shape == frames.shape
    x = out[0]
    # (1) every molecule whole: intra-molecule deltas need no wrapping.
    for m in range(mol.max() + 1):
        idx = np.where(mol == m)[0]
        d = x[idx] - x[idx[0]]
        np.testing.assert_allclose(
            d, np.asarray(minimum_image_distance(x[idx], x[idx[0]], box)),
            atol=1e-5,
        )
    # (2) cluster: the dimer geometry matches the true (unwrapped) one.
    dimer = x[:60] - x[:60].mean(axis=0)
    want = xyz_true[:60] - xyz_true[:60].mean(axis=0)
    np.testing.assert_allclose(dimer, want, atol=1e-5)
    # (3) solute centred at box/2.
    np.testing.assert_allclose(x[:60].mean(axis=0), box / 2, atol=1e-5)
    # (4) compact: every molecule centre within the cell around box/2.
    for m in range(mol.max() + 1):
        com = x[mol == m].mean(axis=0)
        assert np.all(np.abs(com - box / 2) <= box / 2 + 1e-6)
    # Both frames identical in == identical out.
    np.testing.assert_allclose(out[1], out[0], atol=0)


def test_viscosity_correction():
    # Identity when conditions match.
    np.testing.assert_allclose(convert_diso(1.0, 300.0, 300.0, 0.0), 1.0)
    # awk-formula spot value: eta(T) with T in Celsius.
    t = 300.0
    eta = water_viscosity(t)
    tc = t - 273.0
    want = 1.7753 - 5.65e-2 * tc + 1.0751e-3 * tc**2 - 9.222e-6 * tc**3
    np.testing.assert_allclose(eta, want, rtol=1e-12)
    # Colder experiment -> slower tumbling (D decreases).
    assert convert_diso(1.0, 300.0, 290.0, 0.0) < 1.0
    # D2O admixture slows tumbling further... the reference formula
    # MULTIPLIES by 1.23x-mix (viscosity ratio applied to D); match it.
    assert convert_diso(1.0, 300.0, 300.0, 0.5) == 1.23 * 0.5 + 0.5


def test_stage_timer(capsys):
    from spinrelax_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    t.report()
    out = capsys.readouterr().out
    assert "stage a" in out and "Total seconds elapsed" in out


def test_charmm_4char_water_resnames(tmp_path):
    """CHARMM/VMD write 4-character residue names (TIP3); read_pdb must
    keep all 4 columns so solute_mask classifies those waters as solvent."""
    from spinrelax_tpu.io.pdb import read_pdb

    pdb = tmp_path / "tip3.pdb"
    pdb.write_text(
        "ATOM      1  CA  ALA A   1       1.000   1.000   1.000  1.00  0.00           C\n"
        "ATOM      2  OH2 TIP3W   2       5.000   5.000   5.000  1.00  0.00           O\n"
        "ATOM      3  H1  TIP3W   2       5.500   5.000   5.000  1.00  0.00           H\n"
        "END\n"
    )
    top, _ = read_pdb(str(pdb))
    assert top.res_names == ["ALA", "TIP3", "TIP3"]
    sol = solute_mask(top)
    assert sol.tolist() == [True, False, False]


def test_center_preserves_internal_dynamics(tmp_path, rng):
    """PBC repair is exact: breaking a trajectory (drift + wrap across
    images, waters added) and repairing it must reproduce the original
    solute coordinates up to a rigid per-frame translation, so bond
    vectors — and hence C(t) — are bit-identical up to float noise."""
    import jax.numpy as jnp

    n_res, n_frames = 4, 30
    box = np.array([3.0, 3.0, 3.0])
    base = rng.normal(scale=0.2, size=(n_res * 2, 3))
    xyz = base[None] + 0.02 * rng.normal(size=(n_frames, n_res * 2, 3))
    drift = np.cumsum(rng.normal(scale=0.2, size=(n_frames, 1, 3)), axis=0)
    waters = rng.uniform(0, 3.0, (n_frames, 9, 3))
    raw = np.concatenate([xyz + drift + 1.5, waters], axis=1)
    raw = np.mod(raw, box)
    top = Topology(
        atom_names=["N", "H"] * n_res + ["OW", "HW1", "HW2"] * 3,
        res_seqs=np.concatenate(
            [np.repeat(np.arange(1, n_res + 1), 2),
             np.repeat(np.arange(50, 53), 3)]
        ),
        res_names=["GLY"] * (2 * n_res) + ["SOL"] * 9,
        chain_ids=["A"] * (2 * n_res) + ["W"] * 9,
        occupancies=np.ones(2 * n_res + 9),
        elements=[""] * (2 * n_res + 9),
    )
    fixed = center_solute(raw, box, top=top)
    sol = fixed[:, : 2 * n_res]
    # Per-frame rigid translation only: subtracting each frame's mean
    # must recover the original internal coordinates exactly.
    got = sol - sol.mean(axis=1, keepdims=True)
    want = (xyz) - xyz.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_center_solute_property_random_breaks():
    """Property: for ANY random multi-molecule system broken by random
    per-molecule whole-box shifts + wrapping, the repair restores every
    molecule whole and the solute's internal geometry exactly (up to a
    rigid per-frame translation) — across random box sizes, chain
    counts, and break patterns."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        box_l=st.floats(3.0, 9.0),
        n_chains=st.integers(1, 3),
        n_waters=st.integers(0, 6),
    )
    def prop(seed, box_l, n_chains, n_waters):
        rng = np.random.default_rng(seed)
        box = np.array([box_l, box_l * 1.1, box_l * 0.9])
        # Chains packed near each other (cluster spans < box/3).
        chains, names, resn, chain_ids, seqs = [], [], [], [], []
        anchor = rng.uniform(0, box_l, 3)
        for c in range(n_chains):
            n_at = rng.integers(4, 10)
            walk = np.cumsum(rng.normal(scale=0.05, size=(n_at, 3)), axis=0)
            chains.append(anchor + c * 0.4 + walk)
            names += ["CA"] * n_at
            resn += ["ALA"] * n_at
            chain_ids += [chr(65 + c)] * n_at
            seqs += list(range(1, n_at + 1))
        wat = []
        for k in range(n_waters):
            o = rng.uniform(0, 3.0, 3)
            wat.append(np.stack([o, o + [0.08, 0, 0], o + [0, 0.08, 0]]))
            names += ["OW", "HW1", "HW2"]
            resn += ["SOL"] * 3
            chain_ids += ["W"] * 3
            seqs += [100 + k] * 3
        xyz = np.concatenate(chains + wat) if wat else np.concatenate(chains)
        top = Topology(
            atom_names=names, res_seqs=np.array(seqs), res_names=resn,
            chain_ids=chain_ids, occupancies=np.ones(len(names)),
            elements=[""] * len(names),
        )
        mol = molecule_ids(top)
        # Break: shift each molecule by a random whole-box vector, then
        # wrap everything (splitting molecules across boundaries).
        broken = xyz.copy()
        for m in range(mol.max() + 1):
            broken[mol == m] += box * rng.integers(-2, 3, size=3)
        broken = np.mod(broken, box)
        out = center_solute(broken[None], box, top=top)[0]
        # Whole molecules.
        for m in range(mol.max() + 1):
            idx = np.where(mol == m)[0]
            d = out[idx] - out[idx[0]]
            dm = np.asarray(minimum_image_distance(out[idx], out[idx[0]], box))
            np.testing.assert_allclose(d, dm, atol=1e-5)
        # Solute internal geometry exact (up to rigid translation).
        sol = solute_mask(top)
        got = out[sol] - out[sol].mean(axis=0)
        want = xyz[sol] - xyz[sol].mean(axis=0)
        np.testing.assert_allclose(got, want, atol=1e-5)

    prop()


def test_apply_molecule_breaks_idempotent_and_chain_qualified():
    """--mol-breaks on a residue that ALREADY starts a molecule must not
    double-increment (center_solute rejects id jumps >1), and "A:200"
    breaks only in the named chain (review findings, round 3)."""
    from spinrelax_tpu.ops.pbc import apply_molecule_breaks, molecule_ids

    n = 9
    top = Topology(
        atom_names=["CA"] * n,
        # chain A residues 1,2,200 (jump already breaks at 200);
        # chain B residues 199,200,201 (contiguous run)
        res_seqs=np.array([1, 1, 2, 200, 200, 199, 200, 200, 201]),
        res_names=["ALA"] * n,
        chain_ids=["A"] * 5 + ["B"] * 4,
        occupancies=np.ones(n),
        elements=["C"] * n,
    )
    mol = molecule_ids(top)
    # 200 in chain A already starts a molecule (residue jump): no change
    out = apply_molecule_breaks(mol, top, [200])
    d = np.diff(out)
    assert np.all((d == 0) | (d == 1)), out  # still contiguous runs
    # chain A's existing boundary survives; chain B got ONE new break
    assert out[3] - out[2] == 1
    assert out[6] - out[5] == 1
    # chain-qualified: B:200 only touches chain B
    out2 = apply_molecule_breaks(mol, top, ["B:200"])
    assert out2[6] - out2[5] == 1
    np.testing.assert_array_equal(out2[:5], mol[:5])


def test_center_cli_rejects_zero_box(tmp_path, rng):
    """A TRR-style zero box must be an explicit error, not NaN output."""
    import subprocess
    import sys
    import os

    from spinrelax_tpu.io import pdb as pdbio, native

    n = 12
    top = Topology(
        atom_names=["CA"] * n, res_seqs=np.arange(n) + 1,
        res_names=["ALA"] * n, chain_ids=["A"] * n,
        occupancies=np.ones(n), elements=["C"] * n,
    )
    pdbio.write_pdb(str(tmp_path / "top.pdb"), top, np.zeros((n, 3)))
    xyz = rng.uniform(0, 3, (3, n, 3)).astype(np.float32)
    native.write_xtc(
        str(tmp_path / "in.xtc"), xyz, boxes=np.zeros((3, 3, 3), np.float32)
    )
    env = dict(os.environ, PYTHONPATH=str(
        __import__("pathlib").Path(__file__).resolve().parents[1]
    ))
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from spinrelax_tpu.pipeline.cli import main; main()",
         "center", "-f", str(tmp_path / "in.xtc"),
         "-s", str(tmp_path / "top.pdb"), "-o", str(tmp_path / "o.npz")],
        env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode != 0
    assert "zero/absent box" in (r.stdout + r.stderr)

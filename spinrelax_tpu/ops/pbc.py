"""Periodic-boundary repair for solute trajectories (native trjconv).

The reference delegates PBC handling to a 3-stage GROMACS trjconv
pipeline (center-solute-gromacs.bash:70-80):

    stage 1:  trjconv -pbc mol     -ur compact            (make whole)
    stage 2:  trjconv -pbc cluster -ur compact -center    (gather solute)
    stage 3:  trjconv -pbc mol     -ur compact            (re-pack water)

This module rebuilds that pipeline natively so no GROMACS install is
needed: molecules are inferred from the PDB topology (each water/ion
residue is its own molecule; every other (chain, contiguous-residue) run
is one molecule, mirroring GROMACS' molecule blocks for typical systems),
made whole by chaining minimum-image displacements along the atom order,
clustered with the iterative closest-image-to-cluster-COM algorithm that
``-pbc cluster`` implements, and compacted so every molecule's centre
sits in the unit cell around the box centre.

All per-frame geometry is jitted and vmapped over frames (orthorhombic
cells); the whole repair of an (nFrames, nAtoms, 3) trajectory is a
single device computation.

Documented deviation (a deliberate twist, CLAUDE.md convention): every
"centre" here is the UNWEIGHTED geometric mean of the atoms involved,
where GROMACS uses mass-weighted molecule COMs for -pbc mol/cluster and
the selection's bounding-box midpoint for trjconv -center.  For solvated
proteins the three definitions differ by well under half a box, so each
molecule lands in the same periodic image and the repaired trajectories
agree up to a rigid whole-box translation (which cancels in every
downstream observable — bond vectors, orientations, C(t)).  Pathological
mass/shape-asymmetric systems near half-box boundaries could image a
molecule differently from real trjconv output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Residue names treated as solvent/ions when no explicit selection is
# given — the script's `not group "Water_and_ions"` default
# (center-solute-gromacs.bash:65).
WATER_ION_RESNAMES = frozenset(
    {"SOL", "HOH", "WAT", "TIP3", "TIP4", "TIP5", "SPC", "SPCE", "OPC",
     "T3P", "T4P", "MW",
     # element-style ion names (GROMACS/AMBER)
     "NA", "CL", "K", "MG", "ZN", "CA", "CA2", "NA+", "CL-", "K+", "BR",
     "CS", "LI", "RB", "F", "IOD",
     # CHARMM ion residue names (toppar convention)
     "SOD", "CLA", "POT", "CES", "LIT", "CAL", "BAR", "RUB", "ZN2", "CD2"}
)


@jax.jit
def unwrap_and_center(xyz, box):
    """Make a molecule whole across orthorhombic PBC and centre it.

    xyz : (nFrames, nAtoms, 3) coordinates [nm].
    box : (3,) or (nFrames, 3) orthorhombic box lengths [nm].

    Each atom is shifted by whole box vectors to the periodic image
    closest to the first atom (sufficient for solutes smaller than half
    the box, the standard `-pbc mol` situation), then the geometric
    centre is moved to the origin.
    """
    xyz = jnp.asarray(xyz)
    box = jnp.asarray(box)
    if box.ndim == 1:
        box = box[None, :]
    anchor = xyz[:, :1, :]
    disp = xyz - anchor
    disp = disp - jnp.round(disp / box[:, None, :]) * box[:, None, :]
    whole = anchor + disp
    return whole - jnp.mean(whole, axis=1, keepdims=True)


@jax.jit
def minimum_image_distance(a, b, box):
    """Minimum-image distance vectors a-b under orthorhombic PBC."""
    d = jnp.asarray(a) - jnp.asarray(b)
    box = jnp.asarray(box)
    return d - jnp.round(d / box) * box


# ---------------------------------------------------------------------------
# Molecule inference from a PDB topology
# ---------------------------------------------------------------------------

def molecule_ids(top, water_ion_resnames=WATER_ION_RESNAMES):
    """(nAtoms,) int32 molecule index per atom.

    GROMACS knows molecules from the .tpr; a PDB carries no bond table,
    so we use the standard structural convention: every water/ion residue
    is its own molecule, and each (chain id, contiguous residue-number
    run) of non-solvent atoms is one molecule (a protein/nucleic chain).
    """
    n = top.n_atoms
    mol = np.zeros(n, dtype=np.int32)
    cur = 0
    for i in range(1, n):
        solv_prev = top.res_names[i - 1].upper() in water_ion_resnames
        solv_here = top.res_names[i].upper() in water_ion_resnames
        new_res = top.res_seqs[i] != top.res_seqs[i - 1]
        new_chain = top.chain_ids[i] != top.chain_ids[i - 1]
        res_jump = abs(int(top.res_seqs[i]) - int(top.res_seqs[i - 1])) > 1
        if (
            new_chain
            or solv_prev != solv_here
            or (solv_here and new_res)
            or (new_res and res_jump)
        ):
            cur += 1
        mol[i] = cur
    return mol


def apply_molecule_breaks(mol, top, break_resids):
    """Force new-molecule boundaries at the FIRST atom of each residue
    number in ``break_resids`` (a ligand numbered contiguously after a
    protein chain is otherwise fused with it — molecule_ids has no bond
    table to know better).  Keeps ids monotonic contiguous runs.

    Break specs may be plain residue numbers (every matching residue-run
    start breaks — beware same-numbered residues in other chains) or
    chain-qualified ``"A:200"`` strings.  Atoms that already start a
    molecule are left alone (a double increment would violate the
    contiguous-run invariant center_solute checks)."""
    mol = np.asarray(mol, dtype=np.int32).copy()
    res = np.asarray(top.res_seqs)
    chains = np.asarray(top.chain_ids)
    for b in break_resids:
        chain = None
        if isinstance(b, str) and ":" in b:
            chain, b = b.split(":", 1)
        sel = res == int(b)
        if chain is not None:
            sel &= chains == chain
        starts = np.flatnonzero(
            sel & np.concatenate([[True], res[1:] != res[:-1]])
        )
        for i in starts:
            if i > 0 and mol[i] == mol[i - 1]:
                mol[i:] += 1
    return mol


def solute_mask(top, water_ion_resnames=WATER_ION_RESNAMES):
    """(nAtoms,) bool — everything that is not water/ions (the script's
    auto-generated "Solute" group, center-solute-gromacs.bash:62-67)."""
    return np.array(
        [rn.upper() not in water_ion_resnames for rn in top.res_names]
    )


# ---------------------------------------------------------------------------
# Per-frame kernels (jitted; vmapped over frames by the public drivers)
# ---------------------------------------------------------------------------

def _make_whole_frame(xyz, box, mol_start):
    """Chain minimum-image displacements along the atom order, restarting
    at each molecule's first atom: exact for connectivity that follows
    the atom order with bonds < box/2 (the `-pbc mol` contract).

    xyz : (nAtoms, 3); mol_start : (nAtoms,) bool, True at first atom.
    """
    d = jnp.diff(xyz, axis=0, prepend=xyz[:1])
    corr = -jnp.round(d / box) * box  # whole-box correction per step
    corr = jnp.where(mol_start[:, None], 0.0, corr)
    cum = jnp.cumsum(corr, axis=0)
    # Segmented restart: subtract each molecule's start-of-segment
    # cumulative value, otherwise molecule m+1 is rigidly translated by
    # molecule m's net whole-box shift (masked today by _compact_frame's
    # whole-box re-imaging, but wrong for any direct caller).
    idx = jnp.arange(xyz.shape[0])
    start_idx = jax.lax.cummax(jnp.where(mol_start, idx, 0))
    return xyz + cum - cum[start_idx]


def _mol_centers(xyz, mol_id, n_mol, inv_count):
    s = jax.ops.segment_sum(xyz, mol_id, num_segments=n_mol)
    return s * inv_count[:, None]


def _compact_frame(xyz, box, mol_id, n_mol, inv_count, center):
    """Shift every (whole) molecule by whole boxes so its geometric
    centre lands in the compact cell around ``center`` (-ur compact for
    orthorhombic cells = nearest image of the molecule centre)."""
    com = _mol_centers(xyz, mol_id, n_mol, inv_count)
    shift = -jnp.round((com - center) / box) * box
    return xyz + shift[mol_id]


def _cluster_frame(xyz, box, mol_id, n_mol, inv_count, cluster_w,
                   n_cluster: int):
    """`-pbc cluster`: greedy cluster growth (gmx trjconv's algorithm) —
    seed with the first clustered molecule, then repeatedly take the
    remaining cluster molecule whose minimum-image distance to the
    running cluster centre is smallest and place it at that image.
    A naive all-at-once fixpoint fails for e.g. a dimer straddling the
    boundary (both halves are already "nearest image" to their midpoint);
    greedy growth is what makes the solute contiguous.

    cluster_w : (nMol,) 1.0 for solute molecules, 0 otherwise (the script
    clusters the Solute group, center-solute-gromacs.bash:76).
    n_cluster : static count of cluster molecules (= sum(cluster_w)).
    """
    com = _mol_centers(xyz, mol_id, n_mol, inv_count)
    in_cluster = cluster_w > 0.0
    seed = jnp.argmax(in_cluster)
    seed_hot = jax.nn.one_hot(seed, n_mol, dtype=xyz.dtype)
    big = jnp.asarray(jnp.finfo(xyz.dtype).max, xyz.dtype)

    def body(_, state):
        shifts, placed, csum, cnt = state
        ccom = csum / cnt
        d = com - ccom
        d_mi = d - jnp.round(d / box) * box
        dist2 = jnp.sum(d_mi * d_mi, axis=1)
        cand = in_cluster & ~placed
        pick = jnp.argmin(jnp.where(cand, dist2, big))
        hot = jax.nn.one_hot(pick, n_mol, dtype=xyz.dtype)
        shift_row = -jnp.round((com[pick] - ccom) / box) * box
        # no-op when every cluster molecule is already placed
        any_left = jnp.any(cand).astype(xyz.dtype)
        shifts = shifts + any_left * hot[:, None] * shift_row
        placed = placed | (jnp.any(cand) & (hot > 0.5))
        csum = csum + any_left * (com[pick] + shift_row)
        cnt = cnt + any_left
        return shifts, placed, csum, cnt

    init = (
        jnp.zeros((n_mol, 3), xyz.dtype),
        seed_hot > 0.5,
        com[seed],
        jnp.asarray(1.0, xyz.dtype),
    )
    shifts, _, _, _ = jax.lax.fori_loop(0, max(n_cluster - 1, 0), body, init)
    return xyz + shifts[mol_id]


@functools.partial(jax.jit, static_argnames=("n_mol", "n_cluster"))
def _center_solute_frames(xyz, box, mol_id, n_mol, inv_count, sel_w,
                          atom_sel_w, n_cluster):
    """All three stages fused for a batch of frames.

    xyz : (nFrames, nAtoms, 3); box : (nFrames, 3).
    sel_w : (nMol,) 1.0 for solute molecules; atom_sel_w : (nAtoms,) 1.0
    for solute atoms (centring weight).
    """
    mol_start = jnp.concatenate(
        [jnp.asarray([True]), mol_id[1:] != mol_id[:-1]]
    )

    def one(x, b):
        center = 0.5 * b
        # Stage 1: -pbc mol -ur compact.
        x = _make_whole_frame(x, b, mol_start)
        x = _compact_frame(x, b, mol_id, n_mol, inv_count, center)
        # Stage 2: -pbc cluster -ur compact -center on the solute.
        x = _cluster_frame(x, b, mol_id, n_mol, inv_count, sel_w, n_cluster)
        sol_c = jnp.sum(x * atom_sel_w[:, None], axis=0) / jnp.sum(atom_sel_w)
        x = x + (center - sol_c)
        # Stage 3: -pbc mol -ur compact (re-pack solvent around solute).
        return _compact_frame(x, b, mol_id, n_mol, inv_count, center)

    return jax.vmap(one)(xyz, box)


# ---------------------------------------------------------------------------
# Public driver
# ---------------------------------------------------------------------------

def center_solute(xyz, box, top=None, mol_id=None, solute=None,
                  batch: int = 256):
    """Native equivalent of center-solute-gromacs.bash: make molecules
    whole, cluster the solute across images, centre it in the box, and
    re-pack the solvent compactly.

    Parameters
    ----------
    xyz : (nFrames, nAtoms, 3) [nm].
    box : (3,) or (nFrames, 3) orthorhombic box lengths [nm].
    top : Topology — used to infer ``mol_id`` and ``solute`` when they
        are not given explicitly.
    mol_id : (nAtoms,) int molecule index (contiguous runs).
    solute : (nAtoms,) bool solute-atom mask (default: not water/ions).
    batch : frames per device dispatch (bounds the HBM working set).

    Returns (nFrames, nAtoms, 3) repaired coordinates.
    """
    xyz = np.asarray(xyz)
    if xyz.ndim == 2:
        xyz = xyz[None]
    n_frames, n_atoms = xyz.shape[:2]
    box = np.asarray(box, dtype=xyz.dtype)
    if box.ndim == 1:
        box = np.broadcast_to(box, (n_frames, 3))
    if mol_id is None:
        if top is None:
            raise ValueError("need top= or mol_id=")
        mol_id = molecule_ids(top)
    mol_id = np.asarray(mol_id, dtype=np.int32)
    d = np.diff(mol_id)
    if np.any(d < 0) or np.any(d > 1):
        raise ValueError(
            "mol_id must be contiguous non-decreasing runs (0,0,1,1,2,...) "
            "— the make-whole chain restarts at each molecule's first atom"
        )
    if solute is None:
        if top is not None:
            solute = solute_mask(top)
        else:
            solute = np.ones(n_atoms, dtype=bool)
    solute = np.asarray(solute, dtype=bool)
    if not solute.any():
        raise ValueError(
            "solute selection matches no atoms (centring would divide "
            "by zero) — pass solute= or check the topology's residue names"
        )
    n_mol = int(mol_id.max()) + 1
    counts = np.bincount(mol_id, minlength=n_mol)
    inv_count = (1.0 / counts).astype(xyz.dtype)
    # A molecule is in the cluster group when ANY of its atoms is solute.
    sel_w = np.zeros(n_mol, dtype=xyz.dtype)
    sel_w[np.unique(mol_id[solute])] = 1.0
    atom_sel_w = solute.astype(xyz.dtype)

    out = np.empty_like(xyz)
    jm, ji, js, ja = (
        jnp.asarray(mol_id), jnp.asarray(inv_count), jnp.asarray(sel_w),
        jnp.asarray(atom_sel_w),
    )
    for off in range(0, n_frames, batch):
        sl = slice(off, min(off + batch, n_frames))
        out[sl] = np.asarray(
            _center_solute_frames(
                jnp.asarray(xyz[sl]), jnp.asarray(box[sl]), jm,
                n_mol, ji, js, ja, int(sel_w.sum()),
            )
        )
    return out

"""Minimal mdtraj stand-in so the reference's trajectory scripts can run
for golden-output generation (mdtraj is not installed in this image).

Supports exactly what calculate-Ct-from-traj.py / calculate-S2.py use:
``md.load`` / ``md.iterload`` of multi-MODEL PDB trajectories,
``topology.select`` (name / resname / 'all' clauses), ``xyz``,
``timestep``, ``center_coordinates``, ``superpose`` (independent numpy
SVD Kabsch — NOT the spinrelax_tpu implementation, so script-parity tests
compare two independent superposition codes), and the PdbStructure
occupancy workaround.

Our own code; standard textbook algorithms.
"""

from __future__ import annotations

import numpy as np

from . import formats  # noqa: F401


class _Atom:
    def __init__(self, name, res_seq, res_name, occupancy):
        self.name = name
        self.residue = _Residue(res_seq, res_name)
        self._occupancy = occupancy

    def get_occupancy(self):
        return self._occupancy


class _Residue:
    def __init__(self, res_seq, res_name):
        self.resSeq = res_seq
        self.name = res_name


class Topology:
    def __init__(self, names, res_seqs, res_names, occupancies):
        self._names = list(names)
        self._res_seqs = np.asarray(res_seqs)
        self._res_names = list(res_names)
        self._occ = np.asarray(occupancies)

    def atom(self, i):
        return _Atom(self._names[i], int(self._res_seqs[i]), self._res_names[i], self._occ[i])

    @property
    def n_atoms(self):
        return len(self._names)

    def select(self, expr):
        expr = expr.strip()
        mask = np.ones(self.n_atoms, dtype=bool)
        import re

        for clause in re.split(r"\band\b", expr):
            clause = clause.strip()
            if not clause:
                continue
            neg = clause.startswith("not ")
            if neg:
                clause = clause[4:].strip()
            if clause == "all":
                m = np.ones(self.n_atoms, dtype=bool)
            elif clause.startswith("name "):
                names = clause.split()[1:]
                m = np.array([n in names for n in self._names])
            elif clause.startswith("resname "):
                rn = clause.split()[1:]
                m = np.array([r in rn for r in self._res_names])
            else:
                raise ValueError(f"mdtraj shim: unsupported clause {clause!r}")
            mask &= ~m if neg else m
        return np.where(mask)[0]


class Trajectory:
    def __init__(self, xyz, topology, timestep=1.0):
        self.xyz = np.asarray(xyz, dtype=np.float32)
        self.topology = topology
        self.timestep = float(timestep)

    @property
    def n_frames(self):
        return self.xyz.shape[0]

    @property
    def n_atoms(self):
        return self.xyz.shape[1]

    def center_coordinates(self):
        self.xyz = self.xyz - self.xyz.mean(axis=1, keepdims=True)
        return self

    def superpose(self, reference, frame=0, atom_indices=None):
        """Least-squares fit each frame onto the reference frame using the
        SVD Kabsch algorithm (independent of spinrelax_tpu.ops.orient)."""
        ref = np.asarray(reference.xyz[frame], dtype=np.float64)
        idx = (
            np.arange(self.n_atoms) if atom_indices is None else np.asarray(atom_indices)
        )
        ref_sel = ref[idx]
        ref_cen = ref_sel.mean(axis=0)
        out = np.empty_like(self.xyz)
        for f in range(self.n_frames):
            mob = self.xyz[f].astype(np.float64)
            mob_sel = mob[idx]
            mob_cen = mob_sel.mean(axis=0)
            H = (mob_sel - mob_cen).T @ (ref_sel - ref_cen)
            U, S, Vt = np.linalg.svd(H)
            d = np.sign(np.linalg.det(Vt.T @ U.T))
            D = np.diag([1.0, 1.0, d])
            R = Vt.T @ D @ U.T
            out[f] = ((mob - mob_cen) @ R.T + ref_cen).astype(np.float32)
        self.xyz = out
        return self

    def save_pdb(self, fn):
        """Write the trajectory as a (multi-MODEL) PDB, coordinates in
        Angstrom (xyz is stored in nm, as mdtraj does).  Minimal standard
        ATOM records — enough for parse-hydroNMR-results.py's rotate path
        and for any PDB reader to recover the coordinates."""
        top = self.topology
        with open(fn, "w") as fp:
            for m in range(self.n_frames):
                if self.n_frames > 1:
                    fp.write("MODEL     %4d\n" % (m + 1))
                for i in range(self.n_atoms):
                    a = top.atom(i)
                    name = a.name if len(a.name) == 4 else " %-3s" % a.name
                    x, y, z = self.xyz[m, i] * 10.0
                    fp.write(
                        "ATOM  %5d %4s %-4sA%4d    %8.3f%8.3f%8.3f"
                        "%6.2f%6.2f\n"
                        % (i + 1, name, a.residue.name, a.residue.resSeq,
                           x, y, z, a.get_occupancy(), 0.0)
                    )
                if self.n_frames > 1:
                    fp.write("ENDMDL\n")
            fp.write("END\n")


def _load_pdb(fn):
    names, res_seqs, res_names, occs = [], [], [], []
    models = []
    cur = []
    first = True
    with open(fn) as fp:
        for line in fp:
            rec = line[:6]
            if rec in ("ATOM  ", "HETATM"):
                cur.append(
                    (float(line[30:38]) / 10.0, float(line[38:46]) / 10.0, float(line[46:54]) / 10.0)
                )
                if first:
                    names.append(line[12:16].strip())
                    res_names.append(line[17:20].strip())
                    res_seqs.append(int(line[22:26]))
                    occ = line[54:60].strip()
                    occs.append(float(occ) if occ else 1.0)
            elif rec.startswith("ENDMDL"):
                if cur:
                    models.append(cur)
                    cur = []
                    first = False
    if cur:
        models.append(cur)
    top = Topology(names, res_seqs, res_names, occs)
    return np.array(models, dtype=np.float32), top


def load(fn, top=None):
    if isinstance(fn, (list, tuple)):
        fn = fn[0]
    if fn.endswith(".pdb"):
        xyz, topology = _load_pdb(fn)
        return Trajectory(xyz, topology, timestep=1.0)
    if fn.endswith(".npz"):
        if top is None:
            raise ValueError("npz trajectories need a PDB topology via top=")
        _, topology = _load_pdb(top)
        obj = np.load(fn)
        xyz = np.asarray(obj["xyz"], dtype=np.float32)
        ts = float(obj["time"][1] - obj["time"][0]) if "time" in obj and len(obj["time"]) > 1 else 1.0
        return Trajectory(xyz, topology, timestep=ts)
    raise ValueError(f"mdtraj shim: unsupported file {fn!r}")


def iterload(fn, chunk=1000, top=None):
    trj = load(fn, top=top)
    for start in range(0, trj.n_frames, chunk):
        yield Trajectory(
            trj.xyz[start : start + chunk], trj.topology, timestep=trj.timestep
        )

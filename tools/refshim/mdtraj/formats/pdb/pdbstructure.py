"""PdbStructure shim: only iter_atoms() with get_occupancy(), as used by
the reference's occupancy-based fit-atom selection
(calculate-Ct-from-traj.py:288-292)."""


class _Atom:
    def __init__(self, occupancy):
        self._occ = occupancy

    def get_occupancy(self):
        return self._occ


class PdbStructure:
    def __init__(self, fp):
        self._occs = []
        seen_model_end = False
        for line in fp:
            if line.startswith("ENDMDL"):
                seen_model_end = True
            if seen_model_end:
                continue  # occupancies from the first MODEL only
            if line[:6] in ("ATOM  ", "HETATM"):
                occ = line[54:60].strip()
                self._occs.append(float(occ) if occ else 1.0)

    def iter_atoms(self):
        for occ in self._occs:
            yield _Atom(occ)

"""Amber prmtop topology ingest (io/prmtop.py)."""

import numpy as np
import pytest

from spinrelax_tpu.io import prmtop as prmio
from spinrelax_tpu.io.prmtop import PrmtopError

# Hand-written parm7 fragment at the published format grammar: an ALA
# dipeptide-ish 6-atom molecule + one water (3 atoms) + one Na+ ion.
# POINTERS: NATOM=10, NBONH=4, NBONA=3, NRES=4 (12th value).
PRMTOP = """\
%VERSION  VERSION_STAMP = V0001.000  DATE = 08/20/26  00:00:00
%FLAG TITLE
%FORMAT(20a4)
test system
%FLAG POINTERS
%FORMAT(10I8)
      10       7       4       3       0       0       0       0       0       0
      20       4       0       0       0       0       0       0       0       0
       0       0       0       0       0       0       0       0       0       0
       0
%FLAG ATOM_NAME
%FORMAT(20a4)
N   H   CA  HA  C   O   O   H1  H2  Na+
%FLAG RESIDUE_LABEL
%FORMAT(20a4)
ALA GLY WAT Na+
%FLAG RESIDUE_POINTER
%FORMAT(10I8)
       1       5       7      10
%FLAG MASS
%FORMAT(5E16.8)
  1.40100000E+01  1.00800000E+00  1.20100000E+01  1.00800000E+00  1.20100000E+01
  1.60000000E+01  1.60000000E+01  1.00800000E+00  1.00800000E+00  2.29897700E+01
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       0       3       1       6       9       1      18      21       1      18
      24       1
%FLAG BONDS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       6       2       6      12       2      12      15       2
"""


def _write(tmp_path, text, name="t.prmtop"):
    fn = tmp_path / name
    fn.write_text(text)
    return str(fn)


def test_read(tmp_path):
    top, bonds = prmio.read_prmtop(_write(tmp_path, PRMTOP))
    assert top.n_atoms == 10
    assert top.atom_names == ["N", "H", "CA", "HA", "C", "O",
                              "O", "H1", "H2", "Na+"]
    assert top.res_names[:4] == ["ALA"] * 4
    assert top.res_names[4:6] == ["GLY"] * 2
    assert top.res_names[6:9] == ["WAT"] * 3 and top.res_names[9] == "Na+"
    assert list(top.res_seqs) == [1, 1, 1, 1, 2, 2, 3, 3, 3, 4]
    # elements from masses
    assert top.elements == ["N", "H", "C", "H", "C", "O",
                            "O", "H", "H", "NA"]
    # bonds: coordinate offsets /3, H-bonds then heavy bonds
    np.testing.assert_array_equal(
        bonds,
        [[0, 1], [2, 3], [6, 7], [6, 8], [0, 2], [2, 4], [4, 5]],
    )


def test_molecules_and_center_wiring(tmp_path):
    from spinrelax_tpu.io import psf as psfio

    top, bonds = prmio.read_prmtop(_write(tmp_path, PRMTOP))
    mol = psfio.molecule_ids_from_bonds(top.n_atoms, bonds)
    np.testing.assert_array_equal(mol, [0] * 6 + [1] * 3 + [2])

    from spinrelax_tpu.io import pdb as pdbio

    t2 = pdbio.read_topology(_write(tmp_path, PRMTOP, "x.parm7"))
    assert t2.atom_names == top.atom_names
    with pytest.raises(ValueError, match="no coordinates"):
        pdbio.read_structure(_write(tmp_path, PRMTOP, "y.prmtop"))


def test_atomic_number_preferred(tmp_path):
    text = PRMTOP.replace(
        "%FLAG MASS",
        "%FLAG ATOMIC_NUMBER\n%FORMAT(10I8)\n"
        "       7       1       6       1       6       8       8       1"
        "       1      11\n%FLAG MASS",
    )
    top, _ = prmio.read_prmtop(_write(tmp_path, text))
    assert top.elements == ["N", "H", "C", "H", "C", "O", "O", "H", "H", "NA"]


def test_errors(tmp_path):
    with pytest.raises(PrmtopError, match="VERSION"):
        prmio.read_prmtop(_write(tmp_path, "JUNK\n", "a.prmtop"))
    with pytest.raises(PrmtopError, match="POINTERS"):
        prmio.read_prmtop(_write(
            tmp_path, "%VERSION x\n%FLAG TITLE\n%FORMAT(20a4)\nt\n",
            "b.prmtop"))
    bad = PRMTOP.replace("N   H   CA  HA  C   O   O   H1  H2  Na+",
                         "N   H   CA")
    with pytest.raises(PrmtopError, match="ATOM_NAME has"):
        prmio.read_prmtop(_write(tmp_path, bad, "c.prmtop"))
    bad = PRMTOP.replace("       0       6       2       6      12       2      12      15       2",
                         "       1       6       2       6      12       2      12      15       2")
    with pytest.raises(PrmtopError, match="coordinate offset"):
        prmio.read_prmtop(_write(tmp_path, bad, "d.prmtop"))


def test_center_cli_with_prmtop(tmp_path):
    """-s system.prmtop drives exact-molecule centring end-to-end."""
    from spinrelax_tpu.io import trajectory as trjio
    from spinrelax_tpu.pipeline import cli

    fn = _write(tmp_path, PRMTOP)
    rng = np.random.default_rng(5)
    base = rng.uniform(1.0, 3.0, (10, 3))
    frames = np.broadcast_to(base, (2, 10, 3)).copy()
    frames[:, 6:9] += np.array([4.0, 0.0, 0.0])  # water in the next image
    np.savez(str(tmp_path / "t.npz"), xyz=frames, time=np.arange(2.0))
    cli.cmd_center(["-f", str(tmp_path / "t.npz"), "-s", fn,
                    "--box", "4,4,4", "-o", str(tmp_path / "c.npz")])
    out, _ = trjio.load_trajectory(str(tmp_path / "c.npz"))
    assert out.shape == (2, 10, 3)
    assert np.isfinite(out).all()

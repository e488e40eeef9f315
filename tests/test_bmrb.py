"""Native NMR-STAR parsing + BMRB experiment-file conversion."""

import os

import numpy as np

from spinrelax_tpu.io import nmrstar
from spinrelax_tpu.io.bmrb import parse_bmrb_entry
from spinrelax_tpu.io.experiments import read_experiment

STAR_TEXT = """
data_test

save_T1_600
   _Heteronucl_T1_list.Sf_category          heteronucl_T1_relaxation
   _Heteronucl_T1_list.Spectrometer_frequency_1H  600.13
   _Heteronucl_T1_list.T1_val_units         s

   loop_
      _T1.Comp_index_ID
      _T1.Comp_ID
      _T1.Atom_type
      _T1.Atom_isotope_number
      _T1.Val
      _T1.Val_err

      2 ALA N 15 0.500 0.010
      3 GLY N 15 0.400 0.008
      4 SER N 15 .     .
      5 LYS N 15 0.250 0.005
   stop_
save_

save_NOE_600
   _Heteronucl_NOE_list.Sf_category          heteronucl_NOEs
   _Heteronucl_NOE_list.Spectrometer_frequency_1H  600.13

   loop_
      _NOE.Comp_index_ID_1
      _NOE.Comp_ID_1
      _NOE.Atom_type_1
      _NOE.Atom_isotope_number_1
      _NOE.Val
      _NOE.Val_err

      2 ALA N 15 0.71 0.02
      3 GLY N 15 0.78 0.03
   stop_
save_

save_some_other_frame
   _Assembly.Sf_category   assembly
   _Assembly.Name          'test molecule'
save_
"""


def test_nmrstar_parser_basics():
    entry = nmrstar.parse(STAR_TEXT)
    assert len(entry.saveframes) == 3
    t1 = entry.frames_by_category("heteronucl_T1_relaxation")
    assert len(t1) == 1
    sf = t1[0]
    assert sf.get_tag("Spectrometer_frequency_1H") == "600.13"
    loop = sf.loops[0]
    assert loop.get_tag("Comp_index_ID") == ["2", "3", "4", "5"]
    assert loop.get_tag("Val")[2] == "."
    other = entry.saveframes[2]
    assert other.get_tag("Name") == "test molecule"


def test_bmrb_conversion(tmp_path):
    entry = nmrstar.parse(STAR_TEXT)
    files = parse_bmrb_entry(entry, out_prefix=str(tmp_path / "expt"))
    assert len(files) == 2
    r1_files = [f for f in files if "_R1_" in f]
    noe_files = [f for f in files if "_NOE_" in f]
    assert len(r1_files) == 1 and len(noe_files) == 1

    e = read_experiment(r1_files[0])
    assert e.expt_type == "R1"
    assert e.nuclei_a == "15N"
    assert e.frequency == 600.13
    # Missing-value row (resid 4) dropped; T1 [s] -> R1 [1/s].
    np.testing.assert_array_equal(e.names, ["2", "3", "5"])
    np.testing.assert_allclose(e.values, [2.0, 2.5, 4.0])
    np.testing.assert_allclose(e.errors, [2.0 * 0.010, 2.5 * 0.008, 4.0 * 0.005])

    noe = read_experiment(noe_files[0])
    assert noe.expt_type == "NOE"
    np.testing.assert_allclose(noe.values, [0.71, 0.78])

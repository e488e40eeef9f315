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


def test_bmrb_noe_suffixed_nuclei_and_null_errors(tmp_path):
    """NOE loops carry suffixed Atom_type_1/_2 tags (reference
    get_isotopes scans by prefix): a 13C-{1H} NOE must be labelled 13C,
    and a null Val_err must drop the error column entirely rather than
    writing sigma=0."""
    star = """data_test
save_noe13c
_Heteronucl_NOE_list.Sf_category heteronucl_NOEs
_Heteronucl_NOE_list.ID 4
_Heteronucl_NOE_list.Sample_condition_list_ID 2
_Heteronucl_NOE_list.Spectrometer_frequency_1H 700.13
loop_
_Heteronucl_NOE.Comp_index_ID_1
_Heteronucl_NOE.Atom_type_1
_Heteronucl_NOE.Atom_isotope_number_1
_Heteronucl_NOE.Comp_index_ID_2
_Heteronucl_NOE.Atom_type_2
_Heteronucl_NOE.Atom_isotope_number_2
_Heteronucl_NOE.Val
_Heteronucl_NOE.Val_err
2 C 13 2 H 1 0.71 0.02
3 C 13 3 H 1 0.75 .
stop_
save_
"""
    fn = tmp_path / "noe.str"
    fn.write_text(star)
    from spinrelax_tpu.io import bmrb, nmrstar
    from spinrelax_tpu.io.experiments import read_experiment

    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        files = bmrb.parse_bmrb_entry(nmrstar.parse_file(str(fn)),
                                      out_prefix="x")
    finally:
        os.chdir(cwd)
    assert files == ["x_NOE_700.13_4_2.dat"]  # reference filename scheme
    e = read_experiment(str(tmp_path / files[0]))
    assert e.nuclei_a == "13C" and e.nuclei_b == "1H"
    assert e.errors is None  # all-or-none: the null error dropped both
    np.testing.assert_allclose(e.values, [0.71, 0.75])


def test_bmrb_ms_unit_error_conversion(tmp_path):
    """T2 in ms: errors convert to seconds BEFORE the err_R = R*err_T
    convention ('/1000*1000' used to cancel, inflating sigma 1000x)."""
    star = """data_test
save_t2
_Heteronucl_T2_list.Sf_category heteronucl_T2_relaxation
_Heteronucl_T2_list.ID 7
_Heteronucl_T2_list.Sample_condition_list_ID 1
_Heteronucl_T2_list.Spectrometer_frequency_1H 600.13
_Heteronucl_T2_list.T2_val_units ms
loop_
_T2.Comp_index_ID
_T2.Atom_type
_T2.Atom_isotope_number
_T2.Val
_T2.Val_err
5 N 15 500.0 10.0
stop_
save_
"""
    fn = tmp_path / "t2.str"
    fn.write_text(star)
    from spinrelax_tpu.io import bmrb, nmrstar
    from spinrelax_tpu.io.experiments import read_experiment

    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        files = bmrb.parse_bmrb_entry(nmrstar.parse_file(str(fn)),
                                      out_prefix="y")
    finally:
        os.chdir(cwd)
    e = read_experiment(str(tmp_path / files[0]))
    np.testing.assert_allclose(e.values, [2.0])       # 1000/500ms
    np.testing.assert_allclose(e.errors, [2.0 * 0.01])  # R * err_s

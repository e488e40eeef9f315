"""PBC unwrap helper and the D_iso viscosity/temperature correction."""

import numpy as np

from spinrelax_tpu.ops.pbc import minimum_image_distance, unwrap_and_center
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

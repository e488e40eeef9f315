"""BMRB entry -> experiment-file converter
(parse-relaxations-from-BMRB-entry.py equivalent).

Pulls heteronuclear R1/T1, R2/T2 and NOE save-frames from a BMRB entry
(by accession number or local NMR-STAR file), converts time constants [s]
to rates [s^-1], and writes the header-annotated experiment files consumed
by ``spinrelax multifield``.

Requires the optional ``pynmrstar`` package (gated, like the reference).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .experiments import ExperimentData, write_experiment

_CATEGORIES = {
    "heteronucl_T1_relaxation": "R1",
    "heteronucl_T2_relaxation": "R2",
    "heteronucl_NOEs": "NOE",
}


def _get_tag(loop, names):
    for n in names:
        try:
            return loop.get_tag(n)
        except Exception:
            continue
    return None


def parse_bmrb_entry(entry, out_prefix: str = "expt"):
    """entry: a pynmrstar Entry.  Returns list of written filenames."""
    written = []
    count = 0
    for cat, expt_type in _CATEGORIES.items():
        frames = entry.get_saveframes_by_category(cat)
        for sf in frames:
            freq = sf.get_tag("Spectrometer_frequency_1H")
            freq = freq[0] if freq else "600.0"
            loops = [l for l in sf.loops if "relaxation" in l.category.lower() or "NOE" in l.category]
            if not loops:
                loops = sf.loops[-1:]
            for loop in loops:
                val = _get_tag(loop, ["Val", f"{expt_type}_val", "T1_val", "T2_val"])
                err = _get_tag(loop, ["Val_err", f"{expt_type}_val_err", "T1_val_err", "T2_val_err"])
                if val is None:
                    continue
                resid = _get_tag(loop, ["Comp_index_ID", "Comp_index_ID_1"])
                isotopes = _get_tag(loop, ["Atom_isotope_number"])
                atom_types = _get_tag(loop, ["Atom_type", "Atom_type_1"])
                if isotopes and atom_types:
                    iso_a = f"{isotopes[0]}{atom_types[0]}"
                    if iso_a == "1H" and len(atom_types) > 1:
                        iso_a = f"{isotopes[1]}{atom_types[1]}"
                else:
                    iso_a = "15N"
                vals = np.array([float(x) for x in val])
                errs = (
                    np.array([float(x) if x not in (".", "?") else 0.0 for x in err])
                    if err is not None
                    else None
                )
                # Units: T1/T2 in seconds -> rates
                unit_tag = sf.get_tag(f"{expt_type.replace('R','T')}_val_units") if expt_type != "NOE" else None
                unit = unit_tag[0] if unit_tag else ("s" if expt_type != "NOE" else "")
                if expt_type != "NOE" and unit == "s":
                    rates = 1.0 / vals
                    if errs is not None:
                        errs = rates * errs
                    vals = rates
                count += 1
                fn = "%s_%s_%s_%d.dat" % (out_prefix, expt_type, freq, count)
                write_experiment(
                    fn,
                    ExperimentData(
                        expt_type=expt_type,
                        nuclei_a=iso_a,
                        nuclei_b="1H",
                        frequency=float(freq),
                        freq_unit="MHz",
                        names=np.array([str(r) for r in resid]),
                        values=vals,
                        errors=errs,
                    ),
                )
                written.append(fn)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="spinrelax bmrb",
        description="Convert BMRB relaxation save-frames to experiment files.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-i", "--id", default=None, help="BMRB accession number")
    p.add_argument("-f", "--infn", default=None, help="local NMR-STAR file")
    p.add_argument("-o", "--outpref", default="expt")
    a = p.parse_args(argv)
    try:
        from pynmrstar import Entry
    except ImportError:
        sys.exit(
            "= = = ERROR: the optional pynmrstar package is required for "
            "BMRB parsing (pip install pynmrstar)"
        )
    if a.infn:
        entry = Entry.from_file(a.infn)
    elif a.id:
        entry = Entry.from_database(a.id)
    else:
        sys.exit("= = = ERROR: give either --id or --infn")
    files = parse_bmrb_entry(entry, a.outpref)
    print("= = Finished. %i files written:" % len(files))
    for f in files:
        print("    %s" % f)


if __name__ == "__main__":
    main()

"""BMRB entry -> experiment-file converter
(parse-relaxations-from-BMRB-entry.py equivalent).

Pulls heteronuclear T1/R1, T2/R2 and NOE save-frames from a BMRB
NMR-STAR file, converts time constants [s] to rates [s^-1], and writes
the header-annotated experiment files consumed by ``spinrelax
multifield``.

Unlike the reference (which hard-requires the pynmrstar package), local
files are parsed with the built-in NMR-STAR reader (io/nmrstar.py);
pynmrstar is only needed for fetching entries from the BMRB API by
accession number.
"""

from __future__ import annotations

import argparse
import sys
from typing import List

import numpy as np

from . import nmrstar
from .experiments import ExperimentData, write_experiment

_CATEGORIES = {
    "heteronucl_T1_relaxation": "R1",
    "heteronucl_T2_relaxation": "R2",
    "heteronucl_NOEs": "NOE",
}


def _first(values, default=None):
    if values is None:
        return default
    for v in values:
        if v not in (".", "?", None, ""):
            return v
    return default


def _loop_for(sf: nmrstar.SaveFrame, expt_type: str):
    """Pick the data loop holding Val/Val_err columns."""
    for loop in sf.loops:
        if loop.get_tag("Val") is not None or loop.get_tag(f"{expt_type}_val") is not None \
           or loop.get_tag("T1_val") is not None or loop.get_tag("T2_val") is not None:
            return loop
    return sf.loops[-1] if sf.loops else None


def _values_and_errors(loop: nmrstar.Loop, expt_type: str):
    for base in ("Val", f"{expt_type}_val", "T1_val", "T2_val"):
        vals = loop.get_tag(base)
        if vals is not None:
            errs = loop.get_tag(base + "_err")
            return vals, errs
    return None, None


def parse_bmrb_entry(entry: nmrstar.Entry, out_prefix: str = "expt") -> List[str]:
    written: List[str] = []
    count = 0
    for cat, expt_type in _CATEGORIES.items():
        for sf in entry.frames_by_category(cat):
            freq = sf.get_tag("Spectrometer_frequency_1H") or "600.0"
            loop = _loop_for(sf, expt_type)
            if loop is None:
                continue
            vals, errs = _values_and_errors(loop, expt_type)
            if vals is None:
                continue
            resid = loop.get_tag("Comp_index_ID") or loop.get_tag("Comp_index_ID_1")
            if resid is None:
                continue
            iso_num = _first(loop.get_tag("Atom_isotope_number"), "15")
            atom_type = _first(loop.get_tag("Atom_type"), "N")
            if atom_type == "H":
                # NOE frames list two nuclei; take the heavy partner.
                iso_num = _first(loop.get_tag("Atom_isotope_number_1"), iso_num)
                atom_type = _first(loop.get_tag("Atom_type_1"), atom_type)
                if atom_type == "H":
                    iso_num, atom_type = "15", "N"
            nuclei_a = f"{iso_num}{atom_type}"

            keep = [
                i for i, v in enumerate(vals) if v not in (".", "?", "")
            ]
            values = np.array([float(vals[i]) for i in keep])
            if errs is not None:
                errors = np.array(
                    [float(errs[i]) if errs[i] not in (".", "?", "") else 0.0 for i in keep]
                )
            else:
                errors = None
            names = np.array([str(resid[i]) for i in keep])

            # Units: T1/T2 in seconds -> rates (reference :164-168).
            unit = None
            if expt_type != "NOE":
                unit = sf.get_tag(f"T{expt_type[-1]}_val_units") or sf.get_tag("Val_units")
                if unit == "s":
                    rates = 1.0 / values
                    if errors is not None:
                        errors = rates * errors
                    values = rates
                elif unit in ("ms",):
                    rates = 1000.0 / values
                    if errors is not None:
                        errors = rates * errors / 1000.0 * 1000.0
                    values = rates

            count += 1
            fn = "%s_%s_%s_%d.dat" % (out_prefix, expt_type, freq, count)
            write_experiment(
                fn,
                ExperimentData(
                    expt_type=expt_type,
                    nuclei_a=nuclei_a,
                    nuclei_b="1H",
                    frequency=float(freq),
                    freq_unit="MHz",
                    names=names,
                    values=values,
                    errors=errors,
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
    p.add_argument("-i", "--id", default=None, help="BMRB accession number (needs pynmrstar + network)")
    p.add_argument("-f", "--infn", default=None, help="local NMR-STAR file")
    p.add_argument("-o", "--outpref", default="expt")
    a = p.parse_args(argv)
    if a.infn:
        entry = nmrstar.parse_file(a.infn)
    elif a.id:
        try:
            from pynmrstar import Entry as PyEntry
        except ImportError:
            sys.exit(
                "= = = ERROR: fetching by accession number requires the "
                "optional pynmrstar package; pass a local file with -f instead"
            )
        raw = str(PyEntry.from_database(a.id))
        entry = nmrstar.parse(raw)
    else:
        sys.exit("= = = ERROR: give either --id or --infn")
    files = parse_bmrb_entry(entry, a.outpref)
    print("= = Finished. %i files written:" % len(files))
    for f in files:
        print("    %s" % f)


if __name__ == "__main__":
    main()

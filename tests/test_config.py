"""Unified typed config (pipeline/config.py): dataclass <-> argparse
round-trip and validation."""

import argparse

import pytest

from spinrelax_tpu.constants import DEFAULT_ZETA
from spinrelax_tpu.pipeline.config import (
    ExperimentParams, IOParams, PhysicsParams, TumblingParams,
    WorkflowConfig, add_workflow_args, config_from_namespace,
)


def parse(argv):
    p = argparse.ArgumentParser()
    add_workflow_args(p)
    return config_from_namespace(p.parse_args(argv))


def test_defaults_single_source_of_truth():
    cfg = parse([])
    assert cfg == WorkflowConfig()
    assert cfg.physics.zeta == DEFAULT_ZETA
    assert cfg.io.outpref == "rotdif"
    assert cfg.tumbling.tau_mem == 10000.0
    assert cfg.experiments.bfields_mhz == (600.133,)
    assert not cfg.force


def test_flags_fill_typed_fields():
    cfg = parse(
        "-out x -t_mem 5000 -Bfields 600.133 850.13 -stream 4 "
        "-vecstorage PhiTheta -zeta 0.9 -q_ext 1 0 0 0 -D_ext 4e-5 1.2 "
        "-fit Diso Diso,rsCSA -expfiles a.dat b.dat -Jw -bForce".split()
    )
    assert cfg.io.outpref == "x" and cfg.io.stream_groups == 4
    assert cfg.io.vec_storage == "PhiTheta"
    assert cfg.tumbling.tau_mem == 5000.0
    assert cfg.tumbling.q_ext == (1.0, 0.0, 0.0, 0.0)
    assert cfg.tumbling.d_ext == (4e-5, 1.2)
    assert cfg.physics.zeta == 0.9
    assert cfg.experiments.bfields_mhz == (600.133, 850.13)
    assert cfg.experiments.fit_modes == ("Diso", "Diso,rsCSA")
    assert cfg.experiments.do_jomega and cfg.force


def test_validation():
    with pytest.raises(ValueError, match="no experimental file"):
        WorkflowConfig(
            experiments=ExperimentParams(fit_modes=("Diso",))
        ).validate()
    with pytest.raises(ValueError, match="vec_storage"):
        IOParams(vec_storage="bogus")
    # -devices needs a shardable stage: streamed C(t) or multi-field fit.
    with pytest.raises(ValueError, match="-devices"):
        WorkflowConfig(io=IOParams(devices=4)).validate()
    WorkflowConfig(io=IOParams(devices=4, stream_groups=2)).validate()
    WorkflowConfig(
        io=IOParams(devices=4),
        experiments=ExperimentParams(
            fit_modes=("Diso",), exp_files=("e.dat",)
        ),
    ).validate()


def test_frozen():
    cfg = WorkflowConfig()
    with pytest.raises(Exception):
        cfg.io.outpref = "nope"


def test_run_workflow_is_typed_entry():
    """The library entry exists and rejects invalid configs without
    touching the filesystem."""
    from spinrelax_tpu.pipeline.runall import run_workflow

    bad = WorkflowConfig(experiments=ExperimentParams(fit_modes=("Diso",)))
    with pytest.raises(ValueError):
        run_workflow(bad)

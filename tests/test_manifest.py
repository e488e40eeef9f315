"""Content-hashed stage resume: stale inputs must invalidate stages."""

import json
import os

from spinrelax_tpu.pipeline.manifest import record_stage, stage_is_current


def test_manifest_roundtrip(tmp_path):
    inp = tmp_path / "input.dat"
    out = tmp_path / "output.dat"
    inp.write_text("hello")
    out.write_text("result")
    pref = str(tmp_path / "run")

    # No manifest yet: existence semantics.
    assert stage_is_current(pref, "s1", [str(inp)], [str(out)])

    record_stage(pref, "s1", [str(inp)], params=dict(k=1))
    assert stage_is_current(pref, "s1", [str(inp)], [str(out)], params=dict(k=1))

    # Changed parameter invalidates.
    assert not stage_is_current(pref, "s1", [str(inp)], [str(out)], params=dict(k=2))

    # Changed input content invalidates.
    inp.write_text("changed")
    assert not stage_is_current(pref, "s1", [str(inp)], [str(out)], params=dict(k=1))

    # Re-record: current again.
    record_stage(pref, "s1", [str(inp)], params=dict(k=1))
    assert stage_is_current(pref, "s1", [str(inp)], [str(out)], params=dict(k=1))

    # Missing output always invalidates.
    os.remove(out)
    assert not stage_is_current(pref, "s1", [str(inp)], [str(out)], params=dict(k=1))


def test_manifest_file_structure(tmp_path):
    inp = tmp_path / "a"
    inp.write_text("x")
    pref = str(tmp_path / "run")
    record_stage(pref, "stage", [str(inp)], params=dict(alpha=0.5))
    with open(pref + ".manifest.json") as fp:
        data = json.load(fp)
    assert "stage" in data
    assert str(inp) in data["stage"]["inputs"]
    assert data["stage"]["params"]["alpha"] == 0.5

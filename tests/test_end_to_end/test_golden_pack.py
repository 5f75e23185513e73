"""Native IPM vs the recorded golden pack (VERDICT r1, item 10).

``tests/golden/golden_pack.json`` holds independently solved objectives
for the gate problems at fixed meshes (recorded by
``tools/record_golden.py``; regenerate with ``--backend ipopt`` on a box
with the reference stack). The native solver must reproduce every
objective at the same mesh.

The committed pack is scipy-recorded by documented decision (cyipopt and
numba are absent from this image and installs are disallowed — see the
PROVENANCE DECISION block in ``tools/record_golden.py``); solver
independence comes from trust-constr here, transcription independence
from ``test_ode_anchor.py``'s solve_ivp re-integration anchors.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from tools.record_golden import build_problems

_PACK = Path(__file__).resolve().parents[1] / "golden" / "golden_pack.json"


@pytest.fixture(scope="module")
def pack():
    return json.loads(_PACK.read_text())


@pytest.mark.parametrize("name", ["lqr", "brachistochrone", "bang_bang", "orbit"])
def test_objective_matches_golden(name, pack):
    from pockit_tpu.optimizer import ipm

    system, guess = build_problems()[name]
    # the pack pins the mesh; confirm the builder still matches it
    for p, rec in zip(system.p, pack[name]["meshes"]):
        np.testing.assert_allclose(np.asarray(p._mesh), rec["mesh"])
        assert list(np.asarray(p._num_point)) == list(rec["num_point"])

    _, info = ipm.solve(system, guess)
    assert info["status"] == 0, info["status_msg"]
    assert info["obj_val"] == pytest.approx(
        pack[name]["objective"], abs=5e-7
    ), name

"""Campaign driver (campaign.py) — artifact gating, resume, failure capture.

Mirrors the reference's check_next.py state machine semantics: stages run in
order, completed stages are skipped on resume, residual gates block unhealthy
progression (check_next.py:37-55)."""

import json
import os

import pytest

from nekstab_next_tpu.campaign import (
    Campaign, GateError, Stage, artifact_exists, residual_gate,
)


def _touch(workdir, name, content="x\n"):
    with open(os.path.join(workdir, name), "w") as fh:
        fh.write(content)


def test_stages_run_in_order_and_resume(tmp_path):
    wd = str(tmp_path)
    calls = []

    def mk(name, artifact):
        def run(w):
            calls.append(name)
            _touch(w, artifact)
            return {"n": len(calls)}

        return Stage(name, run, done=artifact_exists(artifact))

    stages = [mk("baseflow", "BF.npz"), mk("direct", "spec_d.dat")]
    rep = Campaign(wd, stages).run()
    assert calls == ["baseflow", "direct"]
    assert rep["baseflow"]["status"] == "done"

    # resume: nothing re-runs (artifacts + report both present)
    rep2 = Campaign(wd, stages).run()
    assert calls == ["baseflow", "direct"]
    assert rep2["direct"]["status"] == "done"

    # report persisted to disk
    with open(os.path.join(wd, "report.json")) as fh:
        assert json.load(fh)["baseflow"]["status"] == "done"


def test_residual_gate_blocks(tmp_path):
    wd = str(tmp_path)
    _touch(wd, "residu_newton.dat", "1 1e-3\n2 1e-7\n")
    gate = residual_gate("residu_newton.dat", 1e-10)
    st = Stage("direct", lambda w: {}, gate=gate)
    with pytest.raises(GateError):
        Campaign(wd, [st]).run()
    # loosen the tolerance -> passes
    st2 = Stage("direct", lambda w: {}, gate=residual_gate("residu_newton.dat", 1e-6))
    rep = Campaign(wd, [st2]).run()
    assert rep["direct"]["status"] == "done"


def test_failure_is_recorded(tmp_path):
    wd = str(tmp_path)

    def boom(w):
        raise ValueError("solver diverged")

    with pytest.raises(ValueError):
        Campaign(wd, [Stage("bad", boom)]).run()
    with open(os.path.join(wd, "report.json")) as fh:
        rep = json.load(fh)
    assert rep["bad"]["status"] == "failed"
    assert "solver diverged" in rep["bad"]["error"]


def test_upo_artifact_regression():
    """Regression tier for the committed Re=100 UPO artifact (round-5
    VERDICT item 7): the Newton-refined shedding orbit must sit in the
    literature Strouhal band (Williamson 1989: St ~ 0.164-0.167 at Re=100;
    relaxed for the coarse artifact mesh) with a residual at the f32
    orbit-matvec floor and a period consistent with the Poincare estimate."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "upo_out", "upo.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("upo_out/upo.json artifact not present")
    d = json.load(open(path))
    assert 0.15 < d["strouhal"] < 0.18, d["strouhal"]
    assert d["residual"] < 5e-3, d["residual"]
    assert abs(d["period"] - d["period_estimate"]) < 0.05 * d["period"]

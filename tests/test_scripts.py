"""End-to-end smokes for the entry-point scripts, run as real subprocesses
at tiny sizes. Each script carries its OWN pass/fail gate (landing criteria,
campaign success rate, fleet probe improvement) and exits nonzero on failure
— so these tests guard the full wiring: CLI → config → controller → campaign
→ verdict. Motivated by a real regression this class of test would have
caught: the fleet campaign script's original default solver collapsed to
6-12% round-1 success on dispersed cold starts (see LMPCConfig.solver),
while unit tests — all warm or narrowly seeded — stayed green.

Reference analogue: ``/root/reference/scripts/`` are the reference's only
integration surface; SURVEY §4 lists script-level runs as its test strategy's
outer ring.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}
# the 8-virtual-device XLA flag from conftest would be inherited; scripts
# expect an ordinary single-device CPU backend
ENV.pop("XLA_FLAGS", None)


def run_script(name, *args, timeout=900):
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / name), *args],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=ROOT,
    )
    assert proc.returncode == 0, (
        f"{name} exited {proc.returncode}\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-2000:]}"
    )
    return proc.stdout


@pytest.mark.slow
class TestScriptSmokes:
    def test_demo_landing(self):
        out = run_script("demo_landing.py", "--batch", "2", "--steps", "100")
        assert "PASS" in out

    def test_campaign_rti_3dof(self):
        out = run_script(
            "run_campaign_tpu.py", "--cpu", "--batch", "4", "--steps", "80")
        assert '"success_rate"' in out

    def test_fleet_lmpc_defaults(self):
        """The fleet growth campaign under its DEFAULT solver/shaping — the
        configuration the scale artifact ships with. The script's own gate
        requires probe improvement on the seed and >90% final success."""
        out = run_script(
            "run_fleet_lmpc_tpu.py", "--cpu", "--batch", "4", "--rounds", "2",
            "--steps", "120")
        assert "FLEET LMPC: PASS" in out

    def test_chance_constraint_calibration(self):
        """The tightening machinery's empirical check (VERDICT r3 item 6):
        lanes ride a descent-speed bound under a known-σ gust; the script's
        own gate requires realized violation ≤ 1−confidence (Wilson upper
        bound) per level, monotone in confidence, and one-step coverage at
        the two-sided Gaussian target."""
        out = run_script(
            "run_calibration_tpu.py", "--cpu", "--batch", "24",
            "--steps", "60", "--confidences", "0.9", "0.95")
        assert "CALIBRATION: PASS" in out

    def test_online_safety_composed(self):
        """Online GP-MPC + funnel filter + gusts across episodes with the
        GP carried (VERDICT r3 item 5). The script's own PASS gate
        (interventions fall episode 1 → last AND >95% success) is
        statistical and needs ≥128 lanes (see
        campaign_online_safety_cpu_128.json); at smoke scale assert the
        composition runs end-to-end and reports the learning trace."""
        proc = subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "run_online_safety_tpu.py"),
             "--cpu", "--batch", "24", "--episodes", "2", "--steps", "100"],
            capture_output=True, text=True, timeout=1200, env=ENV, cwd=ROOT,
        )
        assert proc.returncode in (0, 1), proc.stderr[-2000:]
        assert '"interventions_by_episode"' in proc.stdout
        assert '"model_err_by_episode"' in proc.stdout

    def test_fleet_lmpc_vertex_memory(self):
        """--pool/--vertex-memory: the non-contracting terminal-candidate
        path that makes fleet V(x0) monotone (VERDICT r3 item 2)."""
        out = run_script(
            "run_fleet_lmpc_tpu.py", "--cpu", "--batch", "4", "--rounds", "2",
            "--steps", "120", "--pool", "40", "--pool-dist-weight", "2000",
            "--vertex-memory")
        assert "FLEET LMPC: PASS" in out

    def test_fleet_lmpc_checkpoint_resume(self, tmp_path):
        """Interrupted-campaign recovery — the path that gets exercised for
        real when the TPU relay dies mid-campaign: run 1 round with a
        checkpoint dir, then ask for 2 rounds against the same dir; the
        second invocation must resume after round 1 (not refly it) and
        still pass the campaign gate."""
        ck = str(tmp_path / "ck")
        run_script(
            "run_fleet_lmpc_tpu.py", "--cpu", "--batch", "4", "--rounds",
            "1", "--steps", "120", "--checkpoint", ck)
        out = run_script(
            "run_fleet_lmpc_tpu.py", "--cpu", "--batch", "4", "--rounds",
            "2", "--steps", "120", "--checkpoint", ck)
        assert "resumed after round 1" in out
        assert "FLEET LMPC: PASS" in out

    def test_campaign_online_gp_mpc(self):
        """The learning-during-control campaign path end-to-end: the GP
        starts empty and the script's learning trace must show in-flight
        error reduction."""
        import json

        out = run_script(
            "run_campaign_tpu.py", "--cpu", "--controller", "online_gp_mpc",
            "--batch", "4", "--steps", "120")
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        assert d["online_learning"]["model_err_reduction_x"] > 2.0, d
        assert d["success_rate"] >= 0.75, d

    def test_campaign_safety_gust_rescue(self):
        """The filter-rescue composition end-to-end: gusted plant, funnel
        invariant, disturbance-padded recoverability model."""
        import json

        out = run_script(
            "run_campaign_tpu.py", "--cpu", "--controller", "rti",
            "--safety-filter", "--gust", "-2.0",
            "--batch", "8", "--steps", "150")
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        assert d["safety_filter"]["success_rate_delta"] > 0.0, d

    def test_fleet_gp_learning(self):
        out = run_script(
            "run_fleet_learning_tpu.py", "--cpu", "--batch", "4",
            "--rounds", "2", "--tune-steps", "10")
        assert "FLEET GP LEARNING: PASS" in out

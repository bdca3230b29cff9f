"""The gated real-weights harness must be RUNNABLE debt: the fixture path
exercises every stage (parity, e2e config, bench, BASELINE.md rewrite)
without the real artifacts (VERDICT r1 missing #3)."""

import pytest
import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
SCRIPT = osp.join(REPO, "scripts", "validate_real.py")


@pytest.mark.slow
def test_fixture_path_runs_all_stages(tmp_path):
    out_md = tmp_path / "BASELINE_test.md"
    out_md.write_text("# test baseline\n")
    env = dict(os.environ)
    env.update(
        DMI_VALIDATE_REAL_FIXTURE="1",
        JAX_PLATFORMS="cpu",
        DMI_BENCH_SMALL="1",
    )
    r = subprocess.run(
        [sys.executable, SCRIPT, "--data-root", "data", "--out", str(out_md)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    text = out_md.read_text()
    assert "validate_real:begin" in text
    payload = json.loads(text.split("```json")[1].split("```")[0])
    assert payload["hf_parity"]["greedy_token_exact"] is True
    assert payload["hf_parity"]["logits_ok"] is True
    assert "coco_cider" in payload["sydney_v2_rn50"]
    assert payload["decode_bench"]["unit"] == "captions/s/chip"
    # the same-hardware torch-vs-ours ratio stage (tiny shape in fixture
    # mode) must run and certify token-exact decode before timing
    assert payload["cpu_decode_ratio"]["tokens_equal"] is True
    assert payload["cpu_decode_ratio"]["dmi_over_hf_same_cpu"] > 0

    # idempotent: a second run replaces the AUTO block instead of appending
    r2 = subprocess.run(
        [sys.executable, SCRIPT, "--data-root", "data", "--out", str(out_md)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert out_md.read_text().count("validate_real:begin") == 1


def test_gates_exit_cleanly_without_artifacts(tmp_path):
    env = dict(os.environ)
    env.pop("DMI_VALIDATE_REAL_FIXTURE", None)
    env["JAX_PLATFORMS"] = "cpu"
    # isolate from any real HF cache
    env["HF_HOME"] = str(tmp_path / "no_hf")
    env["TRANSFORMERS_OFFLINE"] = "1"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--data-root", str(tmp_path / "nodata"),
         "--out", str(tmp_path / "b.md")],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "exiting cleanly" in r.stdout
    assert not osp.exists(tmp_path / "b.md")

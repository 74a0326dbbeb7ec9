"""Execute the demo notebooks' code cells (tiny-model path).

The reference ships three .ipynb golden paths (`video_generation_demo`,
`image_generation_demo`, `causal_video_vae_demo`) as its de-facto acceptance
tests (SURVEY §4). Ours must stay runnable: each test concatenates a
notebook's code cells and runs them in a fresh CPU subprocess from a temp
cwd (no PF_CKPT_DIR -> tiny random weights, so this checks plumbing and API
drift, not output quality).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOKS = [
    "causal_video_vae_demo.ipynb",
    "image_generation_demo.ipynb",
    "video_generation_demo.ipynb",
]


def _cells_to_script(path: str) -> str:
    with open(path) as f:
        nb = json.load(f)
    return "\n\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code")


@pytest.mark.slow
@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_executes(name, tmp_path):
    script = _cells_to_script(os.path.join(REPO, "examples", name))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "PF_CKPT_DIR")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", script], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (
        f"{name} failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}")

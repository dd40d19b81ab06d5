"""Ingest-and-render parity against a REAL torch-trained checkpoint.

Runs ``scripts_dev/torch_parity_demo.py`` at micro scale: a pure-torch
hash-NeRF (independent implementation of the reference's encoder behaviour,
``hash_encoding.py:8-111``) trains a few steps on CPU, saves a torch-ngp
layout ``.pth`` (per-level embeddings, tcnn-packed MLP vectors,
Morton-ordered density grid), and the demo asserts:

  * field parity (sigma rel err < 1e-3, rgb abs err < 1e-4) between the
    torch model and ``ngp_field`` on the ingested params,
  * composite parity > 50 dB on a shared uniform t-grid.

The e2e occupancy-render gate is disabled here (too few train steps for a
meaningful density field); the full demo runs it at 400 steps — recorded
result in PERF.md round 4.  Closes the VERDICT r3 residual on
``train/torch_ingest.py`` (never exercised against a trained ``.pth``).
"""

import json
import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_torch_trained_pth_ingests_and_matches(tmp_path):
    out = tmp_path / "parity"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts_dev", "torch_parity_demo.py"),
         "--steps", "20", "--res", "32", "--t_samples", "24",
         "--grid", "32", "--n_levels", "4", "--log2_hashmap_size", "12",
         "--min_e2e_db", "0", "--out", str(out)],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    with open(out / "parity.json") as f:
        res = json.load(f)
    assert res["sigma_rel_err"] < 1e-3
    assert res["rgb_abs_err"] < 1e-4
    assert res["composite_parity_db"] > 50

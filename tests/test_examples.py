"""The example scripts are user-facing entry points — smoke them at
sf0.001 so they can't silently rot as operators evolve."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(script: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *args],
        capture_output=True,
        text=True,
        # the curation demo runs ~30 sequential stages after the
        # session-2 additions (domain cap, phrase gate, shard
        # assignment, dataloader order, three tokenizer trainers) —
        # ~11 min solo on this host
        timeout=900,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_curation_demo_runs(tmp_path):
    stdout = _run(
        "curation_pipeline_demo.py", "/root/testdata/sf0.001", str(tmp_path)
    )
    assert "splits:" in stdout
    assert (tmp_path / "corpus").is_dir()


def test_music_demo_runs(tmp_path):
    stdout = _run("music_pipeline_demo.py", str(tmp_path))
    assert "serving" in stdout.lower()

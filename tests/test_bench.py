"""bench.py smoke test: must print exactly one valid JSON line on CPU."""

import json
import subprocess
import sys
from pathlib import Path
import pytest


@pytest.mark.slow
def test_bench_smoke():
    repo = Path(__file__).parent.parent
    out = subprocess.run(
        [sys.executable, str(repo / "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/root",
        },
        cwd=repo,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in output: {out.stdout!r} {out.stderr[-500:]!r}"
    doc = json.loads(lines[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(doc)
    assert doc["value"] > 0

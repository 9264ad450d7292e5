"""CI smoke for the runnable artifacts: the corpus-pipeline demo —
which now also drives the CDC consumer triad (incremental SCD2
maintenance read back point-in-time vs derived history, plus the
Engine current_state/history/state_as_of/state_at API) — must compose
end-to-end at sf0.001. Subprocess-isolated: the demo builds its own
SparkSession, exactly as a user runs it."""

import subprocess
import sys


def test_demo_pipeline_runs_end_to_end():
    res = subprocess.run(
        [sys.executable, "scripts/demo_pipeline.py", "/root/testdata/sf0.001"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PIPELINE DEMO OK" in res.stdout
    # the stage-count JSON line is the demo's contract
    import json

    # progress-bar carriage returns can share the line — slice from the
    # JSON object's start
    line = next(ln for ln in res.stdout.splitlines() if '{"ingested"' in ln)
    counts = json.loads(line[line.index('{"ingested"'):])
    assert counts["scd2_versions"] > 0
    assert counts["engine_state_at"] == counts["engine_current_state"] > 0

"""Doc-number integrity (VERDICT r3 item 8): README's benchmark table
must be exactly what tools/render_results.py generates from the
committed artifact snapshot — stale hand-edited numbers fail here."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_table_matches_artifact():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "render_results.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr

"""The docs build is a correctness check: tools/docgen.py imports every
``.. automodule::`` target and resolves every ``:members:`` name (the same
errors sphinx-autodoc would raise; reference pipeline:
``/root/reference/Makefile:90-100``). Building into a tmpdir here makes
"the docs build" a CI property instead of a manual step."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_build(tmp_path):
    out = tmp_path / "html"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "docgen.py"),
         "--src", os.path.join(REPO, "docs"), "--out", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr

    pages = {f.name for f in out.iterdir()}
    assert {"index.html", "api.html", "migration.html"} <= pages

    api = (out / "api.html").read_text()
    # autodoc actually resolved the core API members
    for probe in ("FixedkSampler", "MultiStateRouse", "sample_dataset",
                  "optimize_boundary"):
        assert probe in api, probe

    mig = (out / "migration.html").read_text()
    # the symbol-mapping table rendered as a real table
    assert "<table>" in mig and "<th>reference</th>" in mig
    assert mig.count("<tr>") > 15

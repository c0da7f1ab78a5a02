"""Docs build gate (reference: tests/test_docs/run.sh builds Sphinx in CI).

Two layers:
  * integrity checks that always run (toctree targets exist, conf.py is
    importable, public modules carry docstrings);
  * an actual sphinx-build, skipped when sphinx is not installed (this
    development image has no sphinx; CI installs it).
"""

import importlib
import os
import pkgutil
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")


def test_docs_tree_integrity():
    assert os.path.exists(os.path.join(DOCS, "conf.py"))
    index = open(os.path.join(DOCS, "index.rst")).read()
    # every usage/* toctree entry must exist with an .rst or .md extension
    for target in re.findall(r"^\s{3}(usage/\S+)$", index, flags=re.M):
        assert any(
            os.path.exists(os.path.join(DOCS, target + ext))
            for ext in (".rst", ".md")
        ), f"index.rst references missing page {target}"


def test_conf_py_is_valid_python():
    namespace = {"__file__": os.path.join(DOCS, "conf.py")}
    code = compile(open(os.path.join(DOCS, "conf.py")).read(), "conf.py", "exec")
    exec(code, namespace)
    assert namespace["project"] == "diffusion_for_multi_scale_molecular_dynamics_tpu"
    assert "sphinx.ext.napoleon" in namespace["extensions"]


def test_public_modules_have_docstrings():
    """Every module in the package carries a module docstring (autoapi input)."""
    import diffusion_for_multi_scale_molecular_dynamics_tpu as pkg

    missing = []
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        name = info.name
        if "__main__" in name:
            continue
        module = importlib.import_module(name)
        if not (module.__doc__ or "").strip() and not name.endswith("__init__"):
            missing.append(name)
    assert not missing, f"modules without docstrings: {missing}"


def test_sphinx_build():
    pytest.importorskip("sphinx")
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "sphinx",
            "-b",
            "html",
            "-d",
            os.path.join(DOCS, "_build", "doctrees"),
            DOCS,
            os.path.join(DOCS, "_build", "html"),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert result.returncode == 0, result.stderr

# Sphinx configuration for the TPU-native diffusion framework docs.
#
# Mirrors the reference's docs build (reference docs/conf.py: autoapi over
# the package, napoleon docstrings, rtd theme) with the same structure:
# quickstart + user guide + generated API reference.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "diffusion_for_multi_scale_molecular_dynamics_tpu"
copyright = "2026, tpu build"
author = "tpu build"

extensions = ["sphinx.ext.napoleon"]

# Optional extensions: used when available, skipped otherwise so the build
# also works in minimal environments.
try:  # markdown support
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
except ImportError:
    pass

try:  # generated API reference
    import autoapi  # noqa: F401

    extensions.append("autoapi.extension")
    autoapi_type = "python"
    autoapi_dirs = ["../diffusion_for_multi_scale_molecular_dynamics_tpu/"]
except ImportError:
    pass

try:
    import sphinx_rtd_theme  # noqa: F401

    html_theme = "sphinx_rtd_theme"
except ImportError:
    html_theme = "alabaster"


def check_skip_member(app, what, name, obj, skip, options):
    """Skip documentation entries for loggers and tests."""
    for pattern in ("test_", "logger"):
        if pattern in name:
            return True
    return False


def setup(app):
    """Connect the autoapi skip handler."""
    app.connect("autoapi-skip-member", check_skip_member)


templates_path = ["_templates"]
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]
html_static_path = []

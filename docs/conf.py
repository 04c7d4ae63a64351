"""Sphinx configuration for kge_tpu's API documentation.

Build with ``sphinx-build -b html docs docs/_build`` (sphinx + the
autodoc/napoleon extensions; not installed in minimal environments —
README.md and PARITY.md carry the narrative docs either way).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "kge_tpu"
author = "kge_tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autosummary_generate = True
autodoc_mock_imports = ["jax", "jaxlib", "numpy", "yaml"]

html_theme = "alabaster"
exclude_patterns = ["_build"]

# Sphinx configuration (automodule docs, mirroring the reference's
# docs/source layout).

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "gpim-tpu"
author = "gpim-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_mock_imports = ["jax", "jaxlib", "optax", "matplotlib", "scipy"]

html_theme = "sphinx_rtd_theme"
master_doc = "index"

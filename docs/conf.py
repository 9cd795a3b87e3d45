"""Sphinx configuration for pygenray_tpu's documentation.

Counterpart to the reference's ``docs/conf.py``; the docs are plain
Markdown (myst) so they render on any forge without a build, but this
config lets ``sphinx-build docs docs/_build`` produce HTML when sphinx and
myst-parser are available (neither is required at runtime).
"""

project = "pygenray_tpu"
author = "pygenray_tpu developers"
copyright = "2026, pygenray_tpu developers"

extensions = []
try:  # myst renders the existing .md sources; optional
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
except ImportError:
    pass
try:
    import sphinx.ext.autodoc  # noqa: F401

    extensions += ["sphinx.ext.autodoc", "sphinx.ext.napoleon",
                   "sphinx.ext.viewcode"]
except ImportError:
    pass

source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"

"""Thin setuptools shim.

All metadata lives in pyproject.toml; this file exists so `pip install
-e . --no-use-pep517` works on offline machines whose setuptools
predates the built-in bdist_wheel (PEP 660 editable installs need the
`wheel` package; the legacy setup.py develop path does not).
"""

from setuptools import setup

setup()

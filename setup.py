"""Legacy-path shim: all metadata lives in pyproject.toml.

Kept so ``pip install -e . --no-use-pep517`` works in offline
environments whose setuptools predates bundled bdist_wheel (PEP 660
editable builds need the ``wheel`` package until setuptools 70.1).
"""

from setuptools import setup

setup()

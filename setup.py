from setuptools import setup

# Configuration lives in pyproject.toml; this shim keeps `pip install -e .`
# and legacy tooling working (API parity with the reference's setup.py).
setup()

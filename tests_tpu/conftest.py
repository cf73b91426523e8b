"""On-device test suite configuration.

Unlike ``tests/`` (which forces the CPU backend + x64 for scipy goldens),
this suite runs on the REAL TPU default backend and exercises the compiled
(non-interpret) Pallas paths — the exact kernels every benchmark number rests
on.  Run with::

    python -m pytest tests_tpu/ -q

Notes:
  * only one process can own the TPU — don't run concurrently with bench.py
    or another TPU session;
  * first compiles go through the remote-compile helper (~30-60 s per new
    program shape); the whole suite takes a few minutes cold, seconds warm;
  * if no TPU is the default backend every test is skipped (not failed).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(
            reason=f"tests_tpu needs the real TPU backend "
            f"(default_backend={jax.default_backend()!r})"
        )
        for item in items:
            item.add_marker(skip)

"""Run any script with JAX pinned to CPU — even under a sitecustomize that
registers the real TPU and sets ``jax_platforms`` in config (which overrides
the ``JAX_PLATFORMS`` env var; see tests/conftest.py).  Use this for every
host-side JAX invocation while a chip job is active: a second process
touching the relay chip contends with (and can deadlock) the certification
queue.

Usage: python scripts/cpu_run.py <script.py> [args...]
"""

import os
import runpy
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (after env setup)

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

sys.argv = sys.argv[1:]
if not sys.argv:
    raise SystemExit(__doc__)
# absolute path: scripts locate the repo root by splitting __file__
sys.argv[0] = os.path.abspath(sys.argv[0])
sys.path.insert(0, os.path.dirname(os.path.dirname(sys.argv[0])))
runpy.run_path(sys.argv[0], run_name="__main__")

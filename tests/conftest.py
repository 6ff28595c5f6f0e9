"""Test config: force an 8-device virtual CPU platform so multi-chip
sharding paths compile and run without TPU hardware (the reference had no
analog — CUDA tests needed real GPUs; see SURVEY.md §4)."""

import os

# Force CPU: the session sitecustomize registers the (single) real TPU via a
# PJRT plugin and then sets jax_platforms="axon,cpu" *in config*, overriding
# the env var.  Tests must not grab the chip — bench.py owns it — so re-pin
# the config to cpu after import, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The concurrency-optimized CPU thunk scheduler lets each virtual device
# reach data-independent collectives (ring ppermute vs grad psum) in a
# different order; with fewer host cores than devices the blocked rendezvous
# threads starve the pool and XLA aborts after its 40 s termination timeout
# (seen on a 4-core host: "Expected 8 threads to join ... only 7 arrived").
# A sequential thunk schedule makes every device hit collectives in HLO
# order, which cannot deadlock.
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
jax.config.update("jax_enable_x64", False)
# Op-by-op CPU compiles are slow in this container; persist them across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

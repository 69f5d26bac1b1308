import os

# CPU with 8 virtual devices: deterministic, and exercises the same
# multi-device sharding paths the driver validates via dryrun_multichip.
# The axon sitecustomize forces the TPU platform at interpreter start, so
# the env var alone is not enough — the explicit config update below wins
# as long as no backend has initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_unconfigure(config):
    # The axon TPU plugin's atexit teardown can hang for minutes; tests are
    # done at this point, so exit hard with the recorded status.
    status = getattr(config, "_vrt_exitstatus", 0)
    os._exit(int(status))


def pytest_sessionfinish(session, exitstatus):
    session.config._vrt_exitstatus = exitstatus

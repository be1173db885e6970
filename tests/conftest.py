import os

# Force an 8-device virtual CPU mesh for every test: sharding logic is
# exercised exactly as it would run on a v5e-8 slice, minus the ICI.
#
# The container boots with an `axon` PJRT plugin that force-selects the
# remote TPU via jax.config (sitecustomize), overriding JAX_PLATFORMS.
# Tests must be hermetic and fast, so we claw the selection back to CPU
# *before* any backend is initialised.
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must NEVER touch the persistent XLA compilation cache: entries
# written through the axon tunnel are compiled on the remote host (AMX-class
# machine features) and deserializing one into this container's CPU process
# segfaults (observed: test_phased_cache_matches_unphased_int8_kv dying in
# compilation_cache.get_executable_and_time). ChatterboxTTS.__init__ enables
# the cache process-globally, so disable it before anything imports.
os.environ["CHATTERBOX_COMPILE_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The full suite compiles thousands of XLA CPU executables, and the LLVM ORC
# JIT never unmaps their code/rodata/data trios: the process's mmap-region
# count grows monotonically (~3-4 regions per compiled program) and crosses
# the kernel's default vm.max_map_count (65530) near the END of the suite.
# Past that, the next JIT mmap fails and LLVM segfaults — observed as a
# deterministic in-suite-only SIGSEGV inside backend_compile_and_load at
# test_phased_cache_matches_unphased_int8_kv (~96%), while the same test
# passes solo (fresh process, low map count). jax.clear_caches() does NOT
# return the mappings, so the only in-process fix is raising the ceiling;
# do it best-effort (needs root — true in the build container; harmless
# no-op elsewhere, where dev machines usually run single files anyway).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _mmc = int(_f.read())
    if _mmc < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("262144")
except (OSError, PermissionError, ValueError):
    pass

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Test tiers (round-5 VERDICT item 7): the full suite crossed 38 min of
# single-process CPU time, past the point where it gets run routinely (the
# q4ad bench outlier came from a concurrent full sweep). The torch-parity
# files and the full-pipeline e2e are a `parity` tier, deselected by
# default; `pytest --tier full` (or CHATTERBOX_TEST_TIER=full) runs
# everything, `--tier parity` runs only that tier. Individual slow tests
# can join the tier with @pytest.mark.parity.
# ---------------------------------------------------------------------------

PARITY_FILES = {
    "test_parity_s3gen.py",
    "test_parity_speaker_vocoder.py",
    "test_parity_t3.py",
    "test_s3tokenizer_parity.py",
    "test_from_local_e2e.py",
}


def pytest_addoption(parser):
    parser.addoption(
        "--tier", default=os.getenv("CHATTERBOX_TEST_TIER", "fast"),
        choices=["fast", "parity", "full"],
        help="fast (default): everything except the torch-parity/e2e tier; "
             "parity: only that tier; full: the whole suite")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "parity: torch-parity / full-size e2e tier "
                   "(deselected unless --tier parity/full)")
    config.addinivalue_line(
        "markers", "slow: heavy integration tests (>= ~20 s each on the "
                   "throttled container CPU) — deselected from the default "
                   "fast tier, run under --tier full")


def pytest_collection_modifyitems(config, items):
    tier = config.getoption("--tier")
    if tier == "full":
        return
    keep, drop = [], []
    for it in items:
        in_parity = (it.fspath.basename in PARITY_FILES
                     or it.get_closest_marker("parity") is not None)
        if tier == "parity":
            sel = in_parity
        else:   # fast: neither parity-tier nor slow-marked
            sel = not in_parity and it.get_closest_marker("slow") is None
        (keep if sel else drop).append(it)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep

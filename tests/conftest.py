import os
import pathlib as _pl

# Force an 8-device virtual CPU mesh for all tests: sharding/multi-chip code
# paths must compile and run without TPU hardware.  NOTE: this environment
# exports JAX_PLATFORMS=axon and the plugin wins over a plain env override,
# so the platform is forced programmatically below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: interpret-mode pallas kernels compile slowly
# through this environment's remote compile service (~minutes); cache hits
# bring re-runs to milliseconds.
_cache = _pl.Path(__file__).resolve().parent.parent / ".cache" / "jax"
_cache.mkdir(parents=True, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import pathlib

import pytest

# build the native runtime on fresh checkouts (tests pass without it via
# the Python fallbacks, but exercise the production dispatch when g++ is
# available)
_so = (pathlib.Path(__file__).parent.parent / "sedef_tpu" / "native"
       / "libsedef_native.so")
if not _so.exists():
    try:
        from sedef_tpu.native.build import build

        build(verbose=False)
    except Exception:
        pass

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture
def fixtures_dir():
    return FIXTURES

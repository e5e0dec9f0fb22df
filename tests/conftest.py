"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import subprocess

import jax

# Some environments inject a TPU-tunnel PJRT plugin via sitecustomize that
# force-overrides jax_platforms at interpreter start (ignoring the
# JAX_PLATFORMS env var).  Tests must run on the local virtual-8-device CPU
# mesh, so re-assert the CPU platform here — config.update wins as long as
# no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent

# NO persistent XLA compilation cache for the CPU test suite: the cache
# writer (jax compilation_cache.put_executable_and_time -> zstandard)
# segfaults intermittently on this host, and cross-host CPU AOT entries
# can SIGILL on load (mismatched machine features).  CPU compiles are
# cheap enough to redo per run.
REFBUILD = REPO / ".refbuild"
REF_DRIVER = REFBUILD / "ref_driver"


def _ensure_oracle() -> bool:
    """Build the reference-oracle binary on first use (gitignored)."""
    if REF_DRIVER.exists():
        return True
    script = REPO / "tools" / "build_reference_oracle.sh"
    if not script.exists() or not pathlib.Path("/root/reference").exists():
        return False
    try:
        subprocess.run(["bash", str(script)], check=True,
                       capture_output=True, timeout=600)
    except Exception:
        return False
    return REF_DRIVER.exists()


@pytest.fixture(scope="session")
def ref_driver():
    """Path to the reference oracle CLI, or skip."""
    if not _ensure_oracle():
        pytest.skip("reference oracle unavailable")
    return str(REF_DRIVER)


@pytest.fixture(scope="session")
def ref_tables_header():
    p = pathlib.Path("/root/reference/include/hartallo/h264/"
                     "hl_codec_264_tables.h")
    if not p.exists():
        pytest.skip("reference headers unavailable")
    return p.read_text(errors="replace")

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax (or anything importing jax) is loaded — pytest
imports conftest first, so this is the right place.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Never touch the network in tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# This machine's site config pre-sets jax_platforms to "axon,cpu" (the real
# TPU tunnel), which silently overrides JAX_PLATFORMS — force CPU explicitly
# or tests contend for the one physical TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- make a missing native build LOUD (VERDICT r4 weak #6) -----------------
# The C++ components (native/: hnsw, imagepipe, bpe — SURVEY §2.2 first-class
# replacements) gate ~20 tests; a fresh checkout without native/build/ used to
# shed them as silent skips.  If the toolchain is present, build here (<60 s);
# if the build fails, raise ONE aggregated error instead of skipping.

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_LIBS = [
    os.path.join(_REPO, "native", "build", f"lib{n}.so")
    for n in ("hnsw", "imagepipe", "bpe")
]


def _ensure_native_build() -> None:
    import shutil
    import subprocess

    if all(os.path.exists(p) for p in _NATIVE_LIBS):
        return
    if shutil.which("make") is None or shutil.which("g++") is None:
        return  # no toolchain: the per-test skips stay (and say why)
    proc = subprocess.run(
        ["make", "-C", os.path.join(_REPO, "native")],
        capture_output=True, text=True,
    )
    missing = [p for p in _NATIVE_LIBS if not os.path.exists(p)]
    if proc.returncode != 0 or missing:
        raise RuntimeError(
            "native components failed to build (the C++ hnsw/imagepipe/bpe "
            "libraries are first-class — do not let their tests silently "
            f"skip).  make -C native exited {proc.returncode}; missing: "
            f"{[os.path.basename(p) for p in missing]}\n"
            f"--- make stdout ---\n{proc.stdout[-2000:]}\n"
            f"--- make stderr ---\n{proc.stderr[-2000:]}"
        )


_ensure_native_build()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

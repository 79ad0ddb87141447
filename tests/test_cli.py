"""Module CLI: --help exits without importing jax or touching devices."""

import subprocess
import sys


def test_module_cli_help_is_device_free():
    r = subprocess.run(
        [sys.executable, "-m", "gpt2_image_captioning_tpu", "--help"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0
    assert "Environment smoke check" in r.stdout
    # the doctor body (device listing) must NOT run under --help
    assert "default backend" not in r.stdout


def test_module_cli_rejects_unknown_args():
    r = subprocess.run(
        [sys.executable, "-m", "gpt2_image_captioning_tpu", "--bogus"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr

"""Unit tests for bench.py's device-independent helpers.

bench.py itself needs the real chip, but its summary-artifact plumbing is
pure Python: chip recognition (the r4 artifact shipped with an
"unrecognized device_kind 'TPU v5 lite'" caveat — pinned fixed here) and
the leg-order / budget constants the timeout-proofing relies on.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # module level imports json/os/sys/numpy only
    return mod


BENCH = _load_bench()


def test_chip_peaks_recognizes_the_actual_chip():
    # the axon tunnel reports this chip as "TPU v5 lite" (BENCH_r04 session);
    # it must resolve to the v5e rates with peaks_known=True so the artifact
    # carries no mfu_note caveat
    for kind in ("TPU v5 lite", "TPU v5e", "tpu v5 lite", "TPU v5litepod-8"):
        peaks, known = BENCH.chip_peaks(kind)
        assert known, kind
        assert peaks["bf16_flops"] == 197e12
        assert peaks["hbm_Bps"] == 819e9


def test_chip_peaks_unknown_falls_back_with_flag():
    peaks, known = BENCH.chip_peaks("TPU v9000")
    assert not known
    assert peaks == BENCH._CHIP_PEAKS["v5e"]


def test_budget_and_cooldown_defaults():
    # the driver's timeout was ~45 min in r4; the default budget must leave
    # headroom under it, and the cooldown must be short enough that a single
    # transient retry cannot eat a quarter of the budget (r4 weak #1)
    assert BENCH.BUDGET_S <= 2700
    assert BENCH.COOLDOWN_S <= 150


def test_value_first_leg_order_is_encoded_in_source():
    # emit() must run after every leg and greedy/baseline must come first —
    # check the literal leg table so a reorder is a conscious choice
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    legs_at = src.index("legs = [")
    table = src[legs_at: src.index("]", legs_at)]
    names = [
        line.split('"')[1]
        for line in table.splitlines()
        if line.strip().startswith('("')
    ]
    assert names[0] == "greedy"
    assert names[1] == "baseline"
    assert names.index("train") < names.index("clip_encode")
    assert names.index("int8") < names.index("continuous")
    # every leg is followed by an emit() in the runner loop
    assert "run_leg(name, fn)" in src and "emit()" in src

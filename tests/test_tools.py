"""Tooling parity tests (reference `hardware_code/gen_table.py` analog)."""

import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "gen_twiddle_triples.py")
REF = "/root/reference/dilithium-256/hardware_code/consts_hw.cpp"


def test_twiddle_triples_match_reference():
    """Derived [k, 2k, 2k+1] schedule + zeta values == the reference's
    emitted twiddle ROM table (indices exactly, values mod q)."""
    if not os.path.exists(REF):
        import pytest
        pytest.skip("reference consts_hw.cpp not available")
    res = subprocess.run(
        [sys.executable, TOOL, "--check", REF], capture_output=True, text=True
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "OK: 85 forward twiddle triples" in res.stdout


def test_twiddle_table_prints():
    res = subprocess.run(
        [sys.executable, TOOL], capture_output=True, text=True
    )
    assert res.returncode == 0
    # 85 rows + header/footer; first data row is the level-0 group [1, 2, 3]
    assert "zeta_triples[85][3]" in res.stdout
    assert "// [1, 2, 3]" in res.stdout
